"""Decoder tests: own-stream roundtrips + foreign (PIL/libjpeg) streams."""

import io

import numpy as np
import pytest

from gpujpeg_tpu import (ColorSpace, Decoder, Encoder, ImageParameters,
                         Parameters, PixelFormat)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from .test_encode import psnr, smooth_image  # noqa: E402


def pil_decode(data: bytes) -> np.ndarray:
    return np.asarray(Image.open(io.BytesIO(data)))


def test_roundtrip_rgb_matches_pil(rng):
    """Our decoder and libjpeg must agree on our own stream (IDCT rounding
    may differ by ±1 per sample)."""
    img = smooth_image(rng, 64, 80, 3)
    enc, dec = Encoder(), Decoder()
    data = enc.encode(img, Parameters(quality=85, restart_interval=4))
    ours = dec.decode(data)
    ref = pil_decode(data)
    assert ours.shape == ref.shape
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
    assert psnr(img, ours) > 30


def test_roundtrip_gray(rng):
    img = np.asarray(smooth_image(rng, 56, 72, 3))[..., 0]
    enc, dec = Encoder(), Decoder()
    data = enc.encode(img, Parameters(quality=90, restart_interval=4))
    ours = dec.decode(data)
    ref = pil_decode(data)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_roundtrip_interleaved_420(rng):
    img = smooth_image(rng, 64, 64, 3)
    enc, dec = Encoder(), Decoder()
    p = Parameters(quality=85, restart_interval=2, interleaved=True)
    p = p.chroma_subsampled(((2, 2), (1, 1), (1, 1)))
    data = enc.encode(img, p)
    ours = dec.decode(data)
    ref = pil_decode(data)
    # libjpeg uses fancy (bilinear) chroma upsampling; we use nearest like
    # the reference postprocessor — compare at PSNR level
    assert psnr(ref, ours) > 30, psnr(ref, ours)
    assert psnr(img, ours) > 27, psnr(img, ours)


def test_roundtrip_odd_size(rng):
    img = smooth_image(rng, 41, 67, 3)
    enc, dec = Encoder(), Decoder()
    data = enc.encode(img, Parameters(quality=90, restart_interval=2))
    ours = dec.decode(data)
    assert ours.shape == img.shape
    assert psnr(img, ours) > 30


def test_decode_foreign_pil_stream(rng):
    """Decode a libjpeg-produced baseline stream (no restart markers)."""
    img = smooth_image(rng, 48, 48, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90,
                              subsampling=0)  # 4:4:4
    data = buf.getvalue()
    dec = Decoder()
    ours = dec.decode(data)
    ref = pil_decode(data)
    assert ours.shape == ref.shape
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_decode_foreign_pil_420(rng):
    img = smooth_image(rng, 48, 64, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85,
                              subsampling=2)  # 4:2:0
    data = buf.getvalue()
    dec = Decoder()
    ours = dec.decode(data)
    ref = pil_decode(data)
    # chroma upsampling differs (we use nearest, libjpeg uses fancy); compare
    # against the source instead
    assert psnr(img, ours) > 25
    assert psnr(ref, ours) > 30


def test_entropy_lossless_roundtrip(rng):
    """Encode -> decode with quality 100 (quant ~1) must be near-exact."""
    img = smooth_image(rng, 32, 32, 3)
    enc, dec = Encoder(), Decoder()
    data = enc.encode(img, Parameters(quality=100, restart_interval=2))
    ours = dec.decode(data)
    # color transform + DCT roundoff only
    assert np.abs(ours.astype(int) - img.astype(int)).max() <= 4


def test_image_info_probe(rng):
    img = smooth_image(rng, 40, 56, 3)
    enc, dec = Encoder(), Decoder()
    data = enc.encode(img, Parameters(quality=77, restart_interval=4))
    info = dec.get_image_info(data)
    assert (info.width, info.height) == (56, 40)
    assert info.comp_count == 3
    assert info.restart_interval == 4
    assert info.quality == 77
    assert info.segment_count > 0
    assert "GPUJPEG" in info.comment


def test_deferred_split_growth_redecodes(rng):
    """Steady state skips the mid-frame split-needs sync; a denser
    same-geometry stream must transparently grow the split caps and
    re-decode to exact pixels (round-4 sync removal)."""
    h, w = 48, 64
    smooth = smooth_image(rng, h, w, 3)
    noisy = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    enc = Encoder()
    p = Parameters(quality=90, restart_interval=4)
    d_smooth = enc.encode(smooth, p)
    d_noisy = enc.encode(noisy, p)

    dec = Decoder()
    out1 = dec.decode(d_smooth)          # converges caps on sparse content
    out2 = dec.decode(d_noisy)           # denser: deferred overflow path

    ref = Decoder().decode(d_noisy)      # fresh session, sync'd caps
    assert np.array_equal(out2, ref)
    assert np.array_equal(out1, Decoder().decode(d_smooth))


def test_decode_pipelined_matches_sequential(rng):
    """decode_pipelined: double-buffered driver yields pixel-identical
    results to sequential decode(), including a denser stream that
    overflows the compiled split caps mid-batch."""
    h, w = 48, 64
    enc = Encoder()
    p = Parameters(quality=85, restart_interval=4)
    streams = [enc.encode(smooth_image(rng, h, w, 3), p),
               enc.encode(rng.integers(0, 256, (h, w, 3))
                          .astype(np.uint8), p),
               enc.encode(smooth_image(rng, h, w, 3), p)]

    dec = Decoder()
    outs = list(dec.decode_pipelined(streams))
    assert len(outs) == 3
    for s, o in zip(streams, outs):
        assert np.array_equal(o, Decoder().decode(s))


def test_decode_pipelined_rejects_geometry_mismatch(rng):
    enc = Encoder()
    p = Parameters(quality=85, restart_interval=4)
    s1 = enc.encode(smooth_image(rng, 48, 64, 3), p)
    s2 = enc.encode(smooth_image(rng, 32, 48, 3), p)
    dec = Decoder()
    with pytest.raises(ValueError):
        list(dec.decode_pipelined([s1, s2]))


def test_decoder_warmup(rng):
    """Decoder.warmup pre-compiles the stream-shaped pipeline (the
    decoder's Encoder.allocate counterpart); a warmed session decodes
    the first real frame through cached programs with exact pixels."""
    from gpujpeg_tpu import Decoder, Encoder, Parameters

    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    example = bytes(Encoder().encode(img, Parameters(quality=80,
                                                     restart_interval=4)))
    dec = Decoder()
    dec.warmup(example)
    assert dec._plans, "warmup did not build a stream plan"
    img2 = rng.integers(0, 256, (48, 64, 3), np.uint8)
    s2 = bytes(Encoder().encode(img2, Parameters(quality=80,
                                                 restart_interval=4)))
    got = np.asarray(dec.decode(s2))
    ref = np.asarray(Decoder().decode(s2))
    assert np.array_equal(got, ref)
