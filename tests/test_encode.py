"""End-to-end encoder tests: streams must decode with PIL (libjpeg oracle)
at the expected PSNR (thresholds modeled on test/regression/run_tests.sh)."""

import io

import numpy as np
import pytest

from gpujpeg_tpu import (ColorSpace, Encoder, ImageParameters, Parameters,
                         PixelFormat)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(255.0 ** 2 / mse)


def pil_decode(data: bytes) -> np.ndarray:
    return np.asarray(Image.open(io.BytesIO(data)))


def smooth_image(rng, h, w, c=3):
    """Low-frequency random image (JPEG-friendly)."""
    small = rng.integers(0, 256, size=(max(h // 8, 1), max(w // 8, 1), c))
    img = np.asarray(Image.fromarray(small.astype(np.uint8)).resize(
        (w, h), Image.BILINEAR))
    return img.reshape(h, w, c) if c > 1 else img.reshape(h, w)


@pytest.mark.parametrize("size", [(64, 64), (96, 128), (57, 71)])
def test_gray_roundtrip_pil(rng, size):
    h, w = size
    img = smooth_image(rng, h, w, 1)[..., 0] if False else \
        np.asarray(smooth_image(rng, h, w, 3))[..., 0]
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=90, restart_interval=4))
    dec = pil_decode(data)
    assert dec.shape == (h, w)
    assert psnr(img, dec) > 35, psnr(img, dec)


# Q90 >= 36 dB mirrors the reference's regression ratio for clean
# content (test/regression/run_tests.sh test_random_psnr demands 36.3 dB
# for its Q90 RGBA config); the lower qualities scale like BASELINE's
# published PSNR curve (README.md:170-181: HD Q50 33.8, Q90 39.8)
@pytest.mark.parametrize("quality,min_psnr", [(90, 36), (75, 32), (50, 29)])
def test_rgb_roundtrip_pil(rng, quality, min_psnr):
    img = smooth_image(rng, 64, 80, 3)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=quality, restart_interval=4))
    dec = pil_decode(data)
    assert dec.shape == img.shape
    assert psnr(img, dec) > min_psnr, psnr(img, dec)


def test_rgb_interleaved_scan(rng):
    img = smooth_image(rng, 64, 64, 3)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=85, restart_interval=4,
                                      interleaved=True))
    dec = pil_decode(data)
    assert psnr(img, dec) > 30


def test_no_restart_interval(rng):
    img = smooth_image(rng, 48, 48, 3)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=85, restart_interval=0))
    dec = pil_decode(data)
    assert psnr(img, dec) > 30


def test_no_restart_interval_subsampled(rng):
    """rst=0 with 4:2:0 non-interleaved scans: each scan is ONE segment
    whose token count differs per component (luma 4x chroma) — exercises
    the host sequential packer (reference CPU-Huffman analogue,
    gpujpeg_encoder.c:512-534) on ragged per-scan token lists."""
    img = smooth_image(rng, 56, 72, 3)
    enc = Encoder()
    p = Parameters(quality=85, restart_interval=0).chroma_subsampled(
        ((2, 2), (1, 1), (1, 1)))
    data = enc.encode(img, p)
    dec = pil_decode(data)
    # 28 dB floor: chroma decimation on this content costs ~2 dB vs 4:4:4
    assert psnr(img, dec) > 28
    # interleaved single-scan variant
    p2 = Parameters(quality=85, restart_interval=0,
                    interleaved=True).chroma_subsampled(
        ((2, 2), (1, 1), (1, 1)))
    data2 = enc.encode(img, p2)
    assert psnr(img, pil_decode(data2)) > 28


def test_odd_dimensions(rng):
    # reference regression style: 7*8*20-1 style odd sizes
    img = smooth_image(rng, 41, 67, 3)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=90, restart_interval=2))
    dec = pil_decode(data)
    assert dec.shape == img.shape
    assert psnr(img, dec) > 30


def test_flat_image_exact_dc(rng):
    img = np.full((32, 32, 3), 130, np.uint8)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=95, restart_interval=4))
    dec = pil_decode(data)
    assert np.abs(dec.astype(int) - 130).max() <= 2


def test_subsampled_420_interleaved(rng):
    img = smooth_image(rng, 64, 64, 3)
    enc = Encoder()
    p = Parameters(quality=85, restart_interval=2, interleaved=True)
    p = p.chroma_subsampled(((2, 2), (1, 1), (1, 1)))
    data = enc.encode(img, p)
    dec = pil_decode(data)
    assert psnr(img, dec) > 28, psnr(img, dec)


def test_subsampled_440_roundtrip(rng):
    """4:4:0 (vertical-only chroma subsampling, luma samp 1x2): the
    reference ships a dedicated fast preprocessor kernel for it
    (gpujpeg_preprocessor.cu:220-290); here the generic sampler must
    round-trip it through BOTH the PIL oracle and our own decoder,
    interleaved and not."""
    from gpujpeg_tpu import Decoder

    img = smooth_image(rng, 64, 72, 3)
    for interleaved in (False, True):
        p = Parameters(quality=90, restart_interval=2,
                       interleaved=interleaved).chroma_subsampled(
            ((1, 2), (1, 1), (1, 1)))
        data = Encoder().encode(img, p)
        dec = pil_decode(data)
        assert psnr(img, dec) > 31, (interleaved, psnr(img, dec))
        own = np.asarray(Decoder().decode(bytes(data)))
        assert psnr(img, own) > 31, (interleaved, psnr(img, own))


def test_rst_markers_present(rng):
    img = smooth_image(rng, 64, 64, 3)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=85, restart_interval=1))
    arr = np.frombuffer(data, np.uint8)
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    nxt = arr[ff + 1]
    n_rst = int(((nxt >= 0xD0) & (nxt <= 0xD7)).sum())
    assert n_rst > 0


def test_stuffing_no_unescaped_ff(rng):
    img = smooth_image(rng, 64, 64, 3)
    enc = Encoder()
    data = enc.encode(img, Parameters(quality=95, restart_interval=4))
    arr = np.frombuffer(data, np.uint8)
    # walk each scan: entropy data may only contain stuffed FF00 or RST; the
    # first other FF-pair must be a marker that legally ends the scan
    pos = 0
    scans = 0
    while True:
        sos = data.find(b"\xff\xda", pos)
        if sos < 0:
            break
        scans += 1
        body_start = sos + 2 + int.from_bytes(data[sos + 2:sos + 4], "big")
        i = body_start
        while i < len(arr) - 1:
            if arr[i] == 0xFF:
                nxt = arr[i + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    i += 2
                    continue
                assert nxt in (0xDA, 0xD9, 0xED), hex(nxt)  # SOS/EOI/APP13
                break
            i += 1
        pos = i
    assert scans == 3  # non-interleaved RGB -> one scan per component


def test_encode_pipelined_bitexact(rng):
    """Double-buffered encode_pipelined must yield byte-identical streams
    to sequential encode(), including when a later frame overflows the
    capacities converged on the first (sparse -> dense content)."""
    p = Parameters(quality=90, restart_interval=4)
    frames = [
        smooth_image(rng, 64, 80, 3),                       # converges caps
        smooth_image(rng, 64, 80, 3),
        # TWO dense frames in a row: the second is dispatched with the
        # pre-overflow caps while the first's overflow is discovered —
        # validation must use dispatch-time caps, not the grown ones
        rng.integers(0, 256, size=(64, 80, 3)).astype(np.uint8),
        rng.integers(0, 256, size=(64, 80, 3)).astype(np.uint8),
        smooth_image(rng, 64, 80, 3),
    ]
    ref_enc = Encoder()
    want = [ref_enc.encode(f, p) for f in frames]
    enc = Encoder()
    got = list(enc.encode_pipelined(frames, p))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"frame {i} differs"


def test_encode_pipelined_rst0(rng):
    """restart_interval=0 falls back to sequential host-entropy encodes."""
    p = Parameters(quality=85, restart_interval=0)
    frames = [smooth_image(rng, 48, 48, 3) for _ in range(2)]
    enc = Encoder()
    got = list(enc.encode_pipelined(frames, p))
    ref = [Encoder().encode(f, p) for f in frames]
    assert got == ref
