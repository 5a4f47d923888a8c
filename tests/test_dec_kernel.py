"""Pallas phase-C block-decode kernel (ops/huffdec_kernel) parity.

The kernel (interpret mode on CPU) must produce coefficients identical to
the XLA while-loop phase C on real encoded streams, and the end-to-end
Decoder must return identical pixels either way.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpujpeg_tpu import Decoder, Encoder, Parameters
from gpujpeg_tpu.models import decoder as dec_mod
from gpujpeg_tpu.types import ImageParameters, PixelFormat, ColorSpace


@pytest.fixture
def stream(rng):
    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    return bytes(Encoder().encode(img, Parameters(quality=75,
                                                  restart_interval=4)))


def _decode_with_mode(data, mode, monkeypatch):
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", mode)
    return np.asarray(Decoder().decode(data))


def test_kernel_pixels_match_xla(stream, monkeypatch):
    ref = _decode_with_mode(stream, "0", monkeypatch)
    got = _decode_with_mode(stream, "interpret", monkeypatch)
    assert np.array_equal(ref, got)


def test_kernel_selected_for_tuned_stream(stream, monkeypatch):
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
    dec = Decoder()
    from gpujpeg_tpu.stream import reader

    ps = reader.parse(stream)
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, None, 0)
    from gpujpeg_tpu.utils.geometry import get_geometry

    geo = get_geometry(param, out_pi.with_(width_padding=0))
    plan = dec._plan_for(geo, ps)
    assert plan.kernel_consts is not None
    assert plan.kernel_block_fn(4, True) is not None


def test_annexk_stream_uses_generic_kernel(monkeypatch, rng):
    """Foreign-table (Annex-K) streams take the GENERIC kernel path —
    scalar-prefetch packed tables, no per-table recompile (the TPU
    counterpart of the reference's per-stream 64Ki LUT build,
    gpujpeg_huffman_gpu_decoder.cu:539-610) — and decode identically to
    the XLA path."""
    img = rng.integers(0, 256, (48, 48, 3), np.uint8)
    data = bytes(Encoder().encode(
        img, Parameters(quality=75, restart_interval=4,
                        huffman_tables="annexk")))
    from gpujpeg_tpu.stream import reader

    ps = reader.parse(data)
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, None, 0)
    from gpujpeg_tpu.utils.geometry import get_geometry

    geo = get_geometry(param, out_pi.with_(width_padding=0))
    dec = Decoder()
    plan = dec._plan_for(geo, ps)
    assert plan.kernel_consts is None
    assert plan.generic is not None
    assert plan.kernel_block_fn(4, True) is not None
    assert plan.kernel_scan_fn(8, geo.segment_count, True) is not None
    ref = _decode_with_mode(data, "0", monkeypatch)
    got = _decode_with_mode(data, "interpret", monkeypatch)
    assert np.array_equal(ref, got)


def test_pil_optimized_stream_generic_kernel(monkeypatch, rng):
    """A libjpeg-encoded stream (PIL, optimize=True -> per-image custom
    Huffman tables with non-identity DC huffval) decodes on the generic
    kernel path, bit-identical to the XLA path and faithful to PIL's own
    decode."""
    import io

    from PIL import Image

    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    buf = io.BytesIO()
    # 4:4:4: PIL's decoder applies fancy (triangle) chroma upsampling,
    # ours replicates like the reference — only comparable unsubsampled
    Image.fromarray(img).save(buf, "JPEG", quality=75, optimize=True,
                              restart_marker_blocks=8, subsampling=0)
    data = buf.getvalue()

    from gpujpeg_tpu.stream import reader

    ps = reader.parse(data)
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, None, 0)
    from gpujpeg_tpu.utils.geometry import get_geometry

    geo = get_geometry(param, out_pi.with_(width_padding=0))
    dec = Decoder()
    plan = dec._plan_for(geo, ps)
    assert plan.kernel_consts is None and plan.generic is not None
    ref = _decode_with_mode(data, "0", monkeypatch)
    got = _decode_with_mode(data, "interpret", monkeypatch)
    assert np.array_equal(ref, got)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # different IDCT implementations: require close agreement, not equality
    assert np.mean(np.abs(got.astype(int) - pil.astype(int))) < 2.0


def test_kernel_corrupt_segment_contained(stream, monkeypatch):
    """Bit damage inside one segment must not poison the whole frame."""
    ref = _decode_with_mode(stream, "interpret", monkeypatch)
    bad = bytearray(stream)
    # flip bits in entropy data well after the headers
    pos = len(bad) // 2
    bad[pos] ^= 0x5A
    if bad[pos] == 0xFF:
        bad[pos] = 0xFE
    out = _decode_with_mode(bytes(bad), "interpret", monkeypatch)
    assert out.shape == ref.shape
    # at least three quarters of rows survive untouched
    same_rows = (out == ref).all(axis=(1, 2)).mean()
    assert same_rows > 0.5


def test_kernel_subsampled_and_gray(monkeypatch, rng):
    for shape, pf in [((56, 64, 3), None), ((40, 40), None)]:
        img = rng.integers(0, 256, shape, np.uint8)
        p = Parameters(quality=90, restart_interval=2)
        data = bytes(Encoder().encode(img, p))
        ref = _decode_with_mode(data, "0", monkeypatch)
        got = _decode_with_mode(data, "interpret", monkeypatch)
        assert np.array_equal(ref, got)


def test_kernel_interleaved_stream(monkeypatch, rng):
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    p = Parameters(quality=75, restart_interval=2, interleaved=True)
    data = bytes(Encoder().encode(img, p))
    ref = _decode_with_mode(data, "0", monkeypatch)
    got = _decode_with_mode(data, "interpret", monkeypatch)
    assert np.array_equal(ref, got)


def test_compiled_pipeline_uses_kernel(stream, monkeypatch):
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
    dec = Decoder()
    fn, words, nbits = dec.compile_stream_pipeline(stream)
    out = np.asarray(fn(words, nbits))
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "0")
    ref = np.asarray(Decoder().decode(stream))
    assert np.array_equal(out, ref)


def test_direct_bps1_decode(monkeypatch, rng):
    """restart_interval == 1 streams take the DIRECT path (no boundary
    scan, no split — segment rows ARE the block buffers, DC is absolute;
    decoder._decode_direct) and decode identically to the XLA path."""
    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    data = bytes(Encoder().encode(img, Parameters(quality=97,
                                                  restart_interval=1)))
    ref = _decode_with_mode(data, "0", monkeypatch)
    got = _decode_with_mode(data, "interpret", monkeypatch)
    assert np.array_equal(ref, got)


def test_direct_bps1_auto_interval_q100(monkeypatch, rng):
    """The auto restart interval picks 1 block/segment at quality >= 97
    (non-interleaved), and the round trip stays exact through the direct
    path, including subsampling and grayscale."""
    from gpujpeg_tpu.stream import reader

    for shape in [(64, 80, 3), (40, 48)]:
        img = rng.integers(0, 256, shape, np.uint8)
        data = bytes(Encoder().encode(
            img, Parameters(quality=100, restart_interval=-1)))
        ps = reader.parse(data)
        assert ps.restart_interval == 1
        ref = _decode_with_mode(data, "0", monkeypatch)
        got = _decode_with_mode(data, "interpret", monkeypatch)
        assert np.array_equal(ref, got)


def test_direct_bps1_compiled_pipeline(monkeypatch, rng):
    """compile_stream_pipeline's direct mode matches decode()."""
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    data = bytes(Encoder().encode(img, Parameters(quality=100,
                                                  restart_interval=1)))
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
    dec = Decoder()
    fn, words, nbits = dec.compile_stream_pipeline(data)
    out = np.asarray(fn(words, nbits))
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "0")
    ref = np.asarray(Decoder().decode(data))
    assert np.array_equal(out, ref)


def test_split_path_large_k_parity(monkeypatch, rng):
    """Split-path phase C with block buffers in the 17-40-word range
    runs the Pallas kernel (the K cap is 40) and matches the XLA
    while-loop decode bit-exactly.  Dense Q100 noise at an EXPLICIT
    restart interval 2 keeps the scan/split path (the direct path only
    engages at interval 1) while pushing per-block buffers past 16
    words (ADVICE r4: the K 16 -> 40 cap raise silently moved these
    buffers off the XLA fallback with no test at large K)."""
    from gpujpeg_tpu.stream import reader
    from gpujpeg_tpu.utils.geometry import get_geometry

    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    data = bytes(Encoder().encode(img, Parameters(quality=100,
                                                  restart_interval=2)))
    ref = _decode_with_mode(data, "0", monkeypatch)
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
    dec = Decoder()
    got = np.asarray(dec.decode(data))
    assert np.array_equal(ref, got)
    ps = reader.parse(data)
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, None, 0)
    geo = get_geometry(param, out_pi.with_(width_padding=0))
    plan = dec._plan_for(geo, ps)
    assert plan.split_caps, "split path did not run"
    K = int(plan.split_caps[-1])
    assert 16 < K <= 40, f"test content no longer lands in 17-40 (K={K})"
    assert plan.kernel_block_fn(K, True) is not None


def test_direct_bps1_corrupt_containment(monkeypatch, rng):
    """Bit flips in a restart_interval=1 stream poison only the touched
    blocks on the direct path."""
    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    data = bytes(Encoder().encode(img, Parameters(quality=97,
                                                  restart_interval=1)))
    ref = _decode_with_mode(data, "interpret", monkeypatch)
    bad = bytearray(data)
    # flip a byte verified to lie strictly INSIDE a segment's entropy
    # bytes (at interval 1 roughly a third of the scan is RST markers —
    # destroying one would collapse segmentation instead of poisoning a
    # block, leaving the containment assertion near its threshold)
    from gpujpeg_tpu.stream import reader

    segs = reader.parse(data).scans[0].segments
    mid = segs[len(segs) // 2]
    pos = int(mid[0])
    assert pos < int(mid[1])
    bad[pos] ^= 0x5A
    if bad[pos] == 0xFF:
        bad[pos] = 0xFE
    out = _decode_with_mode(bytes(bad), "interpret", monkeypatch)
    assert out.shape == ref.shape
    same_rows = (out == ref).all(axis=(1, 2)).mean()
    assert same_rows > 0.5


def _plan_of(dec, data):
    from gpujpeg_tpu.stream import reader
    from gpujpeg_tpu.utils.geometry import get_geometry

    ps = reader.parse(data)
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, None, 0)
    geo = get_geometry(param, out_pi.with_(width_padding=0))
    return dec._plan_for(geo, ps)


def test_segrow_path_parity(monkeypatch, rng):
    """SEGMENT-ROW phase C (split-free block decode straight out of
    segment rows at phase-A cursors) must produce pixels identical to
    the XLA path, across qualities / restart intervals / odd dims."""
    for q, rstv, shape in [(75, 4, (64, 80, 3)), (90, 8, (56, 64, 3)),
                           (85, 2, (41, 67, 3)), (50, 4, (40, 48))]:
        img = rng.integers(0, 256, shape, np.uint8)
        data = bytes(Encoder().encode(
            img, Parameters(quality=q, restart_interval=rstv)))
        ref = _decode_with_mode(data, "0", monkeypatch)
        monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
        monkeypatch.setenv("GPUJPEG_TPU_SEGROW", "1")
        dec = Decoder()
        got = np.asarray(dec.decode(data))
        assert np.array_equal(ref, got), (q, rstv, shape)
        # when the path is available it must have been taken (the
        # split-free path leaves the split-caps protocol untouched);
        # too-wide segments (dense noise) legitimately fall back
        plan = _plan_of(dec, data)
        from gpujpeg_tpu.stream import reader as _r
        from gpujpeg_tpu.utils.geometry import get_geometry as _gg
        ps = _r.parse(data)
        geo = _gg(_r.parsed_to_parameters(ps),
                  dec_mod.resolve_output(ps, None, 0)
                  .with_(width_padding=0))
        bounds = dec._segment_bounds(ps, geo)
        seg_lens = bounds[1] - bounds[0]
        W = dec_mod._bucket((int(seg_lens.max()) + 3) // 4) + 1
        parts = dec_mod._segrow_parts(
            plan, geo, plan.comp_class_ranges(), seg_lens, W,
            "interpret")
        assert (plan.split_caps is None) == (parts is not None), \
            (q, rstv, shape)


def test_segrow_subsampled_and_foreign(monkeypatch, rng):
    """Segment-row path on 4:2:0 own streams and Annex-K (generic
    table) streams — the with_cursor kernels cover the foreign-table
    machinery too."""
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    p420 = Parameters(quality=80, restart_interval=4).chroma_subsampled(
        ((2, 2), (1, 1), (1, 1)))
    d1 = bytes(Encoder().encode(img, p420))
    d2 = bytes(Encoder().encode(img, Parameters(
        quality=75, restart_interval=4, huffman_tables="annexk")))
    monkeypatch.setenv("GPUJPEG_TPU_SEGROW", "1")
    for data in (d1, d2):
        ref = _decode_with_mode(data, "0", monkeypatch)
        got = _decode_with_mode(data, "interpret", monkeypatch)
        assert np.array_equal(ref, got)


def test_segrow_compiled_pipeline(monkeypatch, rng):
    """compile_stream_pipeline takes the split-free path (empty needs)
    and matches decode()."""
    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    data = bytes(Encoder().encode(img, Parameters(quality=75,
                                                  restart_interval=4)))
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
    monkeypatch.setenv("GPUJPEG_TPU_SEGROW", "1")
    dec = Decoder()
    fn, words, nbits = dec.compile_stream_pipeline(data)
    out = np.asarray(fn(words, nbits))
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "0")
    monkeypatch.delenv("GPUJPEG_TPU_SEGROW", raising=False)
    ref = np.asarray(Decoder().decode(data))
    assert np.array_equal(out, ref)


def test_segrow_corrupt_containment(monkeypatch, rng):
    """Bit flips poison only the touched segment's blocks on the
    segment-row path (absolute-cursor bound checks)."""
    from gpujpeg_tpu.stream import reader

    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    data = bytes(Encoder().encode(img, Parameters(quality=75,
                                                  restart_interval=4)))
    monkeypatch.setenv("GPUJPEG_TPU_SEGROW", "1")
    ref = _decode_with_mode(data, "interpret", monkeypatch)
    bad = bytearray(data)
    segs = reader.parse(data).scans[0].segments
    mid = segs[len(segs) // 2]
    pos = int(mid[0])
    bad[pos] ^= 0x5A
    if bad[pos] == 0xFF:
        bad[pos] = 0xFE
    out = _decode_with_mode(bytes(bad), "interpret", monkeypatch)
    assert out.shape == ref.shape
    same_rows = (out == ref).all(axis=(1, 2)).mean()
    assert same_rows > 0.5
