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


def test_annexk_stream_falls_back(monkeypatch, rng):
    """Foreign-table streams must take the XLA path (kernel_consts None)
    and still decode correctly under the kernel mode flag."""
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
    ref = _decode_with_mode(data, "0", monkeypatch)
    got = _decode_with_mode(data, "interpret", monkeypatch)
    assert np.array_equal(ref, got)


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
