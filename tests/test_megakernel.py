"""Entropy megakernel (ops/fusedpack.entropy_fused): tokenize + merge
tree + pad + stuff + RST in one Pallas kernel, validated byte-exact (in
interpret mode) against the XLA tokenizer + pack_stuff_fused pipeline and
end-to-end against PIL.  Matches the reference's encode+serialize kernels
(gpujpeg_huffman_gpu_encoder.cu:299-502) in one pass.
"""

import io
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gpujpeg_tpu.utils import tables
from gpujpeg_tpu.ops import tokens, fusedpack


def _reference_rows(coefs, valid, luma, rstm, q, z_cap, w_out):
    """XLA path: per-class tokenize_rows + pack_stuff_fused (interpret)."""
    S, B, _ = coefs.shape
    bits = np.zeros((S, B * 64), np.uint32)
    lens = np.zeros((S, B * 64), np.int32)
    for cls in (1, 0):
        rows = np.nonzero(luma == cls)[0]
        if not len(rows):
            continue
        aff = tables.affine_ac_runtime(
            *tables.affine_params_for_quality(q, cls == 1))
        dc_lut = tables.huffman_encode_lut(
            *tables.huffman_spec_for("dc", cls == 1), 16)[:12]
        ac_lut = tables.huffman_encode_lut(
            *tables.ac_spec(cls == 1, q), 256).reshape(16, 16)
        b, l = tokens.tokenize_rows(jnp.asarray(coefs[rows]), dc_lut,
                                    ac_lut, valid[rows], ac_affine=aff)
        bits[rows] = np.asarray(b)
        lens[rows] = np.asarray(l)
    rows_ref, ob_ref, _ = fusedpack.pack_stuff_fused(
        jnp.asarray(bits), jnp.asarray(lens), rstm, l0=0, z_cap=z_cap,
        w_out=w_out, interpret=True)
    return np.asarray(rows_ref), np.asarray(ob_ref)


@pytest.mark.parametrize("compact", [(), (7, 8), (8,)])
def test_megakernel_matches_xla_path(rng, compact):
    q, z_cap, w_out = 75, 40, 96
    S, B = 12, 8
    consts = tables.entropy_kernel_consts(q)
    coefs = rng.integers(-200, 200, (S, B, 64)).astype(np.int16)
    coefs = np.where(rng.random((S, B, 64)) < 0.85, 0, coefs)
    coefs[3, 2] = 0                                 # all-zero block
    coefs[5, 7] = rng.integers(-1000, 1000, 64)     # dense block
    valid = np.ones((S, B), np.int64)
    valid[10, 5:] = 0                               # partial last segment
    coefs[10, 5:] = 0
    luma = np.zeros(S, np.int64)
    luma[:6] = 1
    rstm = np.full(S, 0xD0, np.uint32)
    rstm[5] = 0
    rstm[-1] = 0

    rows_ref, ob_ref = _reference_rows(coefs, valid, luma, rstm, q,
                                       z_cap, w_out)
    rows_m, ob_m, needs = fusedpack.entropy_fused(
        jnp.asarray(coefs.reshape(S, B * 64).T),
        jnp.asarray(valid.T.astype(np.int32)),
        jnp.asarray(luma.astype(np.int32).reshape(1, S)),
        rstm, z_cap, w_out, consts, interpret=True, compact_after=compact)
    rows_m, ob_m = np.asarray(rows_m), np.asarray(ob_m)
    assert fusedpack.mega_needs_ok(np.asarray(needs), z_cap, w_out,
                                   compact)
    assert np.array_equal(ob_ref, ob_m)
    for s in range(S):
        nw = (int(ob_ref[s]) + 3) // 4
        assert np.array_equal(rows_ref[s][:nw], rows_m[s][:nw]), s


def test_megakernel_overflow_detected(rng):
    """An illegal compaction schedule must be caught by mega_needs_ok."""
    q, z_cap, w_out = 75, 40, 96
    S, B = 4, 8
    consts = tables.entropy_kernel_consts(q)
    coefs = rng.integers(-1000, 1000, (S, B, 64)).astype(np.int16)
    valid = np.ones((S, B), np.int32)
    luma = np.ones((1, S), np.int32)
    rstm = np.full(S, 0xD0, np.uint32)
    _, _, needs = fusedpack.entropy_fused(
        jnp.asarray(coefs.reshape(S, B * 64).T), jnp.asarray(valid.T),
        jnp.asarray(luma), rstm, z_cap, w_out, consts, interpret=True,
        compact_after=(1, 2))
    assert not fusedpack.mega_needs_ok(np.asarray(needs), z_cap, w_out,
                                       (1, 2))


def test_mega_encoder_end_to_end(rng):
    """Full encoder through the MegaCaps path (interpret mode) decodes
    via PIL and matches the pairs-path stream byte for byte."""
    from PIL import Image
    import gpujpeg_tpu as gj
    from gpujpeg_tpu.models.encoder import MegaCaps

    os.environ["GPUJPEG_TPU_FUSED"] = "interpret"
    os.environ.pop("GPUJPEG_TPU_MEGA", None)
    try:
        h, w = 72, 88
        yy, xx = np.mgrid[0:h, 0:w]
        frame = np.stack([(xx * 255 // w), (yy * 255 // h),
                          ((xx + yy) * 255 // (w + h))], -1)
        frame = np.clip(frame + rng.integers(-12, 12, frame.shape),
                        0, 255).astype(np.uint8)
        p = gj.Parameters(quality=75, restart_interval=4)
        enc = gj.Encoder()
        out = enc.encode(frame, p)
        geo = enc.resolve(frame, p, None)
        assert isinstance(enc._caps[geo], MegaCaps)
        arr = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        mse = np.mean((frame.astype(float) - arr.astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) > 28

        os.environ["GPUJPEG_TPU_MEGA"] = "0"
        out_ref = gj.Encoder().encode(frame, p)
        assert out == out_ref
    finally:
        os.environ.pop("GPUJPEG_TPU_FUSED", None)
        os.environ.pop("GPUJPEG_TPU_MEGA", None)


def test_mega_encoder_xq_layout_end_to_end(rng):
    """restart_interval=8 with 64-pixel-multiple width engages the xq
    (16-word-contiguous, in-kernel transposed) feed; bytes must match
    the XLA pairs path exactly (round-4 data-movement redesign)."""
    from PIL import Image
    import gpujpeg_tpu as gj
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.models.encoder import MegaCaps

    os.environ["GPUJPEG_TPU_FUSED"] = "interpret"
    os.environ.pop("GPUJPEG_TPU_MEGA", None)
    try:
        h, w = 48, 128          # bpr=16, rstn=8 -> nsr=2, xq eligible
        yy, xx = np.mgrid[0:h, 0:w]
        frame = np.stack([(xx * 255 // w), (yy * 255 // h),
                          ((xx + yy) * 255 // (w + h))], -1)
        frame = np.clip(frame + rng.integers(-14, 14, frame.shape),
                        0, 255).astype(np.uint8)
        p = gj.Parameters(quality=75, restart_interval=8)
        enc = gj.Encoder()
        geo = enc.resolve(frame, p, None)
        _impl, infos = enc_mod.make_rows_xbd_impl(geo)
        assert all(i["xq"] for i in infos)   # the new path is exercised
        out = enc.encode(frame, p)
        assert isinstance(enc._caps[geo], MegaCaps)
        arr = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        mse = np.mean((frame.astype(float) - arr.astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) > 28

        os.environ["GPUJPEG_TPU_MEGA"] = "0"
        out_ref = gj.Encoder().encode(frame, p)
        assert out == out_ref
    finally:
        os.environ.pop("GPUJPEG_TPU_FUSED", None)
        os.environ.pop("GPUJPEG_TPU_MEGA", None)


def test_mega_interleaved_byte_identical(monkeypatch, rng):
    """The INTERLEAVED entropy megakernel (one call per scan, static
    per-slot class/quant masks, per-slice DCT matrix cycle) must produce
    byte-identical streams to the XLA tree path."""
    from gpujpeg_tpu import Encoder, Parameters

    cases = [
        ((40, 48, 3), Parameters(quality=75, restart_interval=-1,
                                 interleaved=True)),
        ((40, 48, 3), Parameters(quality=100, restart_interval=2,
                                 interleaved=True)),
        ((33, 41, 3), Parameters(quality=85, restart_interval=2,
                                 interleaved=True)),
        ((32, 40, 4), Parameters(quality=85, restart_interval=2,
                                 interleaved=True, comp_count=4)),
    ]
    for shape, p in cases:
        img = rng.integers(0, 256, shape, np.uint8)
        monkeypatch.delenv("GPUJPEG_TPU_FUSED", raising=False)
        ref = bytes(Encoder().encode(img, p))
        monkeypatch.setenv("GPUJPEG_TPU_FUSED", "interpret")
        got = bytes(Encoder().encode(img, p))
        monkeypatch.delenv("GPUJPEG_TPU_FUSED", raising=False)
        assert got == ref, (shape, p.quality)
