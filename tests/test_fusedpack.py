"""Fused pack+stuff kernel vs the XLA merge tree (interpret mode on CPU).

The kernel must produce byte-identical stuffed rows for any token content
whose realized needs fit the (l0, z_cap, w_out) capacities, and must
report needs that flag exactly the contents that do not fit.
"""

import numpy as np
import pytest

from gpujpeg_tpu.ops import bitmerge, fusedpack

import jax.numpy as jnp


def xla_reference(bits, lens, rst, T, z_cap=64):
    """bitmerge pack -> pad -> stuff, worst-case caps (always correct)."""
    caps = bitmerge.worst_caps(T, 27)
    words, row_bits, _ = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens), caps=caps)
    seg_bytes = (row_bits + 7) >> 3
    padded = bitmerge.or_pad_bits(words, row_bits)
    rows, out_bytes, _ = bitmerge.stuff_rows_roll(
        padded, seg_bytes, rst, z_cap=z_cap)
    return np.asarray(rows), np.asarray(out_bytes)


def to_bytes(rows_u32, nbytes):
    by = np.ascontiguousarray(rows_u32.astype(">u4")).view(np.uint8)
    by = by.reshape(rows_u32.shape[0], -1)
    return [by[i, : int(nbytes[i])].tobytes() for i in range(len(nbytes))]


def random_tokens(rng, R, T, max_len=27, density=0.5, ff_bias=False):
    lens = rng.integers(0, max_len + 1, size=(R, T)).astype(np.int32)
    lens = np.where(rng.random((R, T)) < density, lens, 0)
    if ff_bias:
        # all-ones tokens maximize 0xFF bytes in the packed stream
        bits = (1 << np.clip(lens, 0, 31)) - 1
        bits = bits.astype(np.uint32)
    else:
        bits = rng.integers(0, 1 << 31, size=(R, T)).astype(np.uint32)
        bits = bits & ((1 << np.clip(lens, 0, 31)) - 1).astype(np.uint32)
    return bits, lens


@pytest.mark.parametrize("T,l0,density,max_len", [
    (64, 0, 0.5, 27),
    (64, 1, 0.4, 12),
    (96, 2, 0.5, 6),
    (128, 1, 0.3, 14),
])
def test_fused_matches_xla(rng, T, l0, density, max_len):
    R = 9
    bits, lens = random_tokens(rng, R, T, max_len=max_len, density=density)
    rst = np.where(np.arange(R) % 3 != 2,
                   0xD0 + (np.arange(R) % 8), 0).astype(np.uint32)

    ref_rows, ref_bytes = xla_reference(bits, lens, rst, T)

    w_out = int(np.max(ref_bytes)) // 4 + 4
    rows, out_bytes, needs = fusedpack.pack_stuff_fused(
        jnp.asarray(bits), jnp.asarray(lens), rst,
        l0=l0, z_cap=64, w_out=w_out, interpret=True)
    rows, out_bytes = np.asarray(rows), np.asarray(out_bytes)
    needs = np.asarray(needs)

    assert fusedpack.needs_ok(needs, min(l0, fusedpack.pow2_ge(T)
                                         .bit_length() - 1), 64, w_out), needs
    assert np.array_equal(out_bytes, ref_bytes)
    assert to_bytes(rows, out_bytes) == to_bytes(ref_rows, ref_bytes)


def test_fused_ff_heavy_stuffing(rng):
    """All-ones tokens produce runs of 0xFF bytes; stuffing must match.

    This content realizes ~78 stuffed zeros per row, so z_cap must cover
    it (the encoder's needs protocol would otherwise grow z_cap and
    retry); with an insufficient z_cap both paths signal via needs[-2]."""
    R, T = 5, 64
    bits, lens = random_tokens(rng, R, T, max_len=20, density=0.8,
                               ff_bias=True)
    rst = np.full(R, 0xD3, np.uint32)
    ref_rows, ref_bytes = xla_reference(bits, lens, rst, T, z_cap=128)
    w_out = int(np.max(ref_bytes)) // 4 + 4
    rows, out_bytes, needs = fusedpack.pack_stuff_fused(
        jnp.asarray(bits), jnp.asarray(lens), rst,
        l0=0, z_cap=128, w_out=w_out, interpret=True)
    assert fusedpack.needs_ok(np.asarray(needs), 0, 128, w_out)
    assert np.array_equal(np.asarray(out_bytes), ref_bytes)
    assert to_bytes(np.asarray(rows), np.asarray(out_bytes)) == \
        to_bytes(ref_rows, ref_bytes)


@pytest.mark.parametrize("T,density,max_len", [
    (64, 0.4, 12),
    (128, 0.3, 14),
    (96, 0.25, 10),
])
def test_fused_pre_matches_xla(rng, T, density, max_len):
    """Pre-merged (tokenizer pairs mode) input path: byte-identical."""
    R = 9
    bits, lens = random_tokens(rng, R, T, max_len=max_len, density=density)
    rst = np.where(np.arange(R) % 3 != 2,
                   0xD0 + (np.arange(R) % 8), 0).astype(np.uint32)
    ref_rows, ref_bytes = xla_reference(bits, lens, rst, T)

    # emulate tokens.tokenize_rows pairs=True on raw (bits, lens)
    l32 = lens.astype(np.int32)
    x = np.where(l32 > 0,
                 (bits.astype(np.uint64)
                  << (32 - np.clip(l32, 1, 31)).astype(np.uint64))
                 & np.uint64(0xFFFFFFFF),
                 np.uint64(0)).astype(np.uint32)
    a, b = x[:, 0::2], x[:, 1::2]
    la, lb = l32[:, 0::2], l32[:, 1::2]
    merged = a | (b >> np.clip(la, 0, 31).astype(np.uint32))
    mlen = la + lb
    assert mlen.max() <= 32, "test content must fit level-1 pairs"

    w_out = int(np.max(ref_bytes)) // 4 + 4
    rows, out_bytes, needs = fusedpack.pack_stuff_fused_pre(
        jnp.asarray(merged), jnp.asarray(mlen), rst,
        z_cap=64, w_out=w_out, interpret=True)
    rows, out_bytes = np.asarray(rows), np.asarray(out_bytes)
    assert fusedpack.needs_ok(np.asarray(needs), 1, 64, w_out)
    assert np.array_equal(out_bytes, ref_bytes)
    assert to_bytes(rows, out_bytes) == to_bytes(ref_rows, ref_bytes)


def test_encoder_fused_interpret_byte_identical(rng, monkeypatch):
    """End-to-end Encoder with the fused path (interpret) must emit the
    exact bytes of the XLA merge-tree path, including the pairs-mode
    tokenizer (l0=1) wiring."""
    from gpujpeg_tpu import Encoder, Parameters

    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    param = Parameters(quality=75, restart_interval=2)

    monkeypatch.setenv("GPUJPEG_TPU_FUSED", "0")
    ref = Encoder().encode(img, param)

    monkeypatch.setenv("GPUJPEG_TPU_FUSED", "interpret")
    monkeypatch.setenv("GPUJPEG_TPU_MEGA", "0")
    enc = Encoder()
    out = enc.encode(img, param)
    caps = next(iter(enc._caps.values()))
    assert caps.l0 == 1, "expected the pairs-mode fused path"
    assert out == ref


def test_needs_flag_overflow(rng):
    """Dense content must trip the l0 needs check rather than pass."""
    R, T = 4, 64
    lens = np.full((R, T), 27, np.int32)   # every token 27 bits
    bits = np.full((R, T), (1 << 27) - 5, np.uint32)
    rst = np.zeros(R, np.uint32)
    rows, out_bytes, needs = fusedpack.pack_stuff_fused(
        jnp.asarray(bits), jnp.asarray(lens), rst,
        l0=2, z_cap=64, w_out=70, interpret=True)
    assert not fusedpack.needs_ok(np.asarray(needs), 2, 64, 70)


def test_w_out_overflow_detected(rng):
    R, T = 4, 64
    bits, lens = random_tokens(rng, R, T, max_len=20, density=0.9)
    rst = np.zeros(R, np.uint32)
    rows, out_bytes, needs = fusedpack.pack_stuff_fused(
        jnp.asarray(bits), jnp.asarray(lens), rst,
        l0=0, z_cap=64, w_out=8, interpret=True)   # absurdly small w_out
    assert not fusedpack.needs_ok(np.asarray(needs), 0, 64, 8)
