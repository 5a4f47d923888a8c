"""Tests for the gather-free hierarchical bit packer (ops.bitmerge)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpujpeg_tpu.ops import bitmerge


def scalar_pack(bits, lens):
    """Reference bit packer: sequential MSB-first emission."""
    out = bytearray()
    acc, nacc = 0, 0
    for b, l in zip(bits, lens):
        b, l = int(b), int(l)  # numpy ints corrupt Python bigint shifts
        if l == 0:
            continue
        acc = (acc << l) | (b & ((1 << l) - 1))
        nacc += l
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def make_tokens(rng, R, T, sparsity=0.5, max_len=27):
    lens = rng.integers(0, max_len, size=(R, T)).astype(np.int32)
    lens[rng.random(size=(R, T)) < sparsity] = 0
    bits = np.zeros((R, T), np.uint32)
    for r in range(R):
        for t in range(T):
            if lens[r, t]:
                bits[r, t] = rng.integers(0, 1 << lens[r, t])
    return bits, lens


def rows_bytes(words, n):
    return np.asarray(words).astype(">u4").tobytes()[:n]


@pytest.mark.parametrize("seed,T", [(0, 8), (1, 64), (2, 257),
                                    (3, 1536), (4, 2304)])
def test_pack_rows_merge_matches_scalar(seed, T):
    rng = np.random.default_rng(seed)
    R = 4
    bits, lens = make_tokens(rng, R, T)
    words, row_bits, need = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens))
    words = np.asarray(words)
    row_bits = np.asarray(row_bits)
    for r in range(R):
        want = scalar_pack(bits[r], lens[r])
        assert int(row_bits[r]) == int(lens[r].sum())
        assert rows_bytes(words[r], len(want)) == want, f"row {r}"
    # worst-case caps never overflow
    caps = bitmerge.worst_caps(T)
    assert all(int(need[i]) <= caps[i] * 32 for i in range(len(caps)))


def test_pack_rows_adaptive_caps_and_overflow_signal():
    rng = np.random.default_rng(7)
    R, T = 6, 128
    bits, lens = make_tokens(rng, R, T, sparsity=0.8, max_len=8)
    full, row_bits, need0 = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens))
    # adaptive schedule from measured needs packs identically
    caps = tuple(max(1, -(-int(b) // 32)) for b in np.asarray(need0))
    tight, rb2, need = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens), caps=caps)
    n = (int(np.asarray(row_bits).max()) + 31) // 32
    np.testing.assert_array_equal(np.asarray(full)[:, :n],
                                  np.asarray(tight)[:, :n])
    # a too-small schedule reports need > cap*32 (overflow signal)
    lens2 = np.full((1, 16), 27, np.int32)
    bits2 = np.full((1, 16), (1 << 26), np.uint32)
    _, _, need2 = bitmerge.pack_rows_merge(
        jnp.asarray(bits2), jnp.asarray(lens2),
        caps=(1,) * bitmerge.n_levels_for(16))
    assert any(int(b) > 32 for b in np.asarray(need2))


def test_or_pad_bits():
    bits = np.array([[0b101, 0b1]], np.uint32)
    lens = np.array([[3, 1]], np.int32)
    words, row_bits, _ = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens))
    padded = bitmerge.or_pad_bits(words, row_bits)
    # 1011 + 4 pad 1-bits -> byte 0b10111111
    assert rows_bytes(np.asarray(padded)[0], 1) == bytes([0b10111111])


def test_stuff_rows():
    # row bytes: FF D8 00 AB FF  -> stuffed FF 00 D8 00 AB FF 00 + RST0
    words = np.array([[0xFFD800AB, 0xFF000000],
                      [0x11FF2233, 0x44000000]], np.uint32)
    row_bytes = np.array([5, 5], np.int32)
    rst = np.array([0xD0, 0x00], np.uint8)
    out, out_bytes, _ = bitmerge.stuff_rows(
        jnp.asarray(words), jnp.asarray(row_bytes), rst)
    out = np.asarray(out)
    assert int(out_bytes[0]) == 9
    assert rows_bytes(out[0], 9) == bytes(
        [0xFF, 0x00, 0xD8, 0x00, 0xAB, 0xFF, 0x00, 0xFF, 0xD0])
    assert int(out_bytes[1]) == 6
    assert rows_bytes(out[1], 6) == bytes([0x11, 0xFF, 0x00, 0x22, 0x33, 0x44])


def test_stuff_rows_trailing_ff_pad():
    # a row ending in 0xFF (e.g. from 1-bit padding) must still be stuffed
    words = np.array([[0xABFF0000]], np.uint32)
    out, out_bytes, _ = bitmerge.stuff_rows(
        jnp.asarray(words), jnp.asarray(np.array([2], np.int32)),
        np.array([0xD3], np.uint8))
    assert int(out_bytes[0]) == 5
    assert rows_bytes(np.asarray(out)[0], 5) == bytes(
        [0xAB, 0xFF, 0x00, 0xFF, 0xD3])
