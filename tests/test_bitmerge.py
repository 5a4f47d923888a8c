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


def rows_to_byte_list(words, nbytes):
    by = np.asarray(words).astype(">u4").tobytes()
    return by[:nbytes]


@pytest.mark.parametrize("seed,T", [(0, 8), (1, 64), (2, 257), (3, 1536)])
def test_pack_rows_merge_matches_scalar(seed, T):
    rng = np.random.default_rng(seed)
    R = 5
    lens = rng.integers(0, 27, size=(R, T)).astype(np.int32)
    lens[rng.random(size=(R, T)) < 0.5] = 0  # sparse rows
    bits = np.zeros((R, T), np.uint32)
    for r in range(R):
        for t in range(T):
            if lens[r, t]:
                bits[r, t] = rng.integers(0, 1 << lens[r, t])
    words, row_bits = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens))
    words = np.asarray(words)
    row_bits = np.asarray(row_bits)
    for r in range(R):
        want = scalar_pack(bits[r], lens[r])
        assert int(row_bits[r]) == int(lens[r].sum())
        got = rows_to_byte_list(words[r], len(want))
        assert got == want, f"row {r} mismatch"


def test_pack_rows_with_pad_token():
    rng = np.random.default_rng(9)
    R, T = 3, 33
    lens = rng.integers(1, 17, size=(R, T)).astype(np.int32)
    bits = np.array([[rng.integers(0, 1 << l) for l in row] for row in lens],
                    dtype=np.uint32)
    b2, l2 = bitmerge.append_pad_token(jnp.asarray(bits), jnp.asarray(lens))
    words, row_bits = bitmerge.pack_rows_merge(b2, l2)
    row_bits = np.asarray(row_bits)
    assert (row_bits % 8 == 0).all()
    # padded with 1-bits: last byte of each row ends in 1s
    for r in range(R):
        want = scalar_pack(np.asarray(b2)[r], np.asarray(l2)[r])
        got = rows_to_byte_list(np.asarray(words)[r], len(want))
        assert got == want


def test_finalize_rows_stuffing_and_rst():
    # two segments; craft bytes that include 0xFF to exercise stuffing
    rows = np.zeros((2, 2), np.uint32)
    rows[0] = [0xFFD800AB, 0xFF000000]   # bytes: FF D8 00 AB FF ...
    rows[1] = [0x11FF2233, 0x44000000]
    seg_bytes = np.array([5, 5], np.int32)
    rst_marker = np.array([0xD0, 0], np.uint8)  # RST after seg0 only
    rst_shift = np.array([0, 2], np.int32)
    body, seg_out, seg_end_out, total = bitmerge.finalize_rows(
        jnp.asarray(rows), jnp.asarray(seg_bytes), rst_marker, rst_shift,
        cap_body=64)
    body = np.asarray(body)
    total = int(total)
    # seg0: FF D8 00 AB FF -> FF 00 D8 00 AB FF 00 (stuff both FF)
    want0 = bytes([0xFF, 0x00, 0xD8, 0x00, 0xAB, 0xFF, 0x00])
    # RST0
    want_rst = bytes([0xFF, 0xD0])
    # seg1: 11 FF 22 33 44 -> 11 FF 00 22 33 44
    want1 = bytes([0x11, 0xFF, 0x00, 0x22, 0x33, 0x44])
    want = want0 + want_rst + want1
    assert total == len(want)
    assert bytes(body[:total]) == want
    assert int(seg_out[0]) == 0
    assert int(seg_out[1]) == len(want0) + 2
    assert int(seg_end_out[0]) == len(want0)


def test_pack_rows_capacity_clamp():
    # rows longer than cap: row_bits still reports the true size (overflow
    # detectable by the caller)
    lens = np.full((1, 64), 26, np.int32)
    bits = np.full((1, 64), (1 << 26) - 1, np.uint32)
    words, row_bits = bitmerge.pack_rows_merge(
        jnp.asarray(bits), jnp.asarray(lens), row_cap_words=8)
    assert int(row_bits[0]) == 64 * 26
    assert words.shape == (1, 8)
