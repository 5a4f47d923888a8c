"""Gather-free segment bit-packing: hierarchical bitstream merge.

The reference serializes each restart segment's Huffman tokens with one CUDA
thread writing variable-length codewords sequentially
(src/gpujpeg_huffman_gpu_encoder.cu:406-502).  A TPU has no efficient
data-dependent gather/scatter inside XLA programs, so the packer is instead a
**pairwise merge tree**: tokens are (bits, len) bitstrings; concatenation is
associative, so each level merges adjacent pairs of bitstring buffers into
buffers of twice the capacity:

    level 0:  T tokens/row, 1 word each   (codeword, <=27 bits used)
    level L:  T/2^L buffers/row, cap_L words each
    level log2(T): one buffer per row == the packed segment

Appending B (len lb) to A (len la) is A | (B >> la), where ">>" is a
bitstream shift by la bits of B's whole word buffer.  The shift decomposes
into a sub-word part (variable elementwise shifts — native VPU ops) and a
whole-word part (log2 conditional static rolls — pad+slice, no gathers).
Total data movement is O(rows * T * log T) words with small constants; no
gathers, no scatters, no sorts anywhere.

The per-segment byte-alignment pad token (1-bits, F.1.2.3) is appended by
the caller as an extra token column, exactly like ops.pack.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _shift_words_right(buf: jnp.ndarray, w: int) -> jnp.ndarray:
    """Shift the word axis (last) right by a STATIC w words (zero fill)."""
    if w == 0:
        return buf
    pad = jnp.zeros(buf.shape[:-1] + (w,), buf.dtype)
    return jnp.concatenate([pad, buf[..., :-w]], axis=-1)


def _bitstream_shift_right(buf: jnp.ndarray, shift: jnp.ndarray,
                           max_shift: int) -> jnp.ndarray:
    """Shift each buffer right by a per-buffer dynamic bit count.

    buf:   (..., K) uint32, MSB-first bitstream
    shift: (...,) int32 in [0, max_shift]
    """
    K = buf.shape[-1]
    # sub-word part: variable shifts are plain VPU ops
    r = (shift & 31).astype(jnp.uint32)[..., None]
    hi = buf >> r
    lo_src = _shift_words_right(buf, 1)
    # (x << 32) is undefined; mask the r==0 case
    carry = jnp.where(r == 0, jnp.uint32(0),
                      lo_src << (jnp.uint32(32) - r))
    buf = hi | carry
    # whole-word part: conditional static rolls over the bits of (shift>>5)
    w = (shift >> 5).astype(jnp.int32)[..., None]
    max_words = min(max_shift >> 5, K)
    k = 0
    while (1 << k) <= max_words:
        moved = _shift_words_right(buf, 1 << k)
        buf = jnp.where((w & (1 << k)) != 0, moved, buf)
        k += 1
    return buf


def pack_rows_merge(bits: jnp.ndarray, lens: jnp.ndarray,
                    max_token_bits: int = 32,
                    row_cap_words: int | None = None):
    """Pack each row of tokens into one MSB-first bitstream.

    bits: (R, T) uint32 right-aligned codewords
    lens: (R, T) int32 bit lengths (0 = empty slot)

    Returns (words, row_bits): (R, K) uint32 packed rows and (R,) int32
    total bit counts.  K is the static worst-case capacity
    ceil(T * max_token_bits / 32) clamped to row_cap_words (content-adaptive
    callers pass the sticky capacity; overflow detection is theirs via
    row_bits).
    """
    R, T = bits.shape
    # pad T to a power of two with empty tokens
    T2 = 1 << max(1, (T - 1).bit_length())
    if T2 != T:
        bits = jnp.pad(bits, ((0, 0), (0, T2 - T)))
        lens = jnp.pad(lens, ((0, 0), (0, T2 - T)))
    row_bits = jnp.sum(lens, axis=1, dtype=jnp.int32)

    full_cap = -(-T2 * max_token_bits // 32)
    if row_cap_words is None:
        row_cap_words = full_cap

    # level 0: one word per token, MSB-aligned
    buf = (bits << jnp.clip(32 - lens, 0, 31).astype(jnp.uint32))
    buf = jnp.where(lens >= 32, bits, buf)[..., None]  # (R, T2, 1)
    blen = lens

    level = 0
    nbuf = T2
    while nbuf > 1:
        level += 1
        nbuf //= 2
        a = buf[:, 0::2]
        b = buf[:, 1::2]
        la = blen[:, 0::2]
        lb = blen[:, 1::2]
        K_old = a.shape[-1]
        # capacity this level: worst-case bits of 2^level tokens
        cap_bits = min((1 << level) * max_token_bits, row_cap_words * 32)
        K_new = min(-(-cap_bits // 32), row_cap_words)
        if K_new > K_old:
            z = jnp.zeros(a.shape[:-1] + (K_new - K_old,), a.dtype)
            a = jnp.concatenate([a, z], axis=-1)
            b = jnp.concatenate([b, z], axis=-1)
        max_shift = min((K_new - 1) * 32 + 31, (1 << (level - 1))
                        * max_token_bits)
        b = _bitstream_shift_right(b, la, max_shift)
        buf = a | b
        blen = la + lb
    return buf[:, 0], row_bits


def append_pad_token(bits: jnp.ndarray, lens: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append the byte-alignment 1-bits pad token per row (F.1.2.3)."""
    row_bits = jnp.sum(lens, axis=1, dtype=jnp.int32)
    pad = ((-row_bits) % 8).astype(jnp.int32)
    pad_bits = ((jnp.uint32(1) << pad.astype(jnp.uint32)) - 1)
    bits = jnp.concatenate([bits, pad_bits[:, None]], axis=1)
    lens = jnp.concatenate([lens, pad[:, None]], axis=1)
    return bits, lens


def rows_to_bytes(rows: jnp.ndarray) -> jnp.ndarray:
    """(R, K) uint32 BE bitstream words -> (R, 4K) uint8."""
    b = jnp.stack([(rows >> 24) & 0xFF, (rows >> 16) & 0xFF,
                   (rows >> 8) & 0xFF, rows & 0xFF], axis=-1)
    return b.reshape(rows.shape[0], rows.shape[1] * 4).astype(jnp.uint8)


def finalize_rows(rows: jnp.ndarray, seg_bytes: jnp.ndarray,
                  rst_marker: np.ndarray, rst_shift: np.ndarray,
                  cap_body: int):
    """Device stream formatter over per-segment rows: byte stuffing +
    restart markers + global compaction, with only 2-D cumsums and ONE
    sorted scatter (cf. the flat-array variant in ops.pack, and the
    reference's CPU loop, gpujpeg_encoder.c:566-624).

    rows:      (nseg, K) uint32 packed per-segment bitstreams
    seg_bytes: (nseg,) int32 byte length of each segment
    rst_marker/rst_shift: static per-segment tables (Geometry)

    Returns (body, seg_out, seg_end_out, total_out) as in
    pack.finalize_scan_bodies.
    """
    nseg, K = rows.shape
    by = rows_to_bytes(rows)                          # (nseg, 4K)
    col = jax.lax.broadcasted_iota(jnp.int32, by.shape, 1)
    valid = col < seg_bytes[:, None]
    is_ff = ((by == 0xFF) & valid).astype(jnp.int32)
    ff_in_row_excl = jnp.cumsum(is_ff, axis=1) - is_ff
    ff_row_total = jnp.sum(is_ff, axis=1)
    ff_base = jnp.cumsum(ff_row_total) - ff_row_total  # exclusive over rows
    seg_start = jnp.cumsum(seg_bytes) - seg_bytes
    shift_tab = jnp.asarray(rst_shift)

    out_pos = (seg_start[:, None] + col + ff_base[:, None]
               + ff_in_row_excl + shift_tab[:, None])
    body = jnp.zeros(cap_body, jnp.uint8).at[
        jnp.where(valid, out_pos, cap_body).reshape(-1)].set(
        by.reshape(-1), mode="drop",
        indices_are_sorted=True, unique_indices=True)

    seg_out = seg_start + ff_base + shift_tab
    seg_end_out = seg_out + seg_bytes + ff_row_total

    has_rst = jnp.asarray(rst_marker) != 0
    rpos = jnp.where(has_rst, seg_end_out, cap_body)
    body = body.at[rpos].set(jnp.uint8(0xFF), mode="drop",
                             indices_are_sorted=True, unique_indices=True)
    body = body.at[jnp.where(has_rst, rpos + 1, cap_body + 1)].set(
        jnp.asarray(rst_marker), mode="drop",
        indices_are_sorted=True, unique_indices=True)

    total_out = (seg_start[-1] + seg_bytes[-1] + ff_base[-1]
                 + ff_row_total[-1] + shift_tab[-1]
                 + 2 * has_rst[-1].astype(jnp.int32))
    return body, seg_out, seg_end_out, total_out
