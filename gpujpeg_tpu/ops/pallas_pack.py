"""Fused Pallas TPU kernel for the bit-merge pack (+ padding).

The XLA merge tree (ops.bitmerge) materializes every level in HBM
(~20 GB of traffic for an 8K frame).  This kernel runs the whole tree for a
TILE of segment rows inside VMEM: HBM traffic collapses to one read of the
token arrays and one write of the packed rows.

Grid: one program per row tile.  The tree itself is the same algorithm as
bitmerge.pack_rows_merge (list-of-word-planes while buffers are many,
packed (rows, N, K) later), unrolled at trace time; Mosaic sees only
elementwise ops, static slices and variable shifts.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bitmerge


def bit_reverse_columns(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Permute the last axis (length 2^k) into bit-reversed order using
    only reshape/transpose (no gather).  With tokens in bit-reversed
    order, every merge-tree level pairs the FIRST and SECOND halves of the
    buffer array — contiguous static slices that Mosaic can lower."""
    R = x.shape[0]
    y = x.reshape((R,) + (2,) * k)
    y = y.transpose((0,) + tuple(range(k, 0, -1)))
    return y.reshape(R, 1 << k)


def _split2(x):
    """First/second-half split (inputs are bit-reverse permuted)."""
    N = x.shape[1]
    return x[:, :N // 2], x[:, N // 2:]


def _kshift_words(buf, w: int, axis: int):
    """Static right-shift along `axis` (zero fill) via pltpu.roll + mask
    (Mosaic rejects misaligned lane-dim concatenates)."""
    if w == 0:
        return buf
    rolled = pltpu.roll(buf, w, axis=axis)
    lane = jax.lax.broadcasted_iota(jnp.int32, buf.shape, axis)
    return jnp.where(lane >= w, rolled, 0)


def _kbitstream_shift(buf, shift, word_axis: int, max_words: int):
    """Dynamic per-buffer bitstream right-shift (kernel-local variant of
    bitmerge._bitstream_shift built on roll+mask)."""
    sh = jnp.expand_dims(shift, word_axis)
    r = (sh & 31).astype(jnp.uint32)
    hi = buf >> r
    prev = _kshift_words(buf, 1, word_axis)
    carry = jnp.where(r == 0, jnp.uint32(0), prev << (jnp.uint32(32) - r))
    buf = hi | carry
    w = (sh >> 5).astype(jnp.int32)
    K = buf.shape[word_axis]
    step = 1
    while step <= min(max_words, K - 1):
        moved = _kshift_words(buf, step, word_axis)
        buf = jnp.where((w & step) != 0, moved, buf)
        step *= 2
    return buf


def _tree_in_vmem(bits, lens, caps, max_token_bits: int):
    """The merge tree on VMEM-resident values: (rows, T) -> (rows, K).

    Shallow levels keep buffers as LISTS of (rows, N) word planes; once
    capacities exceed ~16 words the planes stack into one
    (rows, N, K_final) array — padded to the final capacity immediately so
    deep levels only need rolls, never lane-dim concatenates."""
    R, T = bits.shape
    levels = bitmerge.n_levels_for(T)
    K_final = int(caps[-1])
    row_bits = jnp.sum(lens, axis=1, dtype=jnp.int32)

    lvl0 = (bits << jnp.clip(32 - lens, 0, 31).astype(jnp.uint32))
    planes = [jnp.where(lens >= 32, bits, lvl0)]
    blen = lens
    N = T

    packed = None
    for lv in range(1, levels + 1):
        K_new = int(caps[lv - 1])
        M = (N + 1) // 2
        theory_w = ((1 << (lv - 1)) * max_token_bits) >> 5
        la, lb = _split2(blen)
        if packed is None:
            ab = [_split2(p) for p in planes]
            a = [x for x, _ in ab]
            b = [y for _, y in ab]
            z = jnp.zeros_like(a[0])
            a = a + [z] * (K_new - len(a)) if len(a) < K_new else a[:K_new]
            b = b + [z] * (K_new - len(b)) if len(b) < K_new else b[:K_new]
            b = bitmerge._planes_shift(b, la, min(theory_w, K_new - 1))
            planes = [x | y for x, y in zip(a, b)]
        else:
            Nn = packed.shape[1]
            a = packed[:, :Nn // 2, :]
            b = packed[:, Nn // 2:, :]
            b = _kbitstream_shift(b, la, 2, min(theory_w, K_final - 1))
            packed = a | b
        blen = la + lb
        N = M
        if packed is None and K_new >= 16:
            # pad each plane list to the FINAL capacity once; deep levels
            # then never need lane-dim concats
            z = jnp.zeros_like(planes[0])
            planes = planes + [z] * (K_final - len(planes))
            packed = jnp.stack(planes, axis=2)
            planes = None

    if packed is not None:
        words = packed[:, 0, :]
    else:
        words = jnp.concatenate([p for p in planes], axis=1)
    return words, row_bits


def make_pack_kernel(R: int, T: int, caps: Sequence[int],
                     tile_rows: int = 8, max_token_bits: int = 27):
    """Jittable fused packer: (bits (R,T) u32, lens (R,T) i32) ->
    (words (R,K) u32, row_bits (R,) i32).

    Tokens are padded to a power of two and bit-reverse permuted on the
    XLA side (transposes only) so the in-kernel tree uses contiguous
    halves-splits."""
    k2 = max(1, (T - 1).bit_length())
    T2 = 1 << k2
    levels = k2
    caps2 = list(caps)
    if bitmerge.n_levels_for(T) != levels:
        # padding added levels; extend the schedule conservatively
        caps2 = list(caps) + [caps[-1]] * (levels - bitmerge.n_levels_for(T))
    # align capacities: level i of the padded tree corresponds to merged
    # groups of 2^(i+1) tokens, same as the unpadded tree
    caps2 = tuple(caps2[:levels]) if len(caps2) >= levels else tuple(
        list(caps2) + [caps2[-1]] * (levels - len(caps2)))
    K = int(caps2[-1])
    grid = -(-R // tile_rows)
    Rpad = grid * tile_rows

    def kernel(bits_ref, lens_ref, words_ref, rb_ref):
        words, row_bits = _tree_in_vmem(bits_ref[:, :], lens_ref[:, :],
                                        caps2, max_token_bits)
        words_ref[:, :] = words
        rb_ref[:, :] = row_bits[:, None]

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, T2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, T2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rpad, K), jnp.uint32),
            jax.ShapeDtypeStruct((Rpad, 1), jnp.int32),
        ],
    )

    def fn(bits, lens):
        if T2 != T:
            bits = jnp.pad(bits, ((0, 0), (0, T2 - T)))
            lens = jnp.pad(lens, ((0, 0), (0, T2 - T)))
        if Rpad != R:
            bits = jnp.pad(bits, ((0, Rpad - R), (0, 0)))
            lens = jnp.pad(lens, ((0, Rpad - R), (0, 0)))
        bits = bit_reverse_columns(bits, k2)
        lens = bit_reverse_columns(lens, k2)
        words, rb = call(bits, lens)
        return words[:R], rb[:R, 0]

    return fn


# STATUS: experimental.  Correct under the Pallas interpreter and on TPU for
# shallow trees (verified T<=64); large trees (T=768) still hit a Mosaic
# miscompile in the deep packed phase, and Mosaic compile times for the
# unrolled tree are minutes.  Not wired into the encoder yet — the XLA
# merge tree (ops.bitmerge) remains the production path.  The fused kernel
# is the planned speed-of-light step: it collapses ~20 GB of HBM level
# traffic per 8K frame into one read of the token arrays and one write of
# the packed rows (~1 GB).
