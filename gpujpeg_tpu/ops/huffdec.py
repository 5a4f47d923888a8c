"""Segment-parallel Huffman decoding on device.

The reference decodes one segment per CUDA thread with a 64Ki-entry lookup
table (src/gpujpeg_huffman_gpu_decoder.cu:390-536).  The TPU-native shape of
the same computation is a lax.while_loop whose every iteration decodes ONE
entropy token for EVERY segment simultaneously: segments are the vector
lanes, the data-dependent bit cursor lives in per-segment state, and the
token count per segment (bounded, data-dependent) drives a global
"all segments done" loop condition.  Byte stuffing is removed host-side
before upload, so the bit reader here is branch-free.

Inputs are padded (nseg, words) uint32 matrices; the decode LUT is the flat
16-bit-peek table from utils.tables.huffman_decode_lut16 (the host-built
equivalent of the reference's GPU table kernel, :539-610).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_bps", "max_iters"))
def decode_segments(words: jnp.ndarray, nbits: jnp.ndarray,
                    blocks_per_seg: jnp.ndarray,
                    dc_tab: jnp.ndarray, ac_tab: jnp.ndarray,
                    comp_of: jnp.ndarray,
                    lut: jnp.ndarray,
                    max_bps: int, max_iters: int):
    """Decode all segments' entropy data to zig-zag coefficients.

    words:   (nseg, W+1) uint32, MSB-first bit order, unstuffed, zero-padded
    nbits:   (nseg,) int32 valid bit count per segment
    blocks_per_seg: (nseg,) int32 actual block count per segment
    dc_tab/ac_tab:  (nseg, max_bps) int32 Huffman table slot per block
    comp_of: (nseg, max_bps) int32 component index per block (DC predictors)
    lut:     (ntab, 65536) uint16 decode LUT

    Returns (coefs, error): coefs (nseg, max_bps*64) int16 zig-zag
    coefficients; error (nseg,) bool.
    """
    nseg = words.shape[0]
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (nseg, 1), 0).reshape(-1)
    lut_flat = lut.reshape(-1)
    ntab_size = lut.shape[1]

    def cond(state):
        _, cursor, blk, pos, dcpred, err, it = state
        active = (blk < blocks_per_seg) & ~err
        return jnp.any(active) & (it < max_iters)

    def body(state):
        out, cursor, blk, pos, dcpred, err, it = state
        active = (blk < blocks_per_seg) & ~err
        blk_c = jnp.minimum(blk, max_bps - 1)

        # --- peek 32 bits at the cursor ---------------------------------
        wi = cursor >> 5
        sh = (cursor & 31).astype(jnp.uint32)
        w0 = words[seg_ids, wi]
        w1 = words[seg_ids, wi + 1]
        peek = jnp.where(sh == 0, w0,
                         (w0 << sh) | (w1 >> (jnp.uint32(32) - sh)))
        peek16 = (peek >> 16).astype(jnp.int32)

        # --- code lookup --------------------------------------------------
        is_dc = pos == 0
        tab = jnp.where(is_dc, dc_tab[seg_ids, blk_c], ac_tab[seg_ids, blk_c])
        entry = lut_flat[tab * ntab_size + peek16].astype(jnp.int32)
        clen = entry >> 8
        sym = entry & 0xFF
        run = sym >> 4
        size = sym & 15

        # --- value bits ----------------------------------------------------
        vshift = (jnp.uint32(32) - size.astype(jnp.uint32))
        val_u = jnp.where(size == 0, 0,
                          ((peek << clen.astype(jnp.uint32)) >> vshift)
                          ).astype(jnp.int32)
        # extend: v < 2^(size-1) -> v - 2^size + 1  (T.81 F.12)
        half = jnp.where(size > 0, 1 << jnp.maximum(size - 1, 0), 1)
        val = jnp.where((size > 0) & (val_u < half),
                        val_u - (1 << size) + 1, val_u)

        # --- state transition -----------------------------------------------
        is_eob = (~is_dc) & (sym == 0x00)
        is_zrl = (~is_dc) & (sym == 0xF0)
        coef_idx = jnp.where(is_dc, 0, pos + run)

        comp = comp_of[seg_ids, blk_c]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (nseg, 4), 1)
                  == comp[:, None])
        dc_new = jnp.take_along_axis(dcpred, comp[:, None], axis=1)[:, 0] + val
        write_val = jnp.where(is_dc, dc_new, val)
        do_write = active & ~is_eob & ~is_zrl
        dcpred = jnp.where(onehot & (is_dc & active)[:, None],
                           dc_new[:, None], dcpred)

        new_pos = jnp.where(is_eob, 64,
                  jnp.where(is_zrl, pos + 16, coef_idx + 1))
        consumed = clen + size

        # --- error detection -------------------------------------------------
        bad = active & ((clen == 0) | (cursor + consumed > nbits)
                        | (coef_idx > 63) | (new_pos > 64))
        err = err | bad
        ok = active & ~bad

        # --- commit ----------------------------------------------------------
        widx = jnp.where(ok & do_write, blk_c * 64 + coef_idx, 0)
        wval = jnp.where(ok & do_write, write_val, 0).astype(jnp.int16)
        out = out.at[seg_ids, widx].add(
            wval, indices_are_sorted=True, unique_indices=False)
        cursor = jnp.where(ok, cursor + consumed, cursor)
        block_done = new_pos >= 64
        blk = jnp.where(ok & block_done, blk + 1, blk)
        pos = jnp.where(ok, jnp.where(block_done, 0, new_pos), pos)
        return out, cursor, blk, pos, dcpred, err, it + 1

    out0 = jnp.zeros((nseg, max_bps * 64), jnp.int16)
    state = (
        out0,
        jnp.zeros(nseg, jnp.int32),   # cursor
        jnp.zeros(nseg, jnp.int32),   # blk
        jnp.zeros(nseg, jnp.int32),   # pos
        jnp.zeros((nseg, 4), jnp.int32),  # dcpred
        jnp.zeros(nseg, jnp.bool_),   # err
        jnp.int32(0),
    )
    out, cursor, blk, pos, dcpred, err, _ = jax.lax.while_loop(
        cond, body, state)
    err = err | (blk < blocks_per_seg)
    return out, err


