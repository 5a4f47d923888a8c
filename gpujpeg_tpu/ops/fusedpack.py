"""Fused Pallas TPU kernel: merge-tree pack + F.1.2.3 pad + byte stuffing
+ restart markers, VMEM-resident.

Replaces the round-1 pallas_pack experiment (halves-split tree on padded
3D (rows, N, K) buffers — lane-padding made it 2.3x SLOWER than the XLA
tree).  The new formulation keeps every level a constant-shape 2D array:

  * TRANSPOSED layout: sublanes = buffer words, lanes = segment rows.
  * POWER-OF-2 capacity schedule: level l of the merge tree gets capacity
    2^(l-l0) words (l0 = content-density knob; 32/2^l0 bits-per-token
    ceiling, sticky per geometry with overflow-driven decrease).
  * IN-PLACE SPAN DOUBLING: at deep level d, buffer i occupies sublanes
    [i*2^d, (i+1)*2^d) — merging adjacent buffers (2i, 2i+1) appends the
    odd buffer's words onto the even one's IN PLACE.  Every op is an
    elementwise shift/select or a pltpu.roll along sublanes with a static
    mask; no gathers, no strided slices, no lane-dim concats, no 3D.

The XLA side runs the K=1 early levels (l <= l0, sub-word shifts only —
they fuse into the tokenizer's epilogue) and hands the kernel compacted
(N0 = T2/2^l0, rows) word/bitlen planes.

Byte stuffing (0xFF -> 0xFF00, gpujpeg_huffman_gpu_encoder.cu:114-125) and
the RST append (:491-493) run in the same kernel on 4 byte-plane arrays
(byte j of every word), using the same pos_k/select-chain algorithm as
ops.bitmerge.stuff_rows_roll.

Capacity protocol (mirrors the encoder's sticky Caps): the kernel emits a
`needs` vector — per-deep-level max merged bits, realized max stuffed
zeros, max output bytes — and the host grows (l0 down, z_cap/w_out up)
and recompiles on overflow, exactly like the XLA path's level_need.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pow2_ge(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


# --------------------------------------------------------------------------
# XLA side: early (cap = 1 word) merge levels, (rows, T) orientation
# --------------------------------------------------------------------------

def early_levels(bits: jnp.ndarray, lens: jnp.ndarray, l0: int, T2: int):
    """Merge adjacent token pairs l0 times with 1-word buffers.

    bits: (R, T) uint32 right-aligned codewords; lens: (R, T) int lengths.
    Returns (words (R, N0) u32 left-aligned, blen (R, N0) i32,
    needs (l0,) i32) with N0 = T2/2^l0.  A merged pair whose combined
    length exceeds 32 produces garbage that the caller detects via needs.
    """
    R, T = bits.shape
    if T2 != T:
        bits = jnp.pad(bits, ((0, 0), (0, T2 - T)))
        lens = jnp.pad(lens, ((0, 0), (0, T2 - T)))
    lens = lens.astype(jnp.int32)
    x = jnp.where(lens >= 32, bits,
                  bits << jnp.clip(32 - lens, 0, 31).astype(jnp.uint32))
    blen = lens
    needs = []
    for _ in range(l0):
        a, b = x[:, 0::2], x[:, 1::2]
        la, lb = blen[:, 0::2], blen[:, 1::2]
        sh = (la & 31).astype(jnp.uint32)
        x = a | jnp.where(la >= 32, jnp.uint32(0), b >> sh)
        blen = la + lb
        needs.append(jnp.max(blen).astype(jnp.int32))
    needs = (jnp.stack(needs) if needs
             else jnp.zeros((0,), jnp.int32))
    return x, blen, needs


# --------------------------------------------------------------------------
# Pallas kernel: deep levels + pad + stuffing + RST, transposed layout
# --------------------------------------------------------------------------

def _roll(x, shift: int):
    """Cyclic sublane roll by a static amount (positive = toward higher
    sublane index: dest s receives source s - shift)."""
    if shift % x.shape[0] == 0:
        return x
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _deep_stuff_kernel_body(w_ref, l_ref, rst_ref, out_ref, ob_ref,
                            needs_ref, *, N0: int, D: int, W_out: int,
                            W_stuff: int, z_cap: int):
    x = w_ref[:, :]                       # (N0, R) u32 left-aligned words
    blen = l_ref[:, :]                    # (N0, R) i32, one buffer per sublane
    R = x.shape[1]

    sub = jax.lax.broadcasted_iota(jnp.int32, (N0, R), 0)
    needs_vals = []

    # ---- deep merge levels: span doubles each level, buffers stay put ----
    for d in range(1, D + 1):
        half = 1 << (d - 1)
        span = 1 << d
        second = (sub & half) != 0        # static: odd half of each span

        la = jnp.where(second, _roll(blen, half), blen)
        lb = jnp.where(second, blen, _roll(blen, -half))
        blen = la + lb
        needs_vals.append(jnp.max(blen))

        b = jnp.where(second, x, jnp.uint32(0))
        # whole-word move UP first: b's words go from rel slots
        # [half, span) to [w, w+half) with w = la//32, i.e. shift by
        # m = half - w.  Slots outside the destination stay zero, so the
        # sub-word pass below needs only a static span-boundary mask and
        # the spill word (b's low r bits crossing into word w+half) lands
        # in-span instead of being truncated.
        m = half - (la >> 5)
        for j in range(d):
            step = 1 << j
            same = (sub & (span - 1)) + step < span   # static per (j, d)
            moved = jnp.where(same, _roll(b, -step), jnp.uint32(0))
            b = jnp.where((m & step) != 0, moved, b)
        # sub-word shift right by r = la & 31 with carry from the previous
        # word (zero below w, so no dynamic masking is needed)
        r = (la & 31).astype(jnp.uint32)
        prev = jnp.where((sub & (span - 1)) == 0, jnp.uint32(0),
                         _roll(b, 1))
        carry = jnp.where(r == 0, jnp.uint32(0),
                          prev << ((jnp.uint32(32) - r) & 31))
        b = (b >> r) | carry
        x = jnp.where(second, jnp.uint32(0), x) | b

    row_bits = blen[0:1, :]               # replicated; any sublane works

    # ---- trim to the stuffing working set ----
    if W_stuff <= N0:
        x = x[:W_stuff]
    else:
        x = jnp.concatenate(
            [x, jnp.zeros((W_stuff - N0, R), jnp.uint32)], axis=0)
    ssub = jax.lax.broadcasted_iota(jnp.int32, (W_stuff, R), 0)

    # ---- F.1.2.3: OR 1-bits to the next byte boundary ----
    pad = ((-row_bits) % 8).astype(jnp.uint32)
    wi = row_bits >> 5
    bo = (row_bits & 31).astype(jnp.uint32)
    ones = jnp.where(pad == 0, jnp.uint32(0),
                     ((jnp.uint32(1) << pad) - 1)
                     << ((jnp.uint32(32) - bo - pad) & 31))
    x = x | jnp.where(ssub == wi, ones, jnp.uint32(0))
    row_bytes = (row_bits + 7) >> 3       # (1, R)

    # ---- byte stuffing on 4 byte planes (plane j = byte j of each word) --
    planes = [((x >> (24 - 8 * j)) & 0xFF) for j in range(4)]
    valid = [(4 * ssub + j) < row_bytes for j in range(4)]
    is_ff = [valid[j] & (planes[j] == 0xFF) for j in range(4)]
    ffc = [f.astype(jnp.int32) for f in is_ff]
    word_ff = ffc[0] + ffc[1] + ffc[2] + ffc[3]
    # exclusive cumsum of per-word FF counts down sublanes (Hillis-Steele)
    cum = word_ff
    s = 1
    while s < W_stuff:
        cum = cum + jnp.where(ssub >= s, _roll(cum, s), 0)
        s *= 2
    cum_excl = cum - word_ff
    nff = cum[W_stuff - 1:W_stuff, :]     # (1, R) total FFs per row
    needs_vals.append(jnp.max(nff))

    # ffx[j] = 1-based rank of the FF at byte (word s, byte j)
    run = cum_excl
    ffx, pos_base = [], []
    for j in range(4):
        run = run + ffc[j]
        ffx.append(run)                   # inclusive rank if this is an FF
    # output position of the k-th stuffed zero: source byte index + k
    q = [4 * ssub + j for j in range(4)]
    poss = []
    for k in range(1, min(z_cap, 4 * W_stuff) + 1):
        p = jnp.zeros((1, R), jnp.int32)
        for j in range(4):
            m = is_ff[j] & (ffx[j] == k)
            p = p + jnp.sum(jnp.where(m, q[j] + k, 0), axis=0,
                            keepdims=True)
        poss.append(jnp.where(nff >= k, p, jnp.int32(4 * W_stuff + 7)))

    z = [jnp.zeros((W_stuff, R), jnp.int32) for _ in range(4)]
    stuffed = [jnp.zeros((W_stuff, R), jnp.bool_) for _ in range(4)]
    for p in poss:
        for j in range(4):
            z[j] = z[j] + (q[j] >= p).astype(jnp.int32)
            stuffed[j] = stuffed[j] | (q[j] == p)

    # out[q'] = src[q' - z(q')] via an incremental byte-shift select chain
    shifted = list(planes)
    out = [jnp.where(z[j] == 0, shifted[j], jnp.uint32(0)) for j in range(4)]
    for k in range(1, min(z_cap, 4 * W_stuff) + 1):
        shifted = [_roll(shifted[3], 1), shifted[0], shifted[1], shifted[2]]
        out = [jnp.where(z[j] == k, shifted[j], out[j]) for j in range(4)]
    out = [jnp.where(stuffed[j], jnp.uint32(0), out[j]) for j in range(4)]

    # ---- restart marker + tail zeroing ----
    end = row_bytes + nff                 # (1, R)
    rst = rst_ref[0:1, :].astype(jnp.uint32)
    has = rst != 0
    mlen = jnp.where(has, 2, 0)
    for j in range(4):
        out[j] = jnp.where(has & (q[j] == end), jnp.uint32(0xFF), out[j])
        out[j] = jnp.where(has & (q[j] == end + 1), rst, out[j])
        out[j] = jnp.where(q[j] >= end + mlen, jnp.uint32(0), out[j])
    out_bytes = end + mlen
    needs_vals.append(jnp.max(out_bytes))

    words = ((out[0] << 24) | (out[1] << 16) | (out[2] << 8) | out[3])
    out_ref[:, :] = words[:W_out]
    ob_ref[:, :] = out_bytes

    # needs: one (8, 128)-tile accumulator block shared by every grid step
    # (TPU grid steps run sequentially on the core) — value i in lane i
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    nv = jnp.zeros((8, 128), jnp.int32)
    for i, v in enumerate(needs_vals):
        nv = jnp.where(lane == i, v, nv)

    @pl.when(pl.program_id(0) == 0)
    def _():
        needs_ref[:, :] = nv

    @pl.when(pl.program_id(0) != 0)
    def _():
        needs_ref[:, :] = jnp.maximum(needs_ref[:, :], nv)


def make_deep_stuff_kernel(N0: int, D: int, W_out: int, z_cap: int,
                           R_tile: int = 128, interpret: bool = False):
    """(words_t (N0, Rp) u32, blen_t (N0, Rp) i32, rst (1, Rp) i32) ->
    (out_t (W_out, Rp) u32, out_bytes (1, Rp) i32, needs (G, D+2) i32).

    W_out includes the stuffing slack; rows are the LANE axis (transposed
    relative to the XLA tree).  needs[:, :D] = per-level max merged bits,
    needs[:, D] = max stuffed zeros, needs[:, D+1] = max output bytes.
    """
    W_stuff = W_out
    kernel = functools.partial(
        _deep_stuff_kernel_body, N0=N0, D=D, W_out=W_out,
        W_stuff=W_stuff, z_cap=z_cap)

    def fn(words_t, blen_t, rst):
        Rall = words_t.shape[1]
        G = -(-Rall // R_tile)
        Rp = G * R_tile
        if Rp != Rall:
            words_t = jnp.pad(words_t, ((0, 0), (0, Rp - Rall)))
            blen_t = jnp.pad(blen_t, ((0, 0), (0, Rp - Rall)))
            rst = jnp.pad(rst, ((0, 0), (0, Rp - Rall)))
        out_t, ob, needs = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((N0, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N0, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((W_out, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((W_out, Rp), jnp.uint32),
                jax.ShapeDtypeStruct((1, Rp), jnp.int32),
                jax.ShapeDtypeStruct((8, 128), jnp.int32),
            ],
            interpret=interpret,
        )(words_t, blen_t, rst)
        return out_t[:, :Rall], ob[0, :Rall], needs[0, : D + 2]

    return fn


# --------------------------------------------------------------------------
# Orchestrator
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _cached_kernel(N0, D, W_out, z_cap, R_tile, interpret):
    return make_deep_stuff_kernel(N0, D, W_out, z_cap, R_tile, interpret)


def pack_stuff_fused(bits: jnp.ndarray, lens: jnp.ndarray,
                     rst_marker, l0: int, z_cap: int, w_out: int,
                     interpret: bool = False):
    """Full entropy back-end: token (bits, lens) rows -> stuffed byte rows.

    bits/lens: (R, T); rst_marker: (R,) uint8-ish static (0 = no marker).
    l0: density knob (tokens-per-1-word-group log2; bits-per-token ceiling
    is 32/2^l0).  w_out: output words per row INCLUDING stuffing slack.

    Returns (rows (R, w_out) u32, out_bytes (R,) i32, needs) where
    needs = (early (l0,), deep (D,), max_z (), max_out_bytes ()) as one
    (l0+D+2,) i32 vector: entries 0..l0-1 must be <= 32, l0+d-1 must be
    <= 32*2^d, needs[-2] <= z_cap, needs[-1] <= 4*w_out.
    """
    R, T = bits.shape
    T2 = pow2_ge(T)
    l0 = min(l0, T2.bit_length() - 1)
    N0 = T2 >> l0
    D = N0.bit_length() - 1

    # materialization fence: early_levels consumes bits/lens several times
    # (even/odd slices, blen sums); without the barrier XLA duplicates the
    # whole upstream tokenizer into each consumer fusion (~2-3x cost)
    bits, lens = jax.lax.optimization_barrier((bits, lens))
    words, blen, needs_e = early_levels(bits, lens, l0, T2)
    words_t = words.T
    blen_t = blen.T
    rst = jnp.asarray(rst_marker).astype(jnp.int32).reshape(1, R)
    fn = _cached_kernel(N0, D, w_out, z_cap, 128, interpret)
    out_t, out_bytes, needs_d = fn(words_t, blen_t, rst)
    needs = jnp.concatenate([needs_e, needs_d])
    return out_t.T, out_bytes, needs


def needs_ok(needs: np.ndarray, l0: int, z_cap: int, w_out: int) -> bool:
    """Host-side validation of a fused run's realized needs."""
    needs = np.asarray(needs)
    n_deep = len(needs) - l0 - 2
    for i in range(l0):
        if int(needs[i]) > 32:
            return False
    for d in range(1, n_deep + 1):
        if int(needs[l0 + d - 1]) > 32 * (1 << d):
            return False
    if int(needs[-2]) > z_cap:
        return False
    if int(needs[-1]) > 4 * w_out:
        return False
    return True
