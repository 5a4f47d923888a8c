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


def _r_tile(C: int) -> int:
    """Lane-tile width for the entropy kernels: 256 halves the per-tile
    grid overhead (measured 5.9 -> 4.3 ms on the 8K luma plane) and
    keeps the (C, R) working set within VMEM for C <= 512.
    GPUJPEG_TPU_RTILE overrides for experiments."""
    import os

    v = os.environ.get("GPUJPEG_TPU_RTILE")
    if v:
        return int(v)
    return 256 if C <= 512 else 128


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
    rst = rst_ref[0:1, :].astype(jnp.uint32)
    out, out_bytes, needs_vals = _tree_pad_stuff(
        x, blen, rst, N0=N0, D=D, W_stuff=W_stuff, z_cap=z_cap,
        first_level_move=True)   # pre-merged pairs may be exactly 32 bits
    out_ref[:, :] = out[:W_out]
    ob_ref[:, :] = out_bytes
    _write_needs(needs_ref, needs_vals)


def _tree_pad_stuff(x, blen, rst, *, N0: int, D: int, W_stuff: int,
                    z_cap: int, compact_after=(), stop_after=None,
                    first_level_move: bool = False):
    """Shared VMEM back-end: in-place span-doubling merge tree over (N0, R)
    left-aligned word buffers, F.1.2.3 padding, byte stuffing, RST append.

    compact_after: levels after which buffer capacity is HALVED by taking
    the lower half of every span (content must fit — the recorded level
    need <= 16 * span_words guarantees it; the host's sticky-caps protocol
    enforces that via mega_needs_ok).  Each compaction halves the array
    and therefore the cost of every later level — the density-adaptive
    counterpart of the XLA tree's l0 knob.

    first_level_move: True when level-1 inputs may be exactly 32 bits
    (pre-merged pairs) so the even buffer can be full and the odd words
    need a 1-word move; single tokens (the megakernel) are < 32 bits and
    skip the level-1 move statically.

    Returns (out (W_stuff, R) u32, out_bytes (1, R) i32, needs_vals list
    of (1, R) per-LANE maxima rows: per-level max bits (D), max stuffed
    zeros, max output bytes — the caller cross-lane-reduces them once)."""
    R = x.shape[1]

    sub = jax.lax.broadcasted_iota(jnp.int32, (N0, R), 0)
    needs_vals = []
    N = N0
    lg = 0                                # log2 of current buffer span

    # nb0 = scalar max merged-pair bits after level 1: the ONE cross-lane
    # reduce on the critical path.  Levels d >= 2 gate their move loops on
    # the rigorous bound needs[d-1] <= nb0 * 2^(d-2) (a 2^(d-1)-token
    # group is 2^(d-2) pairs) — per-level exact reduces formed a serial
    # reduce -> gate -> compute chain that stalled the VPU every level.
    nb0 = None

    # ---- deep merge levels: span doubles each level, buffers stay put ----
    for d in range(1, D + 1):
        half = 1 << lg
        span = half << 1

        if (d == 1 and 1 in compact_after and not first_level_move
                and N > 8):
            # fused pair-merge + compaction: when level 1 compacts, every
            # merged pair fits one word (needs[0] <= 32, enforced by
            # mega_needs_ok), so the merge is a sub-word shift-or on the
            # even/odd token planes — ~1/3 the ops of the in-place
            # span-2 merge + reshape compaction on the double-size array.
            # Single tokens are < 32 bits, so le < 32 and the shift is
            # well-defined (first_level_move inputs may be exactly 32 and
            # keep the general path).
            xe = x.reshape(N // 2, 2, R)[:, 0, :]
            xo = x.reshape(N // 2, 2, R)[:, 1, :]
            le = blen.reshape(N // 2, 2, R)[:, 0, :]
            lo_ = blen.reshape(N // 2, 2, R)[:, 1, :]
            blen = le + lo_
            needs_vals.append(jnp.max(blen, axis=0, keepdims=True))
            nb0 = jnp.max(blen)
            x = xe | (xo >> le.astype(jnp.uint32))
            N >>= 1
            sub = jax.lax.broadcasted_iota(jnp.int32, (N, R), 0)
            continue

        second = (sub & half) != 0        # static: odd half of each span

        la = jnp.where(second, _roll(blen, half), blen)
        lb = jnp.where(second, blen, _roll(blen, -half))
        blen = la + lb
        # per-LANE level maxima (sublane-only reduce; cheap, off-path)
        needs_vals.append(jnp.max(blen, axis=0, keepdims=True))
        if d == 1:
            nb0 = jnp.max(blen)

        b = jnp.where(second, x, jnp.uint32(0))
        # whole-word move: b's words go from rel slots [half, span) to
        # [w, w+half) with w = la//32.  Decomposed as one STATIC roll by
        # -half (slots [0, half)) followed by a log-step move UP by w;
        # steps whose bit exceeds the tile-wide bound are skipped at
        # runtime (lax.cond on the scalar) — on typical content w <= 2,
        # so only 1-2 of the steps execute.
        keep = (sub & (span - 1)) < half              # static
        b = jnp.where(keep, _roll(b, -half), jnp.uint32(0))
        w = la >> 5
        if d == 1:
            steps = [1] if first_level_move else []
        else:
            steps = [1 << j for j in range(lg + 1)]
        w_bound = None if d == 1 else (nb0 << (d - 2)) >> 5
        for step in steps:

            def _move(b=b, step=step, span=span, w=w):
                inside = (sub & (span - 1)) >= step   # static per (j, d)
                moved = jnp.where(inside, _roll(b, step), jnp.uint32(0))
                return jnp.where((w & step) != 0, moved, b)

            import os as _os
            if w_bound is None or _os.environ.get("GPUJPEG_TPU_NOGATE"):
                b = _move()
            else:
                b = jax.lax.cond(w_bound >= step, _move, lambda b=b: b)
        # sub-word shift right by r = la & 31 with carry from the previous
        # word (zero below w, so no dynamic masking is needed)
        r = (la & 31).astype(jnp.uint32)
        prev = jnp.where((sub & (span - 1)) == 0, jnp.uint32(0),
                         _roll(b, 1))
        carry = jnp.where(r == 0, jnp.uint32(0),
                          prev << ((jnp.uint32(32) - r) & 31))
        b = (b >> r) | carry
        x = jnp.where(second, jnp.uint32(0), x) | b
        lg += 1

        if d in compact_after and N > 8:
            # drop the (all-zero when within capacity) upper half of every
            # span; blen is span-replicated so the slice stays consistent
            nbuf = N >> lg
            x = x.reshape(nbuf, 1 << lg, R)[:, : 1 << (lg - 1), :] \
                .reshape(N >> 1, R)
            blen = blen.reshape(nbuf, 1 << lg, R)[:, : 1 << (lg - 1), :] \
                .reshape(N >> 1, R)
            N >>= 1
            lg -= 1
            sub = jax.lax.broadcasted_iota(jnp.int32, (N, R), 0)

    row_bits = blen[0:1, :]               # replicated; any sublane works
    if stop_after == "tree":
        return x, row_bits, needs_vals

    # ---- trim to the stuffing working set ----
    if W_stuff <= N:
        x = x[:W_stuff]
    else:
        x = jnp.concatenate(
            [x, jnp.zeros((W_stuff - N, R), jnp.uint32)], axis=0)
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

    # ---- byte stuffing, SWAR on packed words ----
    # exact per-byte zero test: 0x80 per zero byte, borrow-free (the
    # classic (v-K1)&~v&K80 cascades false positives past a zero byte)
    K1 = jnp.uint32(0x01010101)
    K7F = jnp.uint32(0x7F7F7F7F)

    def zero_bytes_msb(v):
        return ~(((v & K7F) + K7F) | v | K7F)

    y = ~x
    ff_msb = zero_bytes_msb(y)            # high bit set per 0xFF byte
    ind = (ff_msb >> 7) & K1              # LSB set per 0xFF byte
    # per-byte validity: byte j of word s is real iff 4*s + j < row_bytes
    nb = jnp.clip(row_bytes - 4 * ssub, 0, 4)
    vm = jnp.where(nb == 0, jnp.uint32(0),
                   (K1 << ((8 * (4 - nb)) & 31).astype(jnp.uint32)))
    ind = ind & vm
    word_ff = ((ind * K1) >> 24).astype(jnp.int32)   # FFs in this word
    # exclusive cumsum of per-word FF counts down sublanes (Hillis-Steele)
    cum = word_ff
    s = 1
    while s < W_stuff:
        cum = cum + jnp.where(ssub >= s, _roll(cum, s), 0)
        s *= 2
    cum_excl = cum - word_ff
    nff = cum[W_stuff - 1:W_stuff, :]     # (1, R) total FFs per row
    needs_vals.append(nff)
    nff_max = jnp.max(nff)

    # c_packed: per-byte exclusive FF count (clamped; invalid bytes 0xFF)
    # clamp at 254 (255 marks invalid): shifts s are exact for s <= 250,
    # which bounds the fused path's z_cap (the encoder falls back to the
    # XLA tree beyond that — see grown_fused_caps)
    pref = (ind >> 8) + (ind >> 16) + (ind >> 24)    # in-word prefix, <= 3
    cb = jnp.minimum(cum_excl, 251).astype(jnp.uint32)
    c_packed = cb * K1 + pref
    c_packed = c_packed | ((vm ^ K1) * jnp.uint32(0xFF))

    # out byte q' = src byte q'-s where c[q'-s] == s: incremental packed
    # byte-shift chain, runtime-trip-limited by the tile's max FF count
    def match_or(out, sp, sc, s):
        d_ = sc ^ (jnp.uint32(s) * K1)
        zb = zero_bytes_msb(d_)
        m = (zb >> 7) * jnp.uint32(0xFF)
        return out | (sp & m)

    out = match_or(jnp.zeros_like(x), x, c_packed, 0)
    sp, sc = x, c_packed
    for s in range(1, min(z_cap, 4 * W_stuff) + 1):
        def _step(out=out, sp=sp, sc=sc, s=s):
            top = jnp.where(ssub == 0, jnp.uint32(0), _roll(sp, 1))
            topc = jnp.where(ssub == 0, jnp.uint32(0xFFFFFFFF),
                             _roll(sc, 1))
            sp2 = (sp >> 8) | (top << 24)
            sc2 = (sc >> 8) | (topc << 24)
            return match_or(out, sp2, sc2, s), sp2, sc2

        import os as _os
        if _os.environ.get("GPUJPEG_TPU_NOSTUFFGATE"):
            out, sp, sc = _step()
        else:
            out, sp, sc = jax.lax.cond(
                nff_max >= s, _step,
                lambda out=out, sp=sp, sc=sc: (out, sp, sc))

    # ---- restart marker (bytes beyond end are already zero) ----
    end = row_bytes + nff                 # (1, R)
    has = rst != 0
    mlen = jnp.where(has, 2, 0)
    wi_e = end >> 2
    bo_e = (end & 3).astype(jnp.uint32)
    mk1 = (jnp.uint32(0xFF) << ((24 - 8 * bo_e) & 31)) \
        | jnp.where(bo_e < 3, rst << ((16 - 8 * bo_e) & 31), jnp.uint32(0))
    mk2 = jnp.where(bo_e == 3, rst << 24, jnp.uint32(0))
    out = out | jnp.where(has & (ssub == wi_e), mk1, jnp.uint32(0))
    out = out | jnp.where(has & (ssub == wi_e + 1), mk2, jnp.uint32(0))
    out_bytes = end + mlen
    needs_vals.append(out_bytes)
    return out, out_bytes, needs_vals


def _write_needs(needs_ref, needs_vals):
    """needs: one (16, 128) accumulator block shared by every grid step
    (TPU grid steps run sequentially on the core) — row i = need i,
    value broadcast over lanes.  needs_vals: list of (1, R) per-lane
    maxima rows (or scalars); ONE cross-lane reduce covers all of them,
    instead of a serial scalar reduce per tree level."""
    stacked = jnp.concatenate([v.astype(jnp.int32) for v in needs_vals],
                              axis=0)
    red = jnp.max(stacked, axis=1, keepdims=True)       # (n, 1)
    n = red.shape[0]
    assert n <= 16, "needs vector exceeds the (16, 128) output block"
    if n < 16:
        red = jnp.concatenate(
            [red, jnp.zeros((16 - n, 1), jnp.int32)], axis=0)
    nv = jnp.broadcast_to(red, (16, 128))

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
                pl.BlockSpec((16, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((W_out, Rp), jnp.uint32),
                jax.ShapeDtypeStruct((1, Rp), jnp.int32),
                jax.ShapeDtypeStruct((16, 128), jnp.int32),
            ],
            interpret=interpret,
        )(words_t, blen_t, rst)
        return out_t[:, :Rall], ob[0, :Rall], needs[: D + 2, 0]

    return fn


# --------------------------------------------------------------------------
# Entropy megakernel: tokenize + merge tree + pad + stuff + RST in one
# VMEM-resident kernel (VERDICT r1 item 1's endgame).  The XLA tokenizer
# spreads ~14 fusions over HBM-sized intermediates (~18 ms at 8K); here the
# (C, R_tile) coefficient tile is tokenized entirely in VMEM and handed
# straight to the merge tree.  A side effect kills the capacity protocol's
# hardest failure mode: with N0 = C (one leaf per coefficient slot) the
# tree capacity IS the worst case, so token-density overflows cannot occur
# (only w_out/z_cap remain, still covered by `needs`).
#
# Layout: sublanes = the C = blocks_per_seg * 64 coefficient slots of a
# segment row (zig-zag within block, blocks in stream order), lanes =
# segment rows.  All scans (zero-run, has-nonzero-after) are Hillis-Steele
# sublane rolls masked to 64-slot block groups; the Huffman code is the
# tuned computable family (tables.affine_ac_runtime) evaluated with
# 16-step select chains whose candidates select luma/chroma constants per
# LANE (luma_t mask), so mixed-component tiles cost nothing extra.
# Matches gpujpeg_huffman_gpu_encoder.cu:299-502 (encode+serialize) in one
# pass.
# --------------------------------------------------------------------------

def _bitswap_sub(w, i: int, j: int):
    """Exchange sublane index bits i > j (a fixed involutive permutation
    of the sublane dim): 1 iota + 2 rolls + selects, no captured arrays."""
    d = (1 << i) - (1 << j)
    n = w.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    bi = (sub >> i) & 1
    bj = (sub >> j) & 1
    up = pltpu.roll(w, d % n, axis=0)        # dest p <- src p-d
    dn = pltpu.roll(w, (n - d) % n, axis=0)  # dest p <- src p+d
    return jnp.where((bi == 1) & (bj == 0), up,
                     jnp.where((bi == 0) & (bj == 1), dn, w))


def _entropy_kernel_body(c_ref, *refs, C: int, B: int, D: int,
                         W_out: int, W_stuff: int, z_cap: int, consts,
                         compact_after=(), dct_bias=None,
                         dct_nmat: int = 0, stop_after=None,
                         Rall: int = 0, luma_const=None,
                         xq_in: bool = False, il=None, dct_ncyc: int = 1):
    def _early_out(val, out_ref, ob_ref, needs_ref):
        # profiling stub: consume `val` with a real reduction so nothing
        # upstream is dead-code-eliminated, then return
        m = jnp.max(val.astype(jnp.int32), axis=0, keepdims=True)
        out_ref[:, :] = jnp.broadcast_to(m.astype(jnp.uint32),
                                         out_ref.shape)
        ob_ref[:, :] = m
        _write_needs(needs_ref, [m] * min(D + 2, 16))
    mats = refs[:dct_nmat]
    valid_ref, luma_ref, rst_ref, out_ref, ob_ref, needs_ref = \
        refs[dct_nmat:]
    if dct_nmat:
        # fused forward DCT: PACKED u32 block-diagonal patches in (4
        # samples per word — the host-side transpose then moves 4x fewer
        # elements), quantized zig-zag coefficients produced ON THE MXU
        # inside the kernel — the (C, R) int16 coefficient plane never
        # exists in HBM (its materialize + layout-convert + re-read chain
        # cost ~10 ms at 8K).  Unpack: sublane-repeat x4 + per-sublane
        # byte shift (sample 4g+k = byte k of word g).
        #
        # The matrices arrive as (P, P) two-block diagonals (P = 128 =
        # the MXU tile, see _dct_consts) applied per 128-sublane slice:
        # same math as one dense (C, C) block-diagonal matmul but 8x
        # fewer MXU passes at full tile utilization.
        if xq_in:
            # xq layout: the (R_tile, 128) block is the XLA-cheap
            # 16-word-contiguous relayout (sublanes = segments, lanes =
            # the segment's 128 packed words in (row, block, half)
            # order).  Transpose in VMEM (~0.04 ms/comp at 8K vs the
            # 0.68 ms/comp XLA xbd transpose) and swap the (r, b) index
            # bit fields to recover the xbd (block, row, half) sublane
            # order the DCT matrices expect.
            w = c_ref[:, :].T                  # (128, R) u32
            for bi_, bj_ in ((6, 3), (5, 2), (4, 1)):
                w = _bitswap_sub(w, bi_, bj_)
        else:
            w = c_ref[:, :]                    # (C/4, R) u32
        w4 = jnp.repeat(w, 4, axis=0)          # (C, R), element-repeat
        ksub = jax.lax.broadcasted_iota(jnp.int32, w4.shape, 0) & 3
        xi = ((w4 >> (ksub * 8).astype(jnp.uint32))
              & jnp.uint32(0xFF)).astype(jnp.int32)
        P = mats[0].shape[0]
        # matrices cycle per 128-sublane slice: 1 (pair) for uniform
        # single-component calls; lcm(bpm, 2)/2 when interleaved block
        # classes alternate within the slice pattern
        ncyc = dct_ncyc
        f32 = dct_nmat == ncyc       # else [hi0..hi_{n-1}, lo0..lo_{n-1}]

        def dct_slices(xb, dot1):
            ys = [dot1(mats, (p // P) % ncyc, xb[p:p + P])
                  for p in range(0, C, P)]
            return jnp.concatenate(ys, axis=0) if len(ys) > 1 else ys[0]

        if f32:                # exact-f32 path (CPU/interpret parity)
            y = dct_slices(
                xi.astype(jnp.float32),
                lambda m, k, xs: jnp.dot(
                    m[k][:, :], xs, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
        else:
            y = dct_slices(
                xi.astype(jnp.float32).astype(jnp.bfloat16),
                lambda m, k, xs: (
                    jnp.dot(m[k][:, :], xs,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(m[ncyc + k][:, :], xs,
                              preferred_element_type=jnp.float32)))
        # bias (the folded -128 level shift) is per-COEFFICIENT-SLOT:
        # rebuild it from python scalars via a select chain on zz
        # (array closures are not allowed in pallas kernels).  dct_bias
        # has one entry per slot over the whole segment row period when
        # interleaved (64 * bpm entries), else 64.
        zz64 = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) \
            % len(dct_bias)
        bias = jnp.zeros(y.shape, jnp.float32)
        for z in range(len(dct_bias)):
            bz = float(dct_bias[z])
            if bz != 0.0:
                bias = jnp.where(zz64 == z, jnp.float32(bz), bias)
        v = jnp.round(y + bias).astype(jnp.int32)
    else:
        v = c_ref[:, :].astype(jnp.int32)      # (C, R) coefficients
    if stop_after == "dct":
        return _early_out(v, out_ref, ob_ref, needs_ref)
    R = v.shape[1]
    NB = C // 64                               # blocks per segment row
    sub = jax.lax.broadcasted_iota(jnp.int32, (C, R), 0)
    zz = sub & 63                              # position within block
    is_dc = zz == 0
    prec = jax.lax.Precision.HIGHEST

    # one-hot extraction matrices (B, C): strided value slices don't
    # lower in Mosaic, but an exact-f32 matmul pulls one slot per block
    # onto the (NB, R) subgrid where per-block work costs 1/64th, and
    # jnp.repeat (a free sublane broadcast) puts results back
    bi = jax.lax.broadcasted_iota(jnp.int32, (NB, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (NB, C), 1)

    def extract(arr_f32, slot):
        pick = (ci == bi * 64 + slot).astype(jnp.float32)
        return jnp.round(jnp.dot(pick, arr_f32,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)).astype(jnp.int32)

    # DC differential (F.1.1.5.1): predictor = previous block's DC in
    # the same segment row; restart reset is automatic at row start.
    # Full-shape roll: one sublane roll (0.09 us/tile) beats the one-hot
    # matmul extraction (0.29 us/tile) — elementwise selects are free on
    # this VPU, data movement is not.  Interleaved rows predict from the
    # previous block of the SAME component = bpm blocks back (T.81
    # F.1.1.5.1 per-component predictors).
    dc_span = 64 * (il[0] if il is not None else 1)
    pred = jnp.where(sub >= dc_span, _roll(v, dc_span), 0)
    v = jnp.where(is_dc, v - pred, v)

    nz = v != 0
    av = jnp.abs(v)
    # bit-size category via the f32 exponent (exact for |v| < 2^24)
    size = (pltpu.bitcast(av.astype(jnp.float32), jnp.int32) >> 23) - 126
    size = jnp.maximum(size, 0)
    vb = jnp.where(v < 0, v - 1, v) & ((1 << size) - 1)

    # zero-run before each slot: cummax of nonzero positions per block
    marker = jnp.where(nz | is_dc, zz, -1)
    m = marker
    for s in (1, 2, 4, 8, 16, 32):
        m = jnp.where(zz >= s, jnp.maximum(m, _roll(m, s)), m)
    lb = jnp.where(is_dc, 0, _roll(m, 1))      # last nonzero before slot
    run = zz - lb - 1
    zri = zz - lb                              # zeros up to & incl. slot
    # any-nonzero-after: the block's last marked slot (= cummax at 63,
    # extracted + broadcast) beats the old 6-step backward roll scan;
    # slot 0 is marked for every block but never exceeds zz >= 1, and
    # has_after is only consumed at AC slots
    mlast = extract(m.astype(jnp.float32), 63)  # (NB, R)
    has_after = jnp.repeat(mlast, 64, axis=0) > zz

    is_code = nz & ~is_dc
    is_zrl = (~nz) & (~is_dc) & has_after & ((zri & 15) == 0)
    is_eob = (~nz) & (zz == 63)

    run16 = jnp.where(is_code, run & 15, jnp.where(is_zrl, 15, 0))
    size16 = jnp.where(is_code, size, 0)
    if stop_after == "runs":
        return _early_out(run16 + size16 + vb, out_ref, ob_ref, needs_ref)

    # table class per chain site; the mega path calls the kernel once per
    # component, so luma_const statically picks one constant set and every
    # chain step drops its class mux (~1/3 of the chain's vector ops).
    # Interleaved calls derive STATIC per-sublane class masks from the
    # MCU slot pattern (one extra select per chain step, not per lane).
    if il is not None:
        bpm_il, dc_pat, ac_pat, _q_pat = il

        def pat_mask(pat, idx_arr):
            if all(pat):
                return True
            if not any(pat):
                return False
            m = jnp.zeros_like(idx_arr) != 0
            for j in range(bpm_il):
                if pat[j]:
                    m = m | (idx_arr % bpm_il == j)
            return m

        lum_ac = pat_mask(ac_pat, sub // 64)
        lum_dc = pat_mask(
            dc_pat, jax.lax.broadcasted_iota(jnp.int32, (NB, R), 0))
    else:
        lum_ac = lum_dc = (bool(luma_const) if luma_const is not None
                           else luma_ref[0:1, :] != 0)

    def make_csel(lum):
        def csel(cl, cc):
            if isinstance(lum, bool):
                return jnp.int32(cl if lum else cc)
            return jnp.where(lum, jnp.int32(cl), jnp.int32(cc))

        return csel

    csel = make_csel(lum_ac)
    csel_dc = make_csel(lum_dc)

    def chain(idx, tl, tc, n, lo: int = 0, sel=None):
        # steps below lo are either impossible values of idx or map to
        # entry 0 (the zeros init) — statically skipped
        sel = sel or csel
        e = jnp.zeros_like(idx)
        for s in range(lo, n):
            e = jnp.where(idx == s, sel(tl[s], tc[s]), e)
        return e

    def chain_bin16(idx, tl, tc):
        # binary-mux tree over a 16-entry table: 15 selects + 4 bit masks
        # (~23 vector ops) vs the 16-step equality chain's ~32.  idx
        # values >= 16 ALIAS to idx & 15 — callers must mask such lanes
        # downstream (both call sites do).
        vals = [csel(tl[s] if s < len(tl) else 0,
                     tc[s] if s < len(tc) else 0) for s in range(16)]
        bits = [(idx & (1 << k)) != 0 for k in range(4)]
        lvl = vals
        for k in range(4):
            lvl = [jnp.where(bits[k], lvl[2 * i + 1], lvl[2 * i])
                   for i in range(len(lvl) // 2)]
        return lvl[0]

    (t0L, rtL, alL, eobL, zrlL, dcL), (t0C, rtC, alC, eobC, zrlC, dcC) = \
        consts
    # affine AC entry (see tables.affine_ac_runtime / ops.tokens).
    # Chain bounds: AC size category <= 10 (8-bit baseline, |coef| <=
    # 1023); run-0 entries come from t0e, so rte skips s=0.  The al
    # lookup is packed as a full entry P[l] = (l << 16) + A[l] so the
    # general-zone entry is one add; el >= 16 lanes read an aliased
    # garbage P (chain_bin16) that the el >= 16 select masks.
    t0e = chain(size16, t0L, t0C, 11, lo=1)
    rte = chain_bin16(run16, rtL, rtC)
    rl = (rte >> 20) & 0x1F
    bB = rte & 0xFFFFF
    el = rl + size16
    pL = tuple((min(l, 16) << 16) + int(alL[l]) if 2 <= l < 16 else 0
               for l in range(16))
    pC = tuple((min(l, 16) << 16) + int(alC[l]) if 2 <= l < 16 else 0
               for l in range(16))
    pe = chain_bin16(el, pL, pC)
    entry = jnp.where(el >= 16, (16 << 16) + bB + size16, pe + run16)
    entry = jnp.where(run16 == 0, t0e, entry)
    entry = jnp.where(is_zrl, csel(zrlL, zrlC), entry)
    entry = jnp.where(is_eob, csel(eobL, eobC), entry)
    # DC entries live only at zz == 0: run the 12-step chain on the
    # extracted (NB, R) subgrid (1/64th the vector work) and broadcast
    size_dc = extract(jnp.minimum(size, 11).astype(jnp.float32), 0)
    dce = jnp.repeat(chain(size_dc, dcL, dcC, 12, sel=csel_dc), 64,
                     axis=0)
    entry = jnp.where(is_dc, dce, entry)

    clen = entry >> 16
    code = entry & 0xFFFF
    bits = ((code << size) | vb).astype(jnp.uint32)
    lens = jnp.where(is_dc | is_code | is_zrl | is_eob, clen + size, 0)

    # static per-block valid mask (B, R), broadcast over 64 coef slots
    # (element repeat = sublane broadcast, vs the old B-step select chain)
    vmask = jnp.repeat(valid_ref[:, :], 64, axis=0)
    if Rall:
        # ragged lane edge: the grid covers ceil(Rall/R) tiles, so the
        # last tile's lanes past Rall read unspecified values — zero
        # their token lengths and restart markers so they behave exactly
        # like valid=0 pad rows (0 output bytes, no needs contribution)
        lane = (jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
                + pl.program_id(0) * R)
        lane_ok = lane < Rall
        vmask = vmask * lane_ok.astype(jnp.int32)
    lens = lens * vmask

    x = jnp.where(lens > 0,
                  bits << (32 - jnp.clip(lens, 1, 31)).astype(jnp.uint32),
                  jnp.uint32(0))
    if stop_after == "token":
        return _early_out(x ^ lens.astype(jnp.uint32), out_ref, ob_ref,
                          needs_ref)
    rst = rst_ref[0:1, :].astype(jnp.uint32)
    if Rall:
        rst = jnp.where(lane_ok, rst, jnp.uint32(0))
    out, out_bytes, needs_vals = _tree_pad_stuff(
        x, lens, rst, N0=C, D=D, W_stuff=W_stuff, z_cap=z_cap,
        compact_after=compact_after, stop_after=stop_after)
    if stop_after == "tree":
        return _early_out(out, out_ref, ob_ref, needs_ref)
    out_ref[:, :] = out[:W_out]
    ob_ref[:, :] = out_bytes
    _write_needs(needs_ref, needs_vals)


def make_entropy_kernel(C: int, W_out: int, z_cap: int, B: int, consts,
                        R_tile: int = 128, interpret: bool = False,
                        compact_after=(), dct=None, stop_after=None,
                        luma_const=None, xq: bool = False, il=None):
    """(coefs_t (C, Rp) i16 — or u8 sample patches when dct is given,
    valid_t (B, Rp) i32, luma_t (1, Rp) i32, rst (1, Rp) i32) ->
    (out_t (W_out, Rp) u32, out_bytes (1, Rp) i32, needs (D+2,) i32).
    C must be a power of two (pad with valid=0).

    xq=True (requires dct and C == 512): the sample input arrives as
    (Rall, 128) — the 16-word-contiguous relayout with segments on
    SUBLANES — and is transposed + sublane-permuted inside the kernel
    (see _entropy_kernel_body xq_in)."""
    assert C & (C - 1) == 0 and C >= 64
    assert not xq or (dct is not None and C == 512)
    assert il is None or (dct is not None and not xq)
    D = C.bit_length() - 1
    mats = ()
    dct_bias = None
    dct_ncyc = 1
    if dct is not None:
        bd_hi, bd_lo, bias = dct
        hi_list = (tuple(bd_hi) if isinstance(bd_hi, (list, tuple))
                   else (bd_hi,))
        lo_list = (() if bd_lo is None
                   else (tuple(bd_lo) if isinstance(bd_lo, (list, tuple))
                         else (bd_lo,)))
        mats = hi_list + lo_list
        dct_ncyc = len(hi_list)
        period = 64 * (il[0] if il is not None else 1)
        dct_bias = tuple(float(b) for b in np.asarray(bias)[:period])
    kernel = functools.partial(
        _entropy_kernel_body, C=C, B=B, D=D, W_out=W_out, W_stuff=W_out,
        z_cap=z_cap, consts=consts, compact_after=tuple(compact_after),
        dct_bias=dct_bias, dct_nmat=len(mats), stop_after=stop_after,
        luma_const=luma_const, xq_in=xq, il=il, dct_ncyc=dct_ncyc)

    C_in = C // 4 if dct is not None else C    # packed u32 when fused DCT

    def fn(coefs_t, valid_t, luma_t, rst):
        Rall = coefs_t.shape[0] if xq else coefs_t.shape[1]
        G = -(-Rall // R_tile)
        Rp = G * R_tile
        # ragged lane edge handled IN-KERNEL (lane >= Rall masked like
        # valid=0 rows) — an XLA pad here cost ~2.3 ms at 8K
        kern = (kernel if Rp == Rall
                else functools.partial(kernel, Rall=Rall))
        mat_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for m in mats]
        in0_spec = (pl.BlockSpec((R_tile, C_in), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM) if xq
                    else pl.BlockSpec((C_in, R_tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_t, ob, needs = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[
                in0_spec,
                *mat_specs,
                pl.BlockSpec((B, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((W_out, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((W_out, Rall), jnp.uint32),
                jax.ShapeDtypeStruct((1, Rall), jnp.int32),
                jax.ShapeDtypeStruct((16, 128), jnp.int32),
            ],
            interpret=interpret,
        )(coefs_t, *[jnp.asarray(m) for m in mats],
          valid_t, luma_t, rst)
        return out_t, ob[0], needs[: D + 2, 0]

    return fn


@functools.lru_cache(maxsize=64)
def _cached_entropy_kernel(C, W_out, z_cap, B, consts, R_tile, interpret,
                           compact_after=()):
    return make_entropy_kernel(C, W_out, z_cap, B, consts, R_tile,
                               interpret, compact_after)


@functools.lru_cache(maxsize=64)
def _dct_consts(dct_key, C: int):
    """Per-slice block-diagonal DCT matrices for the in-kernel forward
    DCT.

    dct_key = (quality, luma, rst, use_bf16); returns (m_hi, m_lo, bias)
    with matrix shapes (P, P), P = min(C, 128): a two-block diagonal
    kron(eye(P/64), Mq.T) applied to every P-sublane slice of the sample
    patch.  P = 128 matches the MXU tile, so the slice loop does 8x
    fewer FLOPs than the old dense (C, C) matmul at full utilization.
    Bit-identical math to dct.fdct_quantize_bd / fdct_quantize_t (pad
    blocks beyond rst*64 see zero samples, so their product is zero
    like the old zero-padded dense diagonal)."""
    from ..utils import tables as _t

    quality, luma, rst, use_bf16 = dct_key
    qtab = _t.quant_table_zz(luma, quality)
    Mq, bias = _t.fdct_fused_matrix(np.asarray(qtab))
    C0 = rst * 64
    bias_t = np.zeros(C, np.float32)
    bias_t[:C0] = np.tile(np.asarray(bias, np.float32), rst)
    P = min(C, 128)
    nb = P // 64
    if use_bf16:
        hi = np.asarray(Mq.astype(np.float32).astype(jnp.bfloat16))
        lo = (Mq.astype(np.float32) - hi.astype(np.float32))
        m_hi = np.kron(np.eye(nb, dtype=np.float32),
                       hi.T.astype(np.float32))
        m_lo = np.kron(np.eye(nb, dtype=np.float32),
                       lo.T.astype(np.float32))
        return (m_hi.astype(jnp.bfloat16), m_lo.astype(jnp.bfloat16),
                bias_t)
    m = np.kron(np.eye(nb, dtype=np.float64),
                np.asarray(Mq).T).astype(np.float32)
    return (m, None, bias_t)


@functools.lru_cache(maxsize=16)
def _dct_consts_il(quality: int, q_pat: tuple, use_bf16: bool):
    """Per-slice-cycle DCT matrices for INTERLEAVED segment rows.

    q_pat: quant-table class per MCU block slot (len = blocks_per_mcu).
    Slice k of 128 sublanes covers blocks (2k, 2k+1) mod bpm, whose
    classes may differ — each cycle position gets a block-diagonal of
    the two classes' fused matrices (same math as _dct_consts, classes
    mixed).  Returns (hi_list, lo_list|None, bias_per) with bias_per of
    length 64*bpm (one folded level-shift entry per slot in the MCU)."""
    from ..utils import tables as _t

    bpm = len(q_pat)
    Ms, biases = [], []
    for ti in (0, 1):
        qtab = _t.quant_table_zz(ti == 0, quality)
        Mq, b = _t.fdct_fused_matrix(np.asarray(qtab))
        Ms.append(np.asarray(Mq))
        biases.append(np.asarray(b, np.float32))
    ncyc = int(np.lcm(bpm, 2) // 2)

    def bdiag(a, b):
        z = np.zeros((128, 128), np.float32)
        z[:64, :64] = a
        z[64:, 64:] = b
        return z

    his, los = [], []
    for k in range(ncyc):
        tis = [int(q_pat[(2 * k) % bpm]), int(q_pat[(2 * k + 1) % bpm])]
        if use_bf16:
            hi_b, lo_b = [], []
            for ti in tis:
                M = Ms[ti].astype(np.float32)
                hi = np.asarray(M.astype(jnp.bfloat16)).astype(np.float32)
                hi_b.append(hi.T)
                lo_b.append((M - hi).T)
            his.append(bdiag(*hi_b).astype(jnp.bfloat16))
            los.append(bdiag(*lo_b).astype(jnp.bfloat16))
        else:
            his.append(bdiag(*(np.asarray(Ms[ti]).T.astype(np.float32)
                               for ti in tis)))
    bias_per = np.concatenate([biases[int(q_pat[s])] for s in range(bpm)])
    return (tuple(his), tuple(los) if use_bf16 else None,
            bias_per.astype(np.float32))


@functools.lru_cache(maxsize=16)
def _cached_entropy_kernel_il(C, W_out, z_cap, B, consts, R_tile,
                              interpret, compact_after, quality,
                              q_pat, dc_pat, ac_pat, use_bf16,
                              stop_after=None):
    return make_entropy_kernel(
        C, W_out, z_cap, B, consts, R_tile, interpret, compact_after,
        dct=_dct_consts_il(quality, q_pat, use_bf16),
        stop_after=stop_after, il=(len(q_pat), dc_pat, ac_pat, q_pat))


def entropy_fused_u8_il(xbd, valid_t, rst_marker, z_cap: int, w_out: int,
                        consts, quality: int, q_pat, dc_pat, ac_pat,
                        use_bf16: bool, interpret: bool = False,
                        compact_after=(), stop_after=None):
    """entropy_fused_u8 for INTERLEAVED scans: xbd is the (C0/4, R)
    packed sample feed in MCU-interleaved block order (C0 = rst * bpm *
    64); per-slot table/quant classes follow the MCU patterns.  One call
    covers the whole scan (the non-interleaved path calls per
    component)."""
    C4, R = xbd.shape
    C0 = C4 * 4
    C = pow2_ge(max(C0, 64))
    B = C // 64
    if C != C0:
        xbd = jnp.pad(xbd, ((0, (C - C0) // 4), (0, 0)))
    if B != valid_t.shape[0]:
        valid_t = jnp.pad(valid_t, ((0, B - valid_t.shape[0]), (0, 0)))
    rst = jnp.asarray(rst_marker).astype(jnp.int32).reshape(1, R)
    fn = _cached_entropy_kernel_il(
        C, w_out, z_cap, B, consts, _r_tile(C), interpret,
        tuple(compact_after), quality, tuple(q_pat), tuple(dc_pat),
        tuple(ac_pat), use_bf16, stop_after)
    luma_t = jnp.ones((1, R), jnp.int32)      # unused in il mode
    out_t, ob, needs = fn(xbd, valid_t, luma_t, rst)
    return out_t.T, ob, needs


@functools.lru_cache(maxsize=64)
def _cached_entropy_kernel_u8(C, W_out, z_cap, B, consts, R_tile,
                              interpret, compact_after, dct_key,
                              xq=False, stop_after=None):
    # dct_key[1] is the component's table class: the kernel call is
    # single-component, so specialize the chains on it statically
    return make_entropy_kernel(C, W_out, z_cap, B, consts, R_tile,
                               interpret, compact_after,
                               dct=_dct_consts(dct_key, C),
                               luma_const=bool(dct_key[1]), xq=xq,
                               stop_after=stop_after)


def entropy_fused_u8(xbd: jnp.ndarray, valid_t, luma_t, rst_marker,
                     z_cap: int, w_out: int, consts, dct_key,
                     interpret: bool = False, compact_after=(),
                     xq: bool = False, stop_after=None):
    """entropy_fused variant with the forward DCT fused INTO the kernel.

    xbd: (C0/4, R) uint32 PACKED block-diagonal sample patches: sample
    b*64 + r*8 + c of segment-lane s is byte c%4 (little-endian) of word
    (b*16 + r*2 + c//4, s) — see make_rows_xbd_impl.  dct_key = (quality,
    luma, rst, use_bf16) selects the in-kernel quantizing DCT matrices.
    Everything else matches entropy_fused.

    xq=True: xbd is instead the (R, 128) 16-word-contiguous relayout
    (segments on sublanes, word order (row, block, half) per segment) —
    2.2x cheaper to produce in XLA; the kernel transposes + permutes in
    VMEM.  Requires rst == 8 (128 words per segment row).
    """
    if xq:
        R, C4 = xbd.shape
    else:
        C4, R = xbd.shape
    C0 = C4 * 4
    C = pow2_ge(max(C0, 64))
    B = C // 64
    if C != C0:
        assert not xq, "xq layout requires 128 words per segment"
        xbd = jnp.pad(xbd, ((0, (C - C0) // 4, ), (0, 0)))
    if B != valid_t.shape[0]:
        valid_t = jnp.pad(valid_t, ((0, B - valid_t.shape[0]), (0, 0)))
    rst = jnp.asarray(rst_marker).astype(jnp.int32).reshape(1, R)
    fn = _cached_entropy_kernel_u8(C, w_out, z_cap, B, consts,
                                   _r_tile(C), interpret,
                                   tuple(compact_after), dct_key, xq,
                                   stop_after)
    out_t, ob, needs = fn(xbd, valid_t, luma_t, rst)
    return out_t.T, ob, needs


def entropy_fused(coefs_t: jnp.ndarray, valid_t: jnp.ndarray,
                  luma_t: jnp.ndarray, rst_marker, z_cap: int, w_out: int,
                  consts, interpret: bool = False, compact_after=()):
    """Full entropy stage from TRANSPOSED coefficients.

    coefs_t: (C0, R) int16 — C0 = blocks_per_seg * 64 zig-zag quantized
             coefficients per segment row (sublanes), R segment rows
             (lanes); C0 is padded up to a power of two internally.
    valid_t: (B0, R) int32 — 1 where block j of row r emits tokens.
    luma_t:  (1, R) int32 — 1 where the row uses the luma table class.
    rst_marker: (R,) host array, 0 = no restart marker after the row.
    consts: tables.entropy_kernel_consts(quality).

    Returns (rows (R, w_out) u32, out_bytes (R,) i32, needs (D+2,) i32);
    needs[-2] must be <= z_cap and needs[-1] <= 4*w_out (mega_needs_ok) —
    the merge-tree levels cannot overflow by construction.
    """
    C0, R = coefs_t.shape
    C = pow2_ge(max(C0, 64))
    B = C // 64
    if C != C0:
        coefs_t = jnp.pad(coefs_t, ((0, C - C0), (0, 0)))
    if B != valid_t.shape[0]:
        valid_t = jnp.pad(valid_t, ((0, B - valid_t.shape[0]), (0, 0)))
    rst = jnp.asarray(rst_marker).astype(jnp.int32).reshape(1, R)
    fn = _cached_entropy_kernel(C, w_out, z_cap, B, consts, _r_tile(C),
                                interpret, tuple(compact_after))
    out_t, ob, needs = fn(coefs_t, valid_t, luma_t, rst)
    return out_t.T, ob, needs


def mega_needs_ok(needs: np.ndarray, z_cap: int, w_out: int,
                  compact_after=()) -> bool:
    """Host-side validation for entropy_fused.  Plain tree levels cannot
    overflow (27 * 2^d < 32 * 2^d); COMPACTED levels can: after k prior
    compactions, compacting at level d requires the level-d content to
    fit half the current span, i.e. needs[d-1] <= 32 * 2^(d-k-1)."""
    needs = np.asarray(needs)
    k = 0
    for d in sorted(compact_after):
        if d <= len(needs) - 2:
            if int(needs[d - 1]) > 32 << (d - k - 1):
                return False
        k += 1
    return int(needs[-2]) <= z_cap and int(needs[-1]) <= 4 * w_out


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


def pack_stuff_fused_pre(x2: jnp.ndarray, l2: jnp.ndarray,
                         rst_marker, z_cap: int, w_out: int,
                         interpret: bool = False):
    """Fused entropy back-end for PRE-MERGED level-1 input (the tokenizer's
    pairs=True output): x2 (R, T/2) uint32 left-aligned merged pair words,
    l2 (R, T/2) int32 merged bit lengths.

    Equivalent to pack_stuff_fused(bits, lens, l0=1, ...) but the level-1
    merge already happened inside the tokenizer fusion, halving the HBM
    round trip of the token arrays.  The needs vector layout is identical
    (needs[0] = max pair bits, then per-deep-level maxima, max stuffed
    zeros, max output bytes).
    """
    R, W1 = x2.shape
    N0 = pow2_ge(W1)
    D = N0.bit_length() - 1

    # barrier: the max-reduce and the transpose would otherwise each pull
    # a private copy of the whole tokenizer fusion
    x2, l2 = jax.lax.optimization_barrier((x2, l2))
    needs_e = jnp.max(l2).astype(jnp.int32)[None]
    if N0 != W1:
        x2 = jnp.pad(x2, ((0, 0), (0, N0 - W1)))
        l2 = jnp.pad(l2, ((0, 0), (0, N0 - W1)))
    rst = jnp.asarray(rst_marker).astype(jnp.int32).reshape(1, R)
    fn = _cached_kernel(N0, D, w_out, z_cap, 128, interpret)
    out_t, out_bytes, needs_d = fn(x2.T, l2.T, rst)
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
