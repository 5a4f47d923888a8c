"""Gather-free segment-parallel Huffman decoding (three phases).

The reference decodes one segment per CUDA thread with a 64Ki-entry LUT
(src/gpujpeg_huffman_gpu_decoder.cu:390-536).  On TPU, both big-table
gathers and per-lane dynamic loads cost ~10 ns/element through XLA, so the
decode is restructured into three gather-free passes:

  A. boundary scan — lanes = segments.  Words stream through the lanes in
     LOCKSTEP (a static column load per outer step); each lane drains its
     64-bit window below 32 bits before the next refill, so windows never
     overflow.  Code lengths come from the canonical left-aligned maxcode
     compare (libjpeg-style F.16, no table), symbols from 16-wide row
     selects.  Output: each block's starting bit offset.

  B. buffer split — a merge tree run backwards: each level splits every
     buffer in two with a dynamic left bitstream-shift (elementwise +
     static rolls), until one small word buffer per 8x8 BLOCK remains.
     Level capacities are content-adaptive; realized needs derive directly
     from the phase-A boundaries.

  C. block decode — lanes = blocks.  Each lane walks its own small buffer
     (word select via a free chain over <=K columns), decoding at most ~65
     tokens; coefficients land in the lane's own (64,) row via an iota
     one-hot, so no scatter ever happens.  DC is emitted differentially
     and fixed up with one cumsum over the block axis afterwards
     (F.1.1.5.1 restart semantics fall out of the segment-row layout).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bitmerge

#: max bits of one entropy token: 16-bit code + <=11 value bits
MAX_TOKEN_BITS = 27
#: refill watermark: outer steps drain every lane below this bit count
DRAIN = 32


def _make_table_decode(spec):
    """Closure decoding (clen, sym) from a left-aligned 16-bit peek for ONE
    static canonical table (maxcode16, valoff, huffval16)."""
    maxcode16, valoff, hv16 = spec
    hv16 = np.asarray(hv16, np.int32)

    def decode(peek16):
        clen = jnp.zeros_like(peek16)
        j = jnp.zeros_like(peek16)
        for l in range(1, 17):
            mc = int(maxcode16[l])
            if mc < 0:
                continue
            hit = (clen == 0) & (peek16 <= mc)
            code_l = peek16 >> (16 - l)
            j = jnp.where(hit, code_l + int(valoff[l]), j)
            clen = jnp.where(hit, l, clen)
        hi = j >> 4
        lo = j & 15
        sym = jnp.zeros_like(peek16)
        for h in range(hv16.shape[0]):
            if h > 0 and not hv16[h].any():
                continue
            sym = jnp.where(hi == h, jnp.asarray(hv16[h])[lo], sym)
        return clen, sym

    return decode


def make_token_decoder(dc_specs, ac_specs):
    """Closure: (peek16, is_dc, is_luma) -> (clen, sym) over the four
    static tables (DC/AC x luma/chroma).  All selects, no gathers."""
    d_lum = _make_table_decode(dc_specs[0])
    d_chr = _make_table_decode(dc_specs[1])
    a_lum = _make_table_decode(ac_specs[0])
    a_chr = _make_table_decode(ac_specs[1])
    same_lc_dc = _specs_equal(dc_specs[0], dc_specs[1])
    same_lc_ac = _specs_equal(ac_specs[0], ac_specs[1])

    def decode(peek16, is_dc, dc_luma, ac_luma):
        dl = d_lum(peek16)
        dc = dl if same_lc_dc else d_chr(peek16)
        al = a_lum(peek16)
        ac = al if same_lc_ac else a_chr(peek16)
        dc_c = jnp.where(dc_luma, dl[0], dc[0])
        dc_s = jnp.where(dc_luma, dl[1], dc[1])
        ac_c = jnp.where(ac_luma, al[0], ac[0])
        ac_s = jnp.where(ac_luma, al[1], ac[1])
        clen = jnp.where(is_dc, dc_c, ac_c)
        sym = jnp.where(is_dc, dc_s, ac_s)
        return clen, sym

    return decode


def _specs_equal(a, b) -> bool:
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def make_affine_token_decoder(kernel_consts):
    """Computable-table token decoder (tuned AC family + identity DC):
    same (peek16, is_dc, dc_luma, ac_luma) -> (clen, sym) contract as
    make_token_decoder but ~3x fewer vector ops — one arithmetic AC
    decode + one rank-identity DC decode instead of four select-chain
    table walks.  kernel_consts = (ac_l, ac_c, dc_l, dc_c) as built by
    models.decoder._plan_kernel_consts."""
    from . import huffdec_kernel as hk

    ac_l, ac_c, dc_l, dc_c = kernel_consts

    def decode(peek16, is_dc, dc_luma, ac_luma):
        dclen, dcsym = hk.dc_identity_decode(
            peek16, dc_luma, dc_l[0], dc_c[0], dc_l[1], dc_c[1])
        aclen, acsym = hk.affine_ac_decode(peek16, ac_luma, ac_l, ac_c)
        clen = jnp.where(is_dc, dclen, aclen)
        sym = jnp.where(is_dc, dcsym, acsym)
        return clen, sym

    return decode


def _consume(hi, lo, navail, k):
    """Drop the top k (<32) bits of the (hi, lo) MSB-aligned window."""
    ku = jnp.clip(k, 0, 31).astype(jnp.uint32)
    h2 = jnp.where(ku == 0, hi,
                   (hi << ku) | (lo >> (jnp.uint32(32) - ku)))
    l2 = jnp.where(ku == 0, lo, lo << ku)
    return h2, l2, navail - k


def _token_step(peek16, peek_lo, pos, token_decode, dc_luma, ac_luma):
    """Shared token semantics: returns dict of per-lane token facts."""
    is_dc = pos == 0
    clen, sym = token_decode(peek16, is_dc, dc_luma, ac_luma)
    run = sym >> 4
    size = sym & 15
    consumed = clen + size
    is_eob = (~is_dc) & (sym == 0)
    is_zrl = (~is_dc) & (sym == 0xF0)
    coef_idx = jnp.where(is_dc, 0, pos + run)
    new_pos = jnp.where(is_dc, 1,
              jnp.where(is_eob, 64,
              jnp.where(is_zrl, pos + 16, coef_idx + 1)))
    return dict(clen=clen, sym=sym, run=run, size=size, consumed=consumed,
                is_dc=is_dc, is_eob=is_eob, is_zrl=is_zrl,
                coef_idx=coef_idx, new_pos=new_pos)


def make_scan_fn(dc_specs, ac_specs, bps: int, max_steps: int,
                 luma_patterns=None, affine_consts=None):
    """Phase A factory: returns jitted
    fn(words, nbits, blocks_per_seg, dc_luma_row, ac_luma_row)
    -> (bstart, err).

    luma_patterns: None (table set fixed per segment row, the
    non-interleaved case) or (dc_pat, ac_pat, bpm) bool patterns over the
    block-within-MCU slot (interleaved scans); pattern lookups are free
    <=16-entry selects.

    affine_consts: computable-table decode constants (tuned AC family);
    when given, the per-token decode uses arithmetic instead of the
    4-table select chains (~2x faster scan on matching streams).

    bstart: (nseg, bps+1) int32 — block start bits; entry b >=
    blocks_per_seg holds the stream end so spans are always valid.
    """
    token_decode = (make_affine_token_decoder(affine_consts)
                    if affine_consts is not None
                    else make_token_decoder(dc_specs, ac_specs))
    if luma_patterns is not None:
        dc_pat, ac_pat, bpm = luma_patterns
        dc_pat = np.asarray(dc_pat, bool)
        ac_pat = np.asarray(ac_pat, bool)

    def fn(words, nbits, blocks_per_seg, dc_luma_row, ac_luma_row):
        nseg, W = words.shape
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (nseg, bps + 1), 1)

        def flags(blk):
            if luma_patterns is None:
                return dc_luma_row, ac_luma_row
            slot = blk % bpm
            return (jnp.asarray(dc_pat)[slot], jnp.asarray(ac_pat)[slot])

        def token_pass(state, consumed_base, gate):
            hi, lo, navail, blk, pos, bstart, err = state
            active = (blk < blocks_per_seg) & ~err & gate
            peek16 = (hi >> 16).astype(jnp.int32)
            dl, al = flags(blk)
            t = _token_step(peek16, lo, pos, token_decode, dl, al)
            cursor_after = consumed_base - (navail - t["consumed"])
            bad = active & ((t["clen"] == 0) | (cursor_after > nbits)
                            | (t["coef_idx"] > 63) | (t["new_pos"] > 64))
            ok = active & ~bad
            done = ok & (t["new_pos"] >= 64)
            bstart = jnp.where(
                (iota_b == (blk + 1)[:, None]) & done[:, None],
                cursor_after[:, None], bstart)
            h2, l2, na2 = _consume(hi, lo, navail, t["consumed"])
            hi = jnp.where(ok, h2, hi)
            lo = jnp.where(ok, l2, lo)
            navail = jnp.where(ok, na2, navail)
            blk = jnp.where(done, blk + 1, blk)
            pos = jnp.where(ok, jnp.where(done, 0, t["new_pos"]), pos)
            err = err | bad
            return (hi, lo, navail, blk, pos, bstart, err)

        def outer(w, state):
            hi, lo, navail, blk, pos, bstart, err = state
            word = words[:, w]
            na = jnp.clip(navail, 0, 31).astype(jnp.uint32)
            hi = hi | jnp.where(na == 0, word, word >> na)
            lo = lo | jnp.where(na == 0, jnp.uint32(0),
                                word << (jnp.uint32(32) - na))
            navail = navail + 32
            consumed_base = (w + 1) * 32
            state = (hi, lo, navail, blk, pos, bstart, err)

            def drain_cond(s):
                st, it = s
                hi, lo, navail, blk, pos, bstart, err = st
                act = (blk < blocks_per_seg) & ~err & (navail >= DRAIN)
                return jnp.any(act) & (it < max_steps)

            def drain(s):
                st, it = s
                hi, lo, navail, *_ = st
                gate = st[2] >= DRAIN
                return token_pass(st, consumed_base, gate), it + 1

            state, _ = jax.lax.while_loop(drain_cond, drain,
                                          (state, jnp.int32(0)))
            return state

        state = (
            jnp.zeros(nseg, jnp.uint32), jnp.zeros(nseg, jnp.uint32),
            jnp.zeros(nseg, jnp.int32), jnp.zeros(nseg, jnp.int32),
            jnp.zeros(nseg, jnp.int32),
            jnp.zeros((nseg, bps + 1), jnp.int32),
            jnp.zeros(nseg, jnp.bool_),
        )
        state = jax.lax.fori_loop(0, W, outer, state)

        # tail: drain remaining (< DRAIN) bits
        def tail_cond(s):
            st, it = s
            hi, lo, navail, blk, pos, bstart, err = st
            return jnp.any((blk < blocks_per_seg) & ~err) & (it < max_steps)

        def tail(s):
            st, it = s
            W32 = W * 32
            return token_pass(st, W32, jnp.bool_(True)), it + 1

        state, _ = jax.lax.while_loop(tail_cond, tail,
                                      (state, jnp.int32(0)))
        hi, lo, navail, blk, pos, bstart, err = state
        err = err | (blk < blocks_per_seg)
        # unset entries (past last block) -> stream end
        bstart = jnp.where(iota_b > blk[:, None], nbits[:, None], bstart)
        return bstart, err

    return jax.jit(fn)


def split_plan(bps: int):
    """Static split schedule: list of levels; level i gives, per buffer,
    the block index where it splits.  Buffers cover contiguous block
    ranges; conceptually bps is padded to a power of two with empty
    ranges."""
    levels = []
    ranges = [(0, bps)]
    while max(e - s for s, e in ranges) > 1:
        splits = []
        nxt = []
        for (s, e) in ranges:
            m = min(s + _half_pow2(e - s), e)
            splits.append(m)
            nxt += [(s, m), (m, e)]
        levels.append(splits)
        ranges = nxt
    return levels, ranges


def _half_pow2(n: int) -> int:
    """Half of n rounded up to the next power of two (>=1)."""
    if n <= 1:
        return n
    p = 1 << (n - 1).bit_length()
    return p // 2


def split_needs(bstart: jnp.ndarray, bps: int):
    """Per-level word capacities actually needed, straight from the
    phase-A boundaries.  Returns (needs, block_words) as int32 arrays:
    needs[i] = max words of any level-(i+1) buffer; block_words = max words
    of any single block."""
    levels, ranges = split_plan(bps)
    if not levels:          # bps == 1: no split, buffer = whole segment
        return jnp.zeros((0,), jnp.int32)
    needs = []
    cur = [(0, bps)]
    for splits in levels:
        nxt = []
        for (s, e), m in zip(cur, splits):
            nxt += [(s, m), (m, e)]
        spans = []
        for (s, e) in nxt:
            spans.append(bstart[:, e] - bstart[:, s])
        span = jnp.stack(spans, axis=1)
        needs.append(((jnp.max(span) + 63) >> 5).astype(jnp.int32))
        cur = nxt
    return jnp.stack(needs)


def make_split_fn(bps: int, caps: Sequence[int]):
    """Phase B factory: fn(words, bstart) -> (nseg, bps, K) uint32 buffers.

    caps: static per-level word capacities (len == number of split levels);
    the last entry is the per-block buffer size K.
    """
    levels, _ = split_plan(bps)
    assert len(caps) >= len(levels)

    def fn(words, bstart):
        nseg, W = words.shape
        buf = words[:, None, :]
        base_idx = [(0)]
        cur = [(0, bps)]
        base = jnp.zeros((nseg, 1), jnp.int32)
        for lv, splits in enumerate(levels):
            K_new = int(caps[lv])
            split_bit = bstart[:, jnp.asarray(np.asarray(splits, np.int32))]
            off = split_bit - base
            left = buf[:, :, :K_new] if buf.shape[2] >= K_new else \
                jnp.pad(buf, ((0, 0), (0, 0), (0, K_new - buf.shape[2])))
            right = _shift_left(buf, off, K_new)
            buf = jnp.stack([left, right], axis=2).reshape(
                nseg, -1, K_new)
            base = jnp.stack([base, split_bit], axis=2).reshape(nseg, -1)
            nxt = []
            for (s, e), m in zip(cur, splits):
                nxt += [(s, m), (m, e)]
            cur = nxt
        # keep one buffer per real block, in block order
        keep = [i for i, (s, e) in enumerate(cur) if e > s]
        assert len(keep) == bps
        return buf[:, jnp.asarray(np.asarray(keep, np.int32)), :]

    return jax.jit(fn)


def _shift_left(buf: jnp.ndarray, shift_bits: jnp.ndarray,
                K_out: int) -> jnp.ndarray:
    """Left bitstream shift: out word i = bits [shift + 32*i, ...) of buf.

    buf: (R, N, K) uint32; shift_bits: (R, N) int32 >= 0.
    """
    R, N, K = buf.shape
    if K < K_out:
        buf = jnp.pad(buf, ((0, 0), (0, 0), (0, K_out - K)))
        K = K_out
    sh = shift_bits[:, :, None]
    w = (sh >> 5).astype(jnp.int32)
    r = (sh & 31).astype(jnp.uint32)
    out = buf
    step = 1
    while step < K:
        moved = jnp.concatenate(
            [out[:, :, step:], jnp.zeros((R, N, step), buf.dtype)], axis=2)
        out = jnp.where((w & step) != 0, moved, out)
        step *= 2
    nxt = jnp.concatenate(
        [out[:, :, 1:], jnp.zeros((R, N, 1), buf.dtype)], axis=2)
    out = jnp.where(r == 0, out,
                    (out << r) | (nxt >> (jnp.uint32(32) - r)))
    return out[:, :, :K_out]


def make_block_decode_fn(dc_specs, ac_specs, max_steps: int):
    """Phase C factory: fn(bufs, bit_len, dc_luma, ac_luma, valid) ->
    (coefs (L, 64) int16 with DIFFERENTIAL DC, err (L,) bool)."""
    token_decode = make_token_decoder(dc_specs, ac_specs)

    def fn(bufs, bit_len, dc_luma, ac_luma, valid):
        L, K = bufs.shape
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (L, 64), 1)

        def get_window(cursor):
            wi = cursor >> 5
            hi = jnp.zeros(L, jnp.uint32)
            lo = jnp.zeros(L, jnp.uint32)
            for k in range(K):
                hi = jnp.where(wi == k, bufs[:, k], hi)
                if k + 1 < K:
                    lo = jnp.where(wi == k, bufs[:, k + 1], lo)
            r = (cursor & 31).astype(jnp.uint32)
            return jnp.where(r == 0, hi,
                             (hi << r) | (lo >> (jnp.uint32(32) - r)))

        def cond(s):
            coefs, cursor, pos, err, done, it = s
            return jnp.any(~done & ~err) & (it < max_steps)

        def body(s):
            coefs, cursor, pos, err, done, it = s
            active = ~done & ~err
            peek = get_window(cursor)
            peek16 = (peek >> 16).astype(jnp.int32)
            t = _token_step(peek16, None, pos, token_decode,
                            dc_luma, ac_luma)
            bad = active & ((t["clen"] == 0)
                            | (cursor + t["consumed"] > bit_len)
                            | (t["coef_idx"] > 63) | (t["new_pos"] > 64))
            ok = active & ~bad

            size = t["size"]
            vu = jnp.where(
                size == 0, jnp.uint32(0),
                (peek << jnp.clip(t["clen"], 0, 31).astype(jnp.uint32))
                >> jnp.clip(32 - size, 0, 31).astype(jnp.uint32)
            ).astype(jnp.int32)
            half = jnp.where(size > 0, 1 << jnp.maximum(size - 1, 0), 1)
            val = jnp.where((size > 0) & (vu < half),
                            vu - (1 << size) + 1, vu)

            write = ok & ~t["is_eob"] & ~t["is_zrl"] & (size > 0)
            coefs = coefs + jnp.where(
                write[:, None] & (iota64 == t["coef_idx"][:, None]),
                val[:, None], 0).astype(jnp.int16)
            cursor = jnp.where(ok, cursor + t["consumed"], cursor)
            pos = jnp.where(ok, t["new_pos"], pos)
            done = done | (ok & (t["new_pos"] >= 64))
            err = err | bad
            return coefs, cursor, pos, err, done, it + 1

        state = (jnp.zeros((L, 64), jnp.int16), jnp.zeros(L, jnp.int32),
                 jnp.zeros(L, jnp.int32), jnp.zeros(L, jnp.bool_),
                 ~valid, jnp.int32(0))
        coefs, cursor, pos, err, done, _ = jax.lax.while_loop(
            cond, body, state)
        return coefs, err & valid

    return jax.jit(fn)
