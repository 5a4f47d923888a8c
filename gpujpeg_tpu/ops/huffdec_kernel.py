"""Pallas TPU phase-C Huffman block decoder (tuned computable tables).

The XLA phase C (ops/huffdec2.make_block_decode_fn) pays two structural
costs at scale:

  * the (L, 64) coefficient accumulator round-trips HBM on EVERY token
    step of the while loop (~25 MB/step at HD, ~1.6 GB per frame);
  * each step runs FOUR generic table decoders (DC/AC x luma/chroma,
    ~430 vector ops each: 16 maxcode compares + an 11x16 huffval select
    chain) and muxes the results.

This kernel removes both.  Lanes = blocks; each grid tile decodes
8*C_TILE blocks arranged as (8, C) full vregs — per-lane state rows use
every sublane, so the decode chain runs at full VPU width.  The
(8 x 64, C) coefficient tile lives in VMEM for the whole token loop and
is written to HBM once.  The DC token is decoded OUTSIDE the loop (in
phase C every lane's first token is DC, so the loop body is AC-only),
and AC symbols come from the tuned family's computable decode: the
canonical ordering fixed by tables.affine_ac_spec makes (run, size) pure
arithmetic on the code length and the rank within that length
(tables.affine_ac_decode_runtime) — no 162-entry huffval lookup.

Counterpart of gpujpeg_huffman_gpu_decoder.cu:390-536 (thread-per-segment
64Ki-LUT walk) re-shaped for a vector machine: same stream semantics,
same error containment (invalid code / cursor overrun / coefficient
overrun poison the lane, not the frame).

DC tables must satisfy huffval[j] == j (Annex-K DC property, checked by
tables.dc_values_identity) so the DC symbol is the canonical rank.
Foreign streams with non-matching tables use the XLA fallback path.

Lane layout contract (G8 = 8 sublane groups):
  host block index b in [0, L) maps to (group r, column l) with
  r = b // ceil(L/8)-ish — concretely the wrapper reshapes the padded
  (K, Lp) transposed buffers to (K, 8, Lp/8) -> (K*8, Lp/8), so
  b = r * (Lp/8) + l.  Outputs come back as (8*64, Lp/8) and are
  unpermuted with leading-dim reshapes/transposes only (minor dim — the
  lane axis — never moves, so the relayout is cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: decode at most this many AC tokens per block (63 AC + slack)
MAX_AC_STEPS = 66


def _mux(lum, a: int, b: int):
    """Per-lane luma/chroma constant select; a static immediate when the
    caller's table class is uniform (lum passed as a python bool)."""
    if a == b:
        return jnp.int32(a)
    if isinstance(lum, bool):
        return jnp.int32(a if lum else b)
    return jnp.where(lum, jnp.int32(a), jnp.int32(b))


def _rlen_increments(rlen):
    """Monotone r_len[1..15] as (base, [(k, delta), ...]) for the
    arithmetic rl(run) = base + sum(delta_k * [run >= k])."""
    base = int(rlen[1])
    incs = []
    for k in range(2, 16):
        d = int(rlen[k]) - int(rlen[k - 1])
        if d:
            incs.append((k, d))
    return base, tuple(incs)


def affine_ac_decode(peek16, lum, consts_l, consts_c):
    """(clen, sym) for one AC token from a left-aligned 16-bit peek.

    peek16/lum: (..., L) int32 / bool; consts_* from
    tables.affine_ac_decode_runtime.  clen == 0 marks an invalid code.
    Pure jnp — runs identically under XLA and inside Pallas kernels.

    Vector-op diet (this is the shared per-token core of decode phases
    A and C): the per-length (rank offset, zone) pair and the l == 16
    per-run (run, smin, base) triple are packed into ONE constant per
    chain step, and the monotone r_len lookup is computed arithmetically
    from its increments instead of a 16-step select chain.
    """
    monoL, roffL, zoneL, rlenL, b16L, smin16L, eL, zL, zrL = consts_l
    monoC, roffC, zoneC, rlenC, b16C, smin16C, eC, zC, zrC = consts_c

    clen = jnp.ones_like(peek16)
    for l in range(1, 16):
        clen = clen + (peek16 > _mux(lum, monoL[l], monoC[l]))
    invalid = peek16 > _mux(lum, monoL[16], monoC[16])

    code = peek16 >> (16 - clen)

    # packed per-length constant: zone' (14 b: pre(2) slo(4) nr0(4)
    # rlo(4)) << 17 | (roff + 2^16) (17 b).  roff = -mincode[l] is in
    # (-2^16, 0]; pre <= 2 (EOB + ZRL at most).
    def pack_l(zone, roff, l):
        z = int(zone[l])
        pre_, slo_ = z & 15, (z >> 4) & 15
        nr0_, rlo_ = (z >> 8) & 15, z >> 12
        assert pre_ <= 3
        z14 = pre_ | (slo_ << 2) | (nr0_ << 6) | (rlo_ << 10)
        return (z14 << 17) | (int(roff[l]) + 0x10000)

    pz = jnp.zeros_like(peek16)
    for l in range(1, 17):
        pz = jnp.where(clen == l,
                       _mux(lum, pack_l(zoneL, roffL, l),
                            pack_l(zoneC, roffC, l)), pz)
    rank = code + (pz & 0x1FFFF) - 0x10000
    z14 = pz >> 17
    pre = z14 & 3
    slo = (z14 >> 2) & 15
    nr0 = (z14 >> 6) & 15
    rlo = z14 >> 10

    is_eob = (clen == _mux(lum, eL, eC)) & (rank == 0)
    is_zrl = (clen == _mux(lum, zL, zC)) & (rank == _mux(lum, zrL, zrC))
    in_r0 = (rank >= pre) & (rank < pre + nr0)
    sym_r0 = slo + rank - pre
    base = pre + nr0

    # general zone (l < 16): runs contiguous from rlo, size = l -
    # r_len[run]; r_len[1:] is monotone (asserted at table build), so the
    # lookup is a sum over its increments (garbage for out-of-zone run_g,
    # which only invalid codes produce — masked by `invalid`)
    run_g = rlo + rank - base
    baseL, incsL = _rlen_increments(rlenL)
    baseC, incsC = _rlen_increments(rlenC)
    if incsL == incsC and baseL == baseC:
        rl_g = jnp.full_like(peek16, baseL)
        for k, d in incsL:
            rl_g = rl_g + jnp.where(run_g >= k, d, 0)
    else:
        rlL = jnp.full_like(peek16, baseL)
        for k, d in incsL:
            rlL = rlL + jnp.where(run_g >= k, d, 0)
        rlC = jnp.full_like(peek16, baseC)
        for k, d in incsC:
            rlC = rlC + jnp.where(run_g >= k, d, 0)
        rl_g = jnp.where(lum, rlL, rlC) if not isinstance(lum, bool) \
            else (rlL if lum else rlC)
    sym_g = (run_g << 4) | (clen - rl_g)

    # l == 16 zone: rank -> (run, size) via cumulative per-run bases;
    # (run << 20) | (smin << 16) | base packed into one select per step
    rank16 = rank - base
    psel = jnp.zeros_like(peek16)
    for r in range(1, 16):
        br = _mux(lum, b16L[r], b16C[r])
        pk = _mux(lum, (r << 20) | (int(smin16L[r]) << 16) | int(b16L[r]),
                  (r << 20) | (int(smin16C[r]) << 16) | int(b16C[r]))
        psel = jnp.where(rank16 >= br, pk, psel)
    run16 = psel >> 20
    smsel = (psel >> 16) & 15
    bsel = psel & 0xFFFF
    sym16 = (run16 << 4) | (smsel + rank16 - bsel)

    sym = jnp.where(clen >= 16, sym16, sym_g)
    sym = jnp.where(in_r0, sym_r0, sym)
    sym = jnp.where(is_zrl, 0xF0, sym)
    sym = jnp.where(is_eob, 0, sym)
    return jnp.where(invalid, 0, clen), sym


def dc_identity_decode(peek16, lum, mono_l, mono_c, roff_l, roff_c):
    """(clen, sym) for a DC token when huffval[j] == j: sym = canonical
    rank.  mono/roff from the same construction as the AC constants."""
    clen = jnp.ones_like(peek16)
    for l in range(1, 16):
        clen = clen + (peek16 > _mux(lum, mono_l[l], mono_c[l]))
    invalid = peek16 > _mux(lum, mono_l[16], mono_c[16])
    code = peek16 >> (16 - clen)
    sym = jnp.zeros_like(peek16)
    for l in range(1, 17):
        sym = jnp.where(clen == l, code + _mux(lum, roff_l[l], roff_c[l]),
                        sym)
    return jnp.where(invalid, 0, clen), sym


def _generic_decode(peek16, lum, tbl, base_l: int, base_c: int, nw: int):
    """(clen, sym) for one token from ANY baseline DHT table, driven by
    scalar-memory constants (no per-table recompile — the foreign-table
    counterpart of affine_ac_decode; reference: per-stream 64Ki LUT
    build + walk, gpujpeg_huffman_gpu_decoder.cu:539-610).

    tbl: SMEM int32 ref laid out per pack_decode_tables, OR a plain int
    tuple in the same layout (BAKED mode: constants become vector
    immediates at the cost of a per-table-set compile — used for table
    sets shared across many streams, e.g. Annex-K).  base_l/base_c:
    static offsets of the luma/chroma table block [mono17 | valoff17 |
    hv_words(nw)].  Scalar loads issue on the scalar core alongside the
    vector chain, so the per-step cost is close to the baked-constant
    chains.  clen == 0 marks an invalid code."""
    baked = isinstance(tbl, tuple)

    def sm(off):
        if isinstance(lum, bool):
            v = tbl[(base_l if lum else base_c) + off]
            return jnp.int32(v) if baked else v
        if base_l == base_c:
            v = tbl[base_l + off]
            return jnp.int32(v) if baked else v
        if baked:
            return _mux(lum, tbl[base_l + off], tbl[base_c + off])
        return jnp.where(lum, tbl[base_l + off], tbl[base_c + off])

    clen = jnp.ones_like(peek16)
    for l in range(1, 16):
        clen = clen + (peek16 > sm(l))
    invalid = peek16 > sm(16)
    code = peek16 >> (16 - clen)
    off = jnp.zeros_like(peek16)
    for l in range(1, 17):
        off = jnp.where(clen == l, sm(17 + l), off)
    idx = code + off                  # canonical symbol rank (F.15)
    idx_hi = idx >> 2
    w = jnp.zeros_like(peek16)
    for k in range(nw):
        w = jnp.where(idx_hi == k, sm(34 + k), w)
    sym = (w >> ((idx & 3) * 8)) & 0xFF
    return jnp.where(invalid, 0, clen), sym


def pack_decode_tables(dc_l, dc_c, ac_l, ac_c):
    """Flatten four (bits, values) DHT tables into ONE int32 array for
    the generic kernels' scalar prefetch: [dc_l | dc_c | ac_l | ac_c],
    each block = mono(17) + valoff(17) + hv_words(nw).  Returns
    (arr, nw_dc, nw_ac) with nw_ac bucketed so kernel shapes (and hence
    compiled programs) are shared across tables."""
    from ..utils import tables

    packs = [tables.packed_decode_table(*t) for t in
             (dc_l, dc_c, ac_l, ac_c)]
    nw_dc = 4                                     # baseline DC: <= 16 syms
    n_ac = max(packs[2][3], packs[3][3])
    need = -(-n_ac // 4)
    nw_ac = next(b for b in (16, 32, 48, 64) if b >= need)
    out = []
    for (mono, voff, hvw, n), nw in zip(packs, (nw_dc, nw_dc,
                                                nw_ac, nw_ac)):
        assert -(-n // 4) <= nw, "table larger than its bucket"
        out += list(mono) + list(voff) + list(hvw[:nw])
    # hv words carry 4 packed bytes and may exceed int32; wrap to the
    # same bit pattern (the kernel masks & 0xFF after every shift, so
    # arithmetic right-shift sign bits never leak into a symbol)
    arr = (np.asarray(out, np.int64) & 0xFFFFFFFF).astype(np.uint32) \
        .astype(np.int32)
    return (arr, nw_dc, nw_ac)


def _generic_bases(nw_dc: int, nw_ac: int):
    b_dc_l = 0
    b_dc_c = 34 + nw_dc
    b_ac_l = 2 * (34 + nw_dc)
    b_ac_c = b_ac_l + 34 + nw_ac
    return b_dc_l, b_dc_c, b_ac_l, b_ac_c


def dc_decode_runtime(bits, values):
    """(mono16, rankoff) int tuples for dc_identity_decode.  Requires
    tables.dc_values_identity(values)."""
    from ..utils import tables

    maxcode16, valoff, _hv = tables.huffman_decode_spec(
        np.asarray(bits), np.asarray(values))
    mono = np.asarray(maxcode16, np.int64).copy()
    mono[0] = -1
    for l in range(1, 17):
        if mono[l] < 0:
            mono[l] = mono[l - 1]
    # values identity => huffval[j] = j, so sym = j = code + valoff[l]
    return (tuple(int(x) for x in mono),
            tuple(int(x) for x in np.asarray(valoff, np.int64)))


def _block_kernel_body(*refs, K: int, ac_l=None, ac_c=None,
                       dc_mono_l=None, dc_mono_c=None,
                       dc_roff_l=None, dc_roff_c=None,
                       class_const=None, generic=None, baked_tbl=None,
                       with_cursor: bool = False):
    if generic is not None:
        if baked_tbl is not None:
            (bufs_ref, blen_ref, *rest) = refs
            tbl_src = baked_tbl
        else:
            (tbl_ref, bufs_ref, blen_ref, *rest) = refs
            tbl_src = tbl_ref
        nw_dc, nw_ac = generic
        b_dc_l, b_dc_c, b_ac_l, b_ac_c = _generic_bases(nw_dc, nw_ac)
        dc_dec = functools.partial(_generic_decode, tbl=tbl_src,
                                   base_l=b_dc_l, base_c=b_dc_c, nw=nw_dc)
        ac_dec = functools.partial(_generic_decode, tbl=tbl_src,
                                   base_l=b_ac_l, base_c=b_ac_c, nw=nw_ac)
    else:
        (bufs_ref, blen_ref, *rest) = refs
        dc_dec = functools.partial(
            dc_identity_decode, mono_l=dc_mono_l, mono_c=dc_mono_c,
            roff_l=dc_roff_l, roff_c=dc_roff_c)
        ac_dec = functools.partial(affine_ac_decode, consts_l=ac_l,
                                   consts_c=ac_c)
    if with_cursor:
        (cur0_ref, ldc_ref, lac_ref, valid_ref, coef_ref, err_ref) = rest
    else:
        (ldc_ref, lac_ref, valid_ref, coef_ref, err_ref) = rest
        cur0_ref = None
    C = bufs_ref.shape[1]
    blen = blen_ref[:, :]                       # (8, C)
    if class_const is not None:
        ldc, lac = bool(class_const[0]), bool(class_const[1])
    else:
        ldc = ldc_ref[:, :] != 0
        lac = lac_ref[:, :] != 0
    valid = valid_ref[:, :] != 0
    iota64 = jax.lax.broadcasted_iota(jnp.int32, (64, C), 0)

    def window32(cursor):
        wi = cursor >> 5
        hi = jnp.zeros((8, C), jnp.uint32)
        lo = jnp.zeros((8, C), jnp.uint32)
        for k in range(K):
            hit = wi == k
            hi = jnp.where(hit, bufs_ref[8 * k:8 * k + 8, :], hi)
            if k + 1 < K:
                lo = jnp.where(hit, bufs_ref[8 * k + 8:8 * k + 16, :], lo)
        r = (cursor & 31).astype(jnp.uint32)
        return jnp.where(r == 0, hi,
                         (hi << r) | (lo >> (jnp.uint32(32) - r)))

    def value_bits(peek, clen, size):
        vu = jnp.where(
            size == 0, jnp.uint32(0),
            (peek << jnp.clip(clen, 0, 31).astype(jnp.uint32))
            >> jnp.clip(32 - size, 0, 31).astype(jnp.uint32)
        ).astype(jnp.int32)
        half = jnp.where(size > 0, 1 << jnp.maximum(size - 1, 0), 1)
        return jnp.where((size > 0) & (vu < half), vu - (1 << size) + 1, vu)

    iota32 = jax.lax.broadcasted_iota(jnp.int32, (32, C), 0)

    def write_onehot(coefs, coef_idx, val, write):
        """coefs: tuple of 8 (32, C) uint32 PACKED accumulators — two
        16-bit coefficient rows per word (row 2q = low half).  Each
        coefficient slot receives at most one token (coef_idx strictly
        increases within a block), so an OR-insert is exact — and the
        packing halves both the per-step accumulator VMEM traffic (the
        kernel's real bound) and the one-hot compare rows.  Lanes not
        writing get idx -1, which never matches iota, folding the write
        mask into the compare.  (True i16 accumulators remain off the
        table: v5e Mosaic has no i16 iota/cmp.)"""
        idxh = jnp.where(write, coef_idx >> 1, -1)
        valp = ((val.astype(jnp.uint32) & jnp.uint32(0xFFFF))
                << ((coef_idx & 1) << 4).astype(jnp.uint32))
        out = []
        for g in range(8):
            idx_g = jnp.broadcast_to(idxh[g:g + 1, :], (32, C))
            val_g = jnp.broadcast_to(valp[g:g + 1, :], (32, C))
            out.append(coefs[g]
                       | jnp.where(iota32 == idx_g, val_g, jnp.uint32(0)))
        return tuple(out)

    # ---- DC token (every lane's first token), unrolled ----
    # SEGMENT-ROW mode (with_cursor): every lane's buffer is its WHOLE
    # segment row and decode starts at the lane's absolute bit cursor
    # (phase A's boundary), with blen the absolute END bit — the buffer
    # split (phase B) and its HBM round trip vanish; the lane walks the
    # same bits the split would have carved out.  All cursor/bound math
    # below is identical for both modes (cur0 == 0 in split mode).
    cur0 = (cur0_ref[:, :] if cur0_ref is not None
            else jnp.zeros((8, C), jnp.int32))
    peek = window32(cur0)
    peek16 = (peek >> 16).astype(jnp.int32)
    clen, sym = dc_dec(peek16, ldc)
    size = sym & 15
    consumed = clen + size
    bad = valid & ((clen == 0) | (cur0 + consumed > blen) | (sym > 15))
    ok = valid & ~bad
    val = value_bits(peek, clen, size)
    coefs = tuple(jnp.zeros((32, C), jnp.uint32) for _ in range(8))
    coefs = write_onehot(coefs, jnp.zeros((8, C), jnp.int32), val,
                         ok & (size > 0))
    cursor = jnp.where(ok, cur0 + consumed, cur0)
    err = bad

    # ---- AC loop ----
    done0 = ~valid | err | (cursor >= blen)     # DC-only blocks are done
    pos0 = jnp.ones((8, C), jnp.int32)

    def cond(s):
        it, flag = s[0], s[1]
        return (flag != 0) & (it < MAX_AC_STEPS)

    def step(coefs, cursor, pos, erri, donei):
        active = (donei == 0) & (erri == 0)
        peek = window32(cursor)
        peek16 = (peek >> 16).astype(jnp.int32)
        clen, sym = ac_dec(peek16, lac)
        run = sym >> 4
        size = sym & 15
        consumed = clen + size
        is_eob = sym == 0
        is_zrl = sym == 0xF0
        coef_idx = pos + run
        new_pos = jnp.where(is_eob, 64,
                  jnp.where(is_zrl, pos + 16, coef_idx + 1))
        bad = active & ((clen == 0) | (cursor + consumed > blen)
                        | (coef_idx > 63) | (new_pos > 64))
        okk = active & ~bad
        write = okk & ~is_eob & ~is_zrl & (size > 0)
        val = value_bits(peek, clen, size)
        coefs = write_onehot(coefs, coef_idx, val, write)
        cursor = jnp.where(okk, cursor + consumed, cursor)
        pos = jnp.where(okk, new_pos, pos)
        donei = jnp.where(okk & (new_pos >= 64), 1, donei)
        erri = jnp.where(bad, 1, erri)
        return coefs, cursor, pos, erri, donei

    def body(s):
        # two decode steps per flag check: the cross-lane flag reduce +
        # scalar cond form a serial stall between iterations; batching
        # halves those stalls at the cost of <= 1 no-op extra step
        it, _flag, coefs, cursor, pos, erri, donei = s
        coefs, cursor, pos, erri, donei = \
            step(coefs, cursor, pos, erri, donei)
        coefs, cursor, pos, erri, donei = \
            step(coefs, cursor, pos, erri, donei)
        flag = jnp.sum((donei == 0) & (erri == 0))
        return it + 2, flag, coefs, cursor, pos, erri, donei

    state = (jnp.int32(0), jnp.int32(1), coefs, cursor, pos0,
             err.astype(jnp.int32), done0.astype(jnp.int32))
    _it, _fl, coefs, cursor, pos, erri, donei = \
        jax.lax.while_loop(cond, body, state)
    # lanes that ran out of steps without finishing are corrupt
    erri = jnp.where(valid & (donei == 0), 1, erri)
    for g in range(8):
        # unpack the two 16-bit rows per word and interleave (sublane
        # repeat + parity select — all cheap, once per tile)
        wi = pltpu.bitcast(coefs[g], jnp.int32)
        lo = jnp.repeat((wi << 16) >> 16, 2, axis=0)
        hi = jnp.repeat(wi >> 16, 2, axis=0)
        inter = jnp.where((iota64 & 1) == 0, lo, hi)
        coef_ref[64 * g:64 * g + 64, :] = inter.astype(jnp.int16)
    err_ref[:, :] = jnp.where(valid, erri, 0)


def make_block_kernel(K: int, ac_l, ac_c, dc_l, dc_c,
                      C_tile: int = 128, interpret: bool = False,
                      class_const=None, generic=None, baked_tbl=None,
                      with_cursor: bool = False):
    """(bufs_t (K, L) u32, blen (1, L) i32, dc_luma/ac_luma/valid (1, L)
    i32) -> (coefs_t (64, L) int16 DIFFERENTIAL-DC, err (1, L) i32).

    ac_l/ac_c: tables.affine_ac_decode_runtime constants;
    dc_l/dc_c: dc_decode_runtime constants.  Each grid tile decodes
    8*C_tile block lanes as (8, C_tile) full vregs.  class_const: see
    make_scan_kernel.

    generic=(nw_dc, nw_ac): FOREIGN-table mode — ac_l..dc_c are ignored
    and the returned fn takes a leading packed-tables int32 array (see
    pack_decode_tables) through scalar prefetch, so one compiled kernel
    serves every table set of the same bucket.  baked_tbl: the packed
    table CONTENTS as a plain int tuple — compiled in as immediates
    (one compile per table set; used for widely shared sets like
    Annex-K, amortized by the persistent XLA cache); no leading array
    argument then.

    with_cursor: SEGMENT-ROW mode — the fn takes an extra cur0 (1, L)
    i32 after blen; each lane's buffer is its whole segment row, decode
    starts at absolute bit cur0 and blen is the absolute END bit.  The
    caller feeds segment rows lane-expanded per block (phase B — the
    buffer split and its HBM round trip — disappears)."""
    if generic is None:
        dc_mono_l, dc_roff_l = dc_l
        dc_mono_c, dc_roff_c = dc_c
        kernel = functools.partial(
            _block_kernel_body, K=K, ac_l=ac_l, ac_c=ac_c,
            dc_mono_l=dc_mono_l, dc_mono_c=dc_mono_c,
            dc_roff_l=dc_roff_l, dc_roff_c=dc_roff_c,
            class_const=class_const, with_cursor=with_cursor)
    else:
        kernel = functools.partial(
            _block_kernel_body, K=K, class_const=class_const,
            generic=tuple(generic), baked_tbl=baked_tbl,
            with_cursor=with_cursor)

    prefetch = generic is not None and baked_tbl is None

    def fn(*args):
        if prefetch:
            tbl, *args = args
        if with_cursor:
            bufs_t, blen, cur0, dc_luma, ac_luma, valid = args
        else:
            bufs_t, blen, dc_luma, ac_luma, valid = args
            cur0 = None
        L = bufs_t.shape[1]
        lanes = 8 * C_tile
        G = -(-L // lanes)
        Lp = G * lanes
        W8 = Lp // 8
        if Lp != L:
            bufs_t = jnp.pad(bufs_t, ((0, 0), (0, Lp - L)))
            blen = jnp.pad(blen, ((0, 0), (0, Lp - L)))
            dc_luma = jnp.pad(dc_luma, ((0, 0), (0, Lp - L)))
            ac_luma = jnp.pad(ac_luma, ((0, 0), (0, Lp - L)))
            valid = jnp.pad(valid, ((0, 0), (0, Lp - L)))
            if cur0 is not None:
                cur0 = jnp.pad(cur0, ((0, 0), (0, Lp - L)))
        # lane layout: block b = r * W8 + l  (r = sublane group)
        bufs8 = bufs_t.reshape(K, 8, W8).reshape(K * 8, W8)
        row8 = lambda a: a.reshape(8, W8)
        g8 = pl.BlockSpec((8, C_tile), lambda i, *_: (0, i),
                          memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((K * 8, C_tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            g8, g8, g8, g8,
        ]
        if with_cursor:
            in_specs = in_specs[:2] + [g8] + in_specs[2:]
        out_specs = [
            pl.BlockSpec((512, C_tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            g8,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((512, W8), jnp.int16),
            jax.ShapeDtypeStruct((8, W8), jnp.int32),
        ]
        ins = (bufs8, row8(blen), row8(dc_luma), row8(ac_luma),
               row8(valid))
        if with_cursor:
            ins = (bufs8, row8(blen), row8(cur0), row8(dc_luma),
                   row8(ac_luma), row8(valid))
        if prefetch:
            coefs8, err8 = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(G,),
                    in_specs=in_specs, out_specs=out_specs),
                out_shape=out_shape,
                interpret=interpret,
            )(jnp.asarray(tbl, jnp.int32), *ins)
        else:
            coefs8, err8 = pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
            )(*ins)
        # un-permute: (8, 64, W8) -> (64, 8, W8) -> (64, Lp); the minor
        # (lane) dim never moves, so this is a cheap leading-dim shuffle
        coefs_t = coefs8.reshape(8, 64, W8).transpose(1, 0, 2) \
            .reshape(64, Lp)[:, :L]
        err = err8.reshape(Lp)[:L]
        return coefs_t, err

    return fn


@functools.lru_cache(maxsize=32)
def cached_block_kernel(K, ac_l, ac_c, dc_l, dc_c, C_tile=128,
                        interpret=False, class_const=None, generic=None,
                        baked_tbl=None, with_cursor=False):
    return make_block_kernel(K, ac_l, ac_c, dc_l, dc_c, C_tile, interpret,
                             class_const, generic, baked_tbl, with_cursor)


# --------------------------------------------------------------------------
# Phase-A boundary-scan kernel (lanes = segments).
#
# The XLA scan (huffdec2.make_scan_fn) pays per-token-step HBM traffic on
# its loop state (~11 MB of window/position/bstart arrays at 8K, ~140
# steps -> GBs per frame) plus four-table select-chain decodes.  Here the
# whole walk runs in VMEM with the computable decode; refill is per-lane
# (word select chain over the tile's W words), so every loop iteration
# decodes one token for every active lane — no drain sub-loop.
# Matches the boundary semantics of huffdec2.make_scan_fn exactly.
# --------------------------------------------------------------------------

def _scan_kernel_body(*refs, W: int, bps: int,
                      max_steps: int, ac_l=None, ac_c=None,
                      dc_mono_l=None, dc_mono_c=None,
                      dc_roff_l=None, dc_roff_c=None,
                      luma_patterns=None, class_const=None, generic=None,
                      baked_tbl=None):
    if generic is not None:
        if baked_tbl is not None:
            (words_ref, nbits_ref, nblk_ref, ldc_ref, lac_ref,
             bstart_ref, err_ref) = refs
            tbl_src = baked_tbl
        else:
            (tbl_ref, words_ref, nbits_ref, nblk_ref, ldc_ref, lac_ref,
             bstart_ref, err_ref) = refs
            tbl_src = tbl_ref
        nw_dc, nw_ac = generic
        b_dc_l, b_dc_c, b_ac_l, b_ac_c = _generic_bases(nw_dc, nw_ac)
        dc_dec = functools.partial(_generic_decode, tbl=tbl_src,
                                   base_l=b_dc_l, base_c=b_dc_c, nw=nw_dc)
        ac_dec = functools.partial(_generic_decode, tbl=tbl_src,
                                   base_l=b_ac_l, base_c=b_ac_c, nw=nw_ac)
    else:
        (words_ref, nbits_ref, nblk_ref, ldc_ref, lac_ref,
         bstart_ref, err_ref) = refs
        dc_dec = functools.partial(
            dc_identity_decode, mono_l=dc_mono_l, mono_c=dc_mono_c,
            roff_l=dc_roff_l, roff_c=dc_roff_c)
        ac_dec = functools.partial(affine_ac_decode, consts_l=ac_l,
                                   consts_c=ac_c)
    C = nbits_ref.shape[1]
    nbits = nbits_ref[:, :]
    nblk = nblk_ref[:, :]
    if class_const is not None:
        # uniform table class for the whole call (per-component decode):
        # every _mux in the token core becomes a static immediate
        ldc_row, lac_row = bool(class_const[0]), bool(class_const[1])
    else:
        ldc_row = ldc_ref[:, :] != 0
        lac_row = lac_ref[:, :] != 0

    def flags(blk):
        """Table-class flags for the CURRENT block: fixed per lane
        (non-interleaved) or a pattern lookup on blk % bpm."""
        if luma_patterns is None:
            return ldc_row, lac_row
        dc_pat, ac_pat, bpm = luma_patterns
        slot = blk % bpm
        dl = jnp.zeros_like(blk) != 0
        al = jnp.zeros_like(blk) != 0
        for j in range(bpm):
            hit = slot == j
            if dc_pat[j]:
                dl = dl | hit
            if ac_pat[j]:
                al = al | hit
        return dl, al

    def word_at(wi):
        w = jnp.zeros((8, C), jnp.uint32)
        for k in range(W):
            w = jnp.where(wi == k, words_ref[8 * k:8 * k + 8, :], w)
        return w

    def cond(s):
        it, flag = s[0], s[1]
        return (flag != 0) & (it < max_steps)

    def step(s):
        (it, _flag, hi, lo, navail, wi, blk, pos, erri, bst) = s
        active = (blk < nblk) & (erri == 0)
        # per-lane refill: lanes below the watermark pull their next word
        need = active & (navail < 32) & (wi < W)
        word = word_at(wi)
        na = jnp.clip(navail, 0, 31).astype(jnp.uint32)
        hi2 = hi | jnp.where(na == 0, word, word >> na)
        lo2 = lo | jnp.where(na == 0, jnp.uint32(0),
                             word << (jnp.uint32(32) - na))
        hi = jnp.where(need, hi2, hi)
        lo = jnp.where(need, lo2, lo)
        navail = jnp.where(need, navail + 32, navail)
        wi = jnp.where(need, wi + 1, wi)

        # decode one token on lanes with a full window (or stream tail)
        ready = active & ((navail >= 32) | (wi >= W))
        peek16 = (hi >> 16).astype(jnp.int32)
        is_dc = pos == 0
        ldc, lac = flags(blk)
        dclen, dcsym = dc_dec(peek16, ldc)
        aclen, acsym = ac_dec(peek16, lac)
        clen = jnp.where(is_dc, dclen, aclen)
        sym = jnp.where(is_dc, dcsym, acsym)
        run = sym >> 4
        size = sym & 15
        consumed = clen + size
        is_eob = (~is_dc) & (sym == 0)
        is_zrl = (~is_dc) & (sym == 0xF0)
        coef_idx = jnp.where(is_dc, 0, pos + run)
        new_pos = jnp.where(is_dc, 1,
                  jnp.where(is_eob, 64,
                  jnp.where(is_zrl, pos + 16, coef_idx + 1)))
        cursor_after = 32 * wi - (navail - consumed)
        bad = ready & ((clen == 0) | (cursor_after > nbits)
                       | (coef_idx > 63) | (new_pos > 64))
        ok = ready & ~bad
        done = ok & (new_pos >= 64)
        # record the boundary: bstart[blk + 1] = cursor_after
        bst2 = []
        for b in range(bps):
            bst2.append(jnp.where(done & (blk == b), cursor_after,
                                  bst[b]))
        ku = jnp.clip(consumed, 0, 31).astype(jnp.uint32)
        h3 = jnp.where(ku == 0, hi, (hi << ku) | (lo >> (jnp.uint32(32)
                                                         - ku)))
        l3 = jnp.where(ku == 0, lo, lo << ku)
        hi = jnp.where(ok, h3, hi)
        lo = jnp.where(ok, l3, lo)
        navail = jnp.where(ok, navail - consumed, navail)
        blk = jnp.where(done, blk + 1, blk)
        pos = jnp.where(ok, jnp.where(done, 0, new_pos), pos)
        erri = jnp.where(bad, 1, erri)
        return (it + 1, jnp.int32(1), hi, lo, navail, wi, blk, pos, erri,
                tuple(bst2))

    def body(s):
        # two token steps per flag check (the cross-lane reduce + scalar
        # cond stall between iterations; a finished tile runs at most one
        # extra no-op step)
        s = step(step(s))
        (it, _flag, hi, lo, navail, wi, blk, pos, erri, bst) = s
        flag = jnp.sum(((blk < nblk) & (erri == 0)).astype(jnp.int32))
        return (it, flag, hi, lo, navail, wi, blk, pos, erri, bst)

    z = jnp.zeros((8, C), jnp.int32)
    zu = jnp.zeros((8, C), jnp.uint32)
    state = (jnp.int32(0), jnp.int32(1), zu, zu, z, z, z, z, z,
             tuple(z for _ in range(bps)))
    (_it, _fl, hi, lo, navail, wi, blk, pos, erri, bst) = \
        jax.lax.while_loop(cond, body, state)
    erri = jnp.where(blk < nblk, 1, erri)
    # entries past the last block -> stream end (valid empty spans)
    bstart_ref[0:8, :] = jnp.zeros((8, C), jnp.int32)
    for b in range(bps):
        v = jnp.where(b + 1 > blk, nbits, bst[b])
        bstart_ref[8 * (b + 1):8 * (b + 2), :] = v
    err_ref[:, :] = erri


def make_scan_kernel(W: int, bps: int, ac_l, ac_c, dc_l, dc_c,
                     C_tile: int = 128, interpret: bool = False,
                     luma_patterns=None, class_const=None, generic=None,
                     baked_tbl=None):
    """(words (nseg, W) u32, nbits/nblocks/dc_luma/ac_luma (nseg,)) ->
    (bstart (nseg, bps+1) i32, err (nseg,) bool) — kernel phase A.

    luma_patterns: None or (dc_pat, ac_pat, bpm) bool tuples for
    interleaved scans (table class switches per block-within-MCU slot).
    class_const: None or (dc_is_luma, ac_is_luma) bools when every lane
    of the call uses one table class (per-component non-interleaved
    decode) — the per-lane class muxes compile to immediates.
    generic=(nw_dc, nw_ac): FOREIGN-table mode — ac_l..dc_c are ignored
    and the returned fn takes a leading packed-tables int32 array (see
    pack_decode_tables) through scalar prefetch, so one compiled kernel
    serves every table set of the same bucket.
    """
    max_steps = bps * 66 + 2 * W + 8
    if generic is None:
        dc_mono_l, dc_roff_l = dc_l
        dc_mono_c, dc_roff_c = dc_c
        kernel = functools.partial(
            _scan_kernel_body, W=W, bps=bps, max_steps=max_steps,
            ac_l=ac_l, ac_c=ac_c, dc_mono_l=dc_mono_l, dc_mono_c=dc_mono_c,
            dc_roff_l=dc_roff_l, dc_roff_c=dc_roff_c,
            luma_patterns=luma_patterns, class_const=class_const)
    else:
        kernel = functools.partial(
            _scan_kernel_body, W=W, bps=bps, max_steps=max_steps,
            luma_patterns=luma_patterns, class_const=class_const,
            generic=tuple(generic), baked_tbl=baked_tbl)

    prefetch = generic is not None and baked_tbl is None

    def fn(*args):
        if prefetch:
            tbl, words, nbits, nblocks, dc_luma, ac_luma = args
        else:
            words, nbits, nblocks, dc_luma, ac_luma = args
        nseg = words.shape[0]
        lanes = 8 * C_tile
        G = -(-nseg // lanes)
        Np = G * lanes
        N8 = Np // 8
        wt = words.T
        if Np != nseg:
            wt = jnp.pad(wt, ((0, 0), (0, Np - nseg)))
            nbits = jnp.pad(nbits, (0, Np - nseg))
            nblocks = jnp.pad(nblocks, (0, Np - nseg))
            dc_luma = jnp.pad(dc_luma, (0, Np - nseg))
            ac_luma = jnp.pad(ac_luma, (0, Np - nseg))
        w8 = wt.reshape(W, 8, N8).reshape(W * 8, N8)
        row8 = lambda a: a.astype(jnp.int32).reshape(8, N8)
        g8 = pl.BlockSpec((8, C_tile), lambda i, *_: (0, i),
                          memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((W * 8, C_tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            g8, g8, g8, g8,
        ]
        out_specs = [
            pl.BlockSpec(((bps + 1) * 8, C_tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            g8,
        ]
        out_shape = [
            jax.ShapeDtypeStruct(((bps + 1) * 8, N8), jnp.int32),
            jax.ShapeDtypeStruct((8, N8), jnp.int32),
        ]
        ins = (w8, row8(nbits), row8(nblocks), row8(dc_luma),
               row8(ac_luma))
        if prefetch:
            bstart8, err8 = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(G,),
                    in_specs=in_specs, out_specs=out_specs),
                out_shape=out_shape,
                interpret=interpret,
            )(jnp.asarray(tbl, jnp.int32), *ins)
        else:
            bstart8, err8 = pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
            )(*ins)
        # (bps+1, 8, N8) -> (bps+1, nseg) -> (nseg, bps+1): only the
        # final small transpose moves the minor dim
        bstart = bstart8.reshape(bps + 1, Np).T[:nseg]
        err = (err8.reshape(Np) != 0)[:nseg]
        return bstart, err

    return fn


@functools.lru_cache(maxsize=32)
def cached_scan_kernel(W, bps, ac_l, ac_c, dc_l, dc_c, C_tile=128,
                       interpret=False, luma_patterns=None,
                       class_const=None, generic=None, baked_tbl=None):
    return make_scan_kernel(W, bps, ac_l, ac_c, dc_l, dc_c, C_tile,
                            interpret, luma_patterns, class_const,
                            generic, baked_tbl)
