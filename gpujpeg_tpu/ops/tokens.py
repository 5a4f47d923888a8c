"""Vectorized Huffman tokenization.

The reference encodes entropy symbols with one warp per restart segment using
ballot/clz tricks (src/gpujpeg_huffman_gpu_encoder.cu:197-287).  The
TPU-native formulation is fully data-parallel over *every coefficient slot*:
each of the 64 zig-zag positions of every block emits exactly zero or one
token of at most 27 bits:

  pos 0:            DC code  (size category of the DC diff) + value bits
  pos i, coef != 0: AC code  ((run & 15) << 4 | size) + value bits
  pos i, coef == 0: ZRL (0xF0) iff this zero is the 16th/32nd/48th of its
                    run *and* a nonzero coefficient follows in the block
  pos 63, coef==0:  EOB (0x00)
  otherwise:        nothing (length 0)

Zero-run lengths and "a nonzero follows" come from per-block prefix/suffix
max-scans — the associative-scan equivalent of the reference's
__ballot_sync + __clz bitmaps.  The result is a dense (blocks, 64) array of
(bits, len) pairs consumed by ops.bitmerge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tokenize_rows(coefs: jnp.ndarray, dc_lut: np.ndarray, ac_lut: np.ndarray,
                  valid: np.ndarray | None = None, pairs: bool = False,
                  ac_affine=None):
    """Huffman-tokenize segment rows of blocks, gather-free.

    XLA gathers cost ~10 ns/element on TPU, but gathers from <=16-entry
    tables lower to vector selects and are effectively free; the 256-entry
    AC code table is therefore decomposed as 16 run-tables of 16 sizes, and
    the DC predictor (previous block of the same component in the same
    segment, F.1.1.5.1) becomes a shift along the block axis — segment rows
    make the restart-reset automatic at row boundaries.

    coefs:  (S, B, 64) int quantized zig-zag coefficients; rows are restart
            segments of ONE component (or one component's interleaved MCU
            slice), blocks in stream order
    dc_lut: (12,) uint32 (len<<16 | code) per DC size category
    ac_lut: (16, 16) uint32 per (run, size); [0][0]=EOB, [15][0]=ZRL
    valid:  (S, B) bool static mask; False blocks emit no tokens

    Returns (bits, lens): (S, B*64) uint32 / int32.

    pairs=True folds the fused packer's level-1 merge into this fusion:
    adjacent token pairs are left-aligned and merged, returning
    (x2, l2): (S, B*32) uint32 left-aligned merged words / int32 merged
    bit lengths (<= 54; the caller must verify max(l2) <= 32 via the
    needs protocol).  Halves the HBM traffic of the token arrays.

    ac_affine: optional tables.affine_ac_runtime() constants for the
    tuned computable code family — replaces the 256-entry select chain
    (~270 vector ops/coefficient) with 3 16-entry lookups + arithmetic
    (~70 ops), the dominant encode-cost reduction on TPU.  When set,
    ac_lut is ignored.
    """
    S, B, _ = coefs.shape
    v = coefs.astype(jnp.int16)

    dc = v[:, :, 0]
    pred = jnp.pad(dc, ((0, 0), (1, 0)))[:, :-1]
    v = jnp.concatenate([(dc - pred)[:, :, None], v[:, :, 1:]], axis=2)

    av = jnp.abs(v)
    # bit category (<= 12); int16 clz
    size = (16 - jax.lax.clz(av)).astype(jnp.int16)   # 0 for v == 0
    vb16 = (jnp.where(v < 0, v - 1, v).astype(jnp.uint16)
            & ((jnp.uint16(1) << jnp.clip(size, 0, 15).astype(jnp.uint16))
               - 1))

    idx = jax.lax.broadcasted_iota(jnp.int16, (S, B, 64), 2)
    nz = v != 0
    marker = jnp.where(nz | (idx == 0), idx, jnp.int16(-1))
    last_incl = jax.lax.cummax(marker, axis=2)
    last_before = jnp.concatenate(
        [jnp.zeros((S, B, 1), jnp.int16), last_incl[:, :, :-1]], axis=2)
    run = (idx - last_before - 1).astype(jnp.int16)
    suffix = jnp.flip(jax.lax.cummax(
        jnp.flip(nz.astype(jnp.int8), 2), axis=2), 2)
    has_after = jnp.concatenate(
        [suffix[:, :, 1:], jnp.zeros((S, B, 1), jnp.int8)], axis=2) > 0

    is_dc = idx == 0
    is_code = nz & ~is_dc
    zero_run_incl = idx - last_before
    is_zrl = (~nz) & ~is_dc & has_after & (zero_run_incl % 16 == 0)
    is_eob = (~nz) & (idx == 63)

    run16 = jnp.where(is_code, run & 15,
                      jnp.where(is_zrl, jnp.int16(15), jnp.int16(0)))
    size16 = jnp.where(is_code, size, jnp.int16(0))

    if ac_affine is not None:
        # computable canonical code (tables.affine_ac_runtime): run-0 is
        # one exact 16-entry lookup; runs >= 1 are arithmetic on two more
        t0, rt, al, eob_e, zrl_e = ac_affine
        t0e = jnp.asarray(np.asarray(t0, np.uint32))[size16]
        rte = jnp.asarray(np.asarray(rt, np.int32))[run16]
        rl = (rte >> 20) & 0x1F
        bB = rte & 0xFFFFF
        l = rl + size16.astype(jnp.int32)
        a = jnp.asarray(np.asarray(al, np.int32))[
            jnp.clip(l, 0, 15).astype(jnp.int16)]
        code_a = jnp.where(l >= 16, bB + size16, a + run16)
        len_a = jnp.minimum(l, 16)
        entry = jnp.where(
            run16 == 0, t0e,
            (len_a.astype(jnp.uint32) << 16) | code_a.astype(jnp.uint32))
        entry = jnp.where(is_zrl, jnp.uint32(zrl_e), entry)
        entry = jnp.where(is_eob, jnp.uint32(eob_e), entry)
    else:
        # AC entry via 16 free 16-entry gathers + select chain over the run
        ac_rows = np.asarray(ac_lut, np.uint32)
        entry = jnp.zeros((S, B, 64), jnp.uint32)
        for r in range(16):
            cand = jnp.asarray(ac_rows[r])[size16]
            entry = jnp.where(run16 == r, cand, entry)
    dc_entry = jnp.asarray(np.asarray(dc_lut, np.uint32))[
        jnp.minimum(size[:, :, 0], 11).astype(jnp.int16)]
    entry = jnp.concatenate([dc_entry[:, :, None], entry[:, :, 1:]], axis=2)

    clen = (entry >> 16).astype(jnp.int16)
    code = (entry & 0xFFFF).astype(jnp.uint32)
    size32 = jnp.clip(size, 0, 15).astype(jnp.uint32)
    bits = (code << size32) | vb16.astype(jnp.uint32)
    lens = (clen + size).astype(jnp.int16)
    emit = is_dc | is_code | is_zrl | is_eob
    lens = jnp.where(emit, lens, jnp.int16(0))
    if valid is not None:
        lens = lens * jnp.asarray(valid.astype(np.int16))[:, :, None]
    if not pairs:
        return (bits.reshape(S, B * 64),
                lens.reshape(S, B * 64).astype(jnp.int32))
    l32 = lens.astype(jnp.int32)
    # left-align (len <= 27, so 32-len in [5, 31]); zero empty slots
    x = jnp.where(l32 > 0,
                  bits << (32 - jnp.clip(l32, 1, 31)).astype(jnp.uint32),
                  jnp.uint32(0))
    xr = x.reshape(S, B, 32, 2)
    lr = l32.reshape(S, B, 32, 2)
    a, b = xr[..., 0], xr[..., 1]
    la, lb = lr[..., 0], lr[..., 1]
    merged = a | (b >> jnp.clip(la, 0, 31).astype(jnp.uint32))
    mlen = la + lb
    return merged.reshape(S, B * 32), mlen.reshape(S, B * 32)


def make_huffman_luts(huff_enc_dc: np.ndarray, huff_enc_ac: np.ndarray):
    """Stack per-table-index encoder LUTs.

    huff_enc_dc: (ntab, 16) uint32  (len<<16 | code), indexed by size
    huff_enc_ac: (ntab, 256) uint32, indexed by (run<<4 | size)
    """
    return np.asarray(huff_enc_dc, np.uint32), np.asarray(huff_enc_ac, np.uint32)


def tokenize(coefs: jnp.ndarray, dc_prev_idx: np.ndarray,
             table_idx: np.ndarray, dc_lut: np.ndarray, ac_lut: np.ndarray):
    """Compute Huffman tokens for stream-ordered blocks.

    coefs:       (B, 64) int  quantized zig-zag coefficients, stream order
    dc_prev_idx: (B,) int32   stream index of DC predictor block (-1 = none);
                              static (from Geometry.stream_dc_prev)
    table_idx:   (B,) int32   Huffman table slot per block; static
    dc_lut:      (ntab, 16) uint32, ac_lut: (ntab, 256) uint32

    Returns (bits, lens): (B, 64) uint32 / (B, 64) int32.
    """
    B = coefs.shape[0]
    v = coefs.astype(jnp.int32)

    # DC differential prediction (F.1.1.5.1); resets encoded as idx -1
    dc = v[:, 0]
    prev = jnp.asarray(np.maximum(dc_prev_idx, 0))
    has_prev = jnp.asarray((dc_prev_idx >= 0))
    dc_pred = jnp.where(has_prev, dc[prev], 0)
    v = jnp.concatenate([(dc - dc_pred)[:, None], v[:, 1:]], axis=1)

    av = jnp.abs(v)
    size = 32 - jax.lax.clz(av)                      # bit category; 0 for v==0
    vb = jnp.where(v < 0, v - 1, v) & ((1 << size) - 1)

    idx = jax.lax.broadcasted_iota(jnp.int32, (B, 64), 1)
    nz = v != 0
    # last nonzero position at or before i (DC slot acts as run boundary)
    marker = jnp.where(nz | (idx == 0), idx, -1)
    last_incl = jax.lax.cummax(marker, axis=1)
    last_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), last_incl[:, :-1]], axis=1)
    run = idx - last_before - 1                       # zeros before position i
    # any nonzero strictly after position i
    suffix = jnp.flip(jax.lax.cummax(jnp.flip(nz.astype(jnp.int32), 1), axis=1), 1)
    has_after = jnp.concatenate(
        [suffix[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1) > 0

    is_dc = idx == 0
    is_code = nz & ~is_dc
    zero_run_incl = idx - last_before                 # zeros up to & incl. i
    is_zrl = (~nz) & ~is_dc & has_after & (zero_run_incl % 16 == 0)
    is_eob = (~nz) & (idx == 63)

    sym = jnp.where(is_dc, jnp.minimum(size, 15),
          jnp.where(is_code, ((run & 15) << 4) | size,
          jnp.where(is_zrl, 0xF0, 0)))

    tab = jnp.asarray(table_idx)[:, None]
    dc_entry = jnp.asarray(dc_lut)[tab[:, 0], sym[:, 0]]
    ac_entry = jnp.asarray(ac_lut).reshape(-1)[
        (tab * ac_lut.shape[1] + sym).reshape(B, 64)]
    entry = jnp.concatenate([dc_entry[:, None], ac_entry[:, 1:]], axis=1)

    clen = (entry >> 16).astype(jnp.int32)
    code = (entry & 0xFFFF).astype(jnp.uint32)
    bits = (code << jnp.minimum(size, 31).astype(jnp.uint32)) | vb.astype(jnp.uint32)
    lens = clen + size
    emit = is_dc | is_code | is_zrl | is_eob
    lens = jnp.where(emit, lens, 0)
    return bits, lens
