#!/usr/bin/env python
"""Bisect tokenize_rows cost at 8K geometry on the real TPU.

Variants knock out pieces to attribute VPU op cost:
  full      tokenize_rows(pairs=True) as shipped
  no_entry  AC entry select chain replaced by a constant
  no_scan   cummax run/suffix scans replaced by constants
  no_pairs  pairs merge disabled (raw 64-slot output)
  min       only abs/clz/value-bits
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.utils import tables

    S, Bk = 194400 // 3, 8     # one component's share of the 8K geometry
    print(f"backend={jax.default_backend()} rows={S} blocks/row={Bk}",
          file=sys.stderr)

    dc_lut = tables.huffman_encode_lut(
        *tables.huffman_spec_for("dc", True), 16)[:12]
    ac_lut = tables.huffman_encode_lut(
        *tables.huffman_spec_for("ac", True), 256).reshape(16, 16)
    aff = tables.affine_ac_runtime(*tables.affine_params_for_quality(75, True))

    key = jax.random.PRNGKey(0)
    # plausible quantized coefficients: mostly zero, small values
    coefs = jax.random.randint(key, (S, Bk, 64), -40, 40, jnp.int16)
    mask = jax.random.uniform(jax.random.PRNGKey(1), (S, Bk, 64)) < 0.85
    coefs = jnp.where(mask, 0, coefs)
    coefs = jax.block_until_ready(coefs)
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    def variant(which):
        def tok(v):
            dc = v[:, :, 0]
            pred = jnp.pad(dc, ((0, 0), (1, 0)))[:, :-1]
            v = jnp.concatenate([(dc - pred)[:, :, None], v[:, :, 1:]],
                                axis=2)
            av = jnp.abs(v)
            size = (16 - jax.lax.clz(av)).astype(jnp.int16)
            vb16 = (jnp.where(v < 0, v - 1, v).astype(jnp.uint16)
                    & ((jnp.uint16(1)
                        << jnp.clip(size, 0, 15).astype(jnp.uint16)) - 1))
            if which == "min":
                return vb16.astype(jnp.uint32), size.astype(jnp.int32)

            idx = jax.lax.broadcasted_iota(jnp.int16, v.shape, 2)
            nz = v != 0
            if which == "no_scan":
                run = jnp.zeros_like(size)
                has_after = nz
            else:
                marker = jnp.where(nz | (idx == 0), idx, jnp.int16(-1))
                last_incl = jax.lax.cummax(marker, axis=2)
                last_before = jnp.concatenate(
                    [jnp.zeros((S, Bk, 1), jnp.int16),
                     last_incl[:, :, :-1]], axis=2)
                run = (idx - last_before - 1).astype(jnp.int16)
                suffix = jnp.flip(jax.lax.cummax(
                    jnp.flip(nz.astype(jnp.int8), 2), axis=2), 2)
                has_after = jnp.concatenate(
                    [suffix[:, :, 1:],
                     jnp.zeros((S, Bk, 1), jnp.int8)], axis=2) > 0

            is_dc = idx == 0
            is_code = nz & ~is_dc
            zri = idx - (run * 0 if which == "no_scan" else 0) - 0
            is_zrl = (~nz) & ~is_dc & has_after & (zri % 16 == 0)
            is_eob = (~nz) & (idx == 63)
            run16 = jnp.where(is_code, run & 15,
                              jnp.where(is_zrl, jnp.int16(15), jnp.int16(0)))
            size16 = jnp.where(is_code, size, jnp.int16(0))

            if which == "no_entry":
                entry = jnp.full(v.shape, 0x0004_000A, jnp.uint32)
            elif which == "affine":
                t0, rt, al, eob_e, zrl_e = aff
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
                    (len_a.astype(jnp.uint32) << 16)
                    | code_a.astype(jnp.uint32))
                entry = jnp.where(is_zrl, jnp.uint32(zrl_e), entry)
                entry = jnp.where(is_eob, jnp.uint32(eob_e), entry)
            else:
                ac_rows = np.asarray(ac_lut, np.uint32)
                entry = jnp.zeros(v.shape, jnp.uint32)
                for r in range(16):
                    cand = jnp.asarray(ac_rows[r])[size16]
                    entry = jnp.where(run16 == r, cand, entry)
                dc_entry = jnp.asarray(np.asarray(dc_lut, np.uint32))[
                    jnp.minimum(size[:, :, 0], 11).astype(jnp.int16)]
                entry = jnp.concatenate([dc_entry[:, :, None],
                                         entry[:, :, 1:]], axis=2)

            clen = (entry >> 16).astype(jnp.int16)
            code = (entry & 0xFFFF).astype(jnp.uint32)
            size32 = jnp.clip(size, 0, 15).astype(jnp.uint32)
            bits = (code << size32) | vb16.astype(jnp.uint32)
            lens = (clen + size).astype(jnp.int16)
            emit = is_dc | is_code | is_zrl | is_eob
            lens = jnp.where(emit, lens, jnp.int16(0))
            if which == "no_pairs":
                return bits.reshape(S, -1), lens.reshape(S, -1).astype(jnp.int32)
            l32 = lens.astype(jnp.int32)
            x = jnp.where(
                l32 > 0,
                bits << (32 - jnp.clip(l32, 1, 31)).astype(jnp.uint32),
                jnp.uint32(0))
            xr = x.reshape(S, Bk, 32, 2)
            lr = l32.reshape(S, Bk, 32, 2)
            a, b = xr[..., 0], xr[..., 1]
            la, lb = lr[..., 0], lr[..., 1]
            merged = a | (b >> jnp.clip(la, 0, 31).astype(jnp.uint32))
            mlen = la + lb
            return merged.reshape(S, -1), mlen.reshape(S, -1)
        return tok

    def dtime(tok, n_hi=9, reps=3):
        def mk(n):
            @jax.jit
            def lp(v):
                def body(i, carry):
                    b, l = tok(v.at[0, 0, 0].set(carry))
                    return (b.reshape(-1)[0]
                            + l.reshape(-1)[0].astype(jnp.uint32)
                            ).astype(jnp.int16)
                return jax.lax.fori_loop(0, n, body, jnp.int16(0))
            return lp
        times = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(coefs))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(coefs))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    for which in ["full", "affine", "no_entry"]:
        ms = dtime(variant(which))
        print(f"{which:10s} {ms * 3:8.2f} ms (x3 components)")


if __name__ == "__main__":
    main()
