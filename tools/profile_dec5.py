#!/usr/bin/env python
"""Round-5 decode phase profiler (fetch-based delta method).

Measures, with the exact construction the compiled stream pipeline uses
(per-component class-specialized kernels, transposed IDCT tail):
  scan   — Pallas phase A (per-component calls)
  split  — phase B buffer split
  block  — Pallas phase C (per-component calls)
  post   — DC fixup + fused dequant/IDCT/postprocess
  full   — the whole pipeline fn

Usage: python tools/profile_dec5.py [HxW] [quality] [rst]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Decoder, Encoder, Parameters
    from gpujpeg_tpu.models import decoder as dec_mod
    from gpujpeg_tpu.ops import huffdec2
    from gpujpeg_tpu.stream import reader

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    rst = int(sys.argv[3]) if len(sys.argv) > 3 else -1
    print(f"backend={jax.default_backend()} {h}x{w} q{q} rst{rst}",
          file=sys.stderr)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = gen(jax.random.PRNGKey(7))
    enc = Encoder()
    enc.segment_info = True
    data = bytes(enc.encode(frame, Parameters(quality=q,
                                              restart_interval=rst)))
    print(f"stream {len(data)/1e6:.1f} MB", file=sys.stderr)

    dec = Decoder()
    t0 = time.time()
    (fn, words_np, nbits_np, geo, max_words, comp_widths, _sig,
     caps) = dec._stream_pipeline_parts(data)
    print(f"pipeline parts in {time.time()-t0:.0f}s  "
          f"nseg={geo.segment_count} bps={geo.max_blocks_per_seg} "
          f"W={words_np.shape[1]} caps={caps} cw={comp_widths}",
          file=sys.stderr)

    ps = reader.parse(data)
    plan = dec._plan_for(geo, ps)
    nseg = geo.segment_count
    bps = plan.bps
    kmode = dec_mod.deckernel_mode()
    ranges_c = plan.comp_class_ranges()
    words = jnp.asarray(words_np)
    nbits = jnp.asarray(nbits_np)
    dc_li = jnp.asarray(plan.dc_luma_row.astype(np.int32))
    ac_li = jnp.asarray(plan.ac_luma_row.astype(np.int32))
    bdc_i = jnp.asarray(plan.blk_dc_luma.astype(np.int32))[None, :]
    bac_i = jnp.asarray(plan.blk_ac_luma.astype(np.int32))[None, :]
    bva_i = jnp.asarray(plan.blk_valid.astype(np.int32))[None, :]
    bps_d = jnp.asarray(plan.blk_valid.reshape(nseg, bps)
                        .sum(axis=1).astype(np.int32))
    qt = jnp.asarray(np.stack([
        ps.quant_tables[ps.quant_map[c.index]] for c in geo.components
    ]).astype(np.float32))

    W = int(words_np.shape[1])
    wcs = ([wc for (_, _, wc) in comp_widths] if comp_widths
           else None)

    def scan_phase(wd):
        wd = dec_mod._bswap32(wd)
        if ranges_c is not None and wcs is not None:
            parts = []
            for (lo, hi, cls), wc in zip(ranges_c, wcs):
                fc = plan.kernel_scan_fn(wc, hi - lo, False, cls)
                bs, _e = fc(wd[lo:hi, :wc], nbits[lo:hi], bps_d[lo:hi],
                            dc_li[lo:hi], ac_li[lo:hi])
                parts.append(bs)
            return jnp.concatenate(parts)
        fc = plan.kernel_scan_fn(W, nseg, False)
        bs, _e = fc(wd, nbits, bps_d, dc_li, ac_li)
        return bs

    bstart0 = jax.jit(scan_phase)(words)
    jax.block_until_ready(bstart0)
    K = int(caps[-1]) if caps else W
    split_fn = dec._split_fn(bps, caps) if caps else None
    direct = bps == 1
    sr_parts = (None if direct else dec_mod._segrow_parts(
        plan, geo, ranges_c, None, W, kmode, wcs=wcs))
    bdc_i1 = bdc_i
    bac_i1 = bac_i
    bva_i1 = bva_i

    def segrow_phase(wd, bstart):
        return dec_mod._segrow_call(sr_parts, geo, dec_mod._bswap32(wd),
                                    bstart, bdc_i1, bac_i1, bva_i1)[0]

    def split_phase(wd, bstart):
        wd = dec_mod._bswap32(wd)
        return split_fn(wd, bstart).reshape(nseg * bps, -1)

    def block_phase(bufs_t, blen_r):
        if ranges_c is not None:
            cts = []
            for lo, hi, cls in ranges_c:
                fc = plan.kernel_block_fn(K, False, cls)
                ct, _e = fc(bufs_t[:, lo * bps:hi * bps],
                            blen_r[:, lo * bps:hi * bps],
                            bdc_i[:, lo * bps:hi * bps],
                            bac_i[:, lo * bps:hi * bps],
                            bva_i[:, lo * bps:hi * bps])
                cts.append(ct)
            return jnp.concatenate(cts, axis=1)
        fc = plan.kernel_block_fn(K, False)
        ct, _e = fc(bufs_t, blen_r, bdc_i, bac_i, bva_i)
        return ct

    from gpujpeg_tpu.ops import prepost_kernel as ppk

    idct_fn_t = dec_mod._make_idct_post_fn_t(geo, ppk.dpost_generation())

    def post_phase(coefs_t):
        ct = dec_mod._dc_fixup_t(coefs_t, plan.comp_pattern, nseg, bps)
        return idct_fn_t(ct, qt)

    if not direct and split_fn is not None:
        bufs0 = jax.jit(split_phase)(words, bstart0)
        bufs0_t = jax.block_until_ready(bufs0.T)
        blen0 = (bstart0[:, 1:] - bstart0[:, :-1]).reshape(1, nseg * bps)
        blen0 = jax.block_until_ready(blen0)
        coefs0_t = jax.block_until_ready(
            jax.jit(block_phase)(bufs0_t, blen0))
    elif direct:
        bufs0_t = jax.block_until_ready(dec_mod._bswap32_dev(words).T)
        blen0 = jax.block_until_ready(nbits[None, :])
        coefs0_t = jax.block_until_ready(
            jax.jit(block_phase)(bufs0_t, blen0))
    else:
        bufs0_t = blen0 = None
        coefs0_t = jax.block_until_ready(
            jax.jit(segrow_phase)(words, bstart0))

    def delta(mk_loop, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            loop = mk_loop(n)
            _ = np.asarray(loop(*args))
            best = float("inf")
            for _r in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(loop(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    def mk(fnc, perturb):
        def mk_loop(n):
            @jax.jit
            def loop(*args):
                def body(i, carry):
                    r = fnc(*perturb(args, carry))
                    r = r[0] if isinstance(r, (list, tuple)) else r
                    # strided sample over the WHOLE result: a [0]-only
                    # carry lets XLA dead-code-eliminate every
                    # per-component call not feeding element 0
                    # multi-dim static picks: a reshape(-1) over a
                    # tiled TPU layout materializes a full relayout
                    # (~33 ms for the 8K image!), so index the original
                    # shape directly, spreading picks over EVERY dim
                    # (a flat stride that is a multiple of a dim lands
                    # every pick at index 0 of that dim and lets XLA
                    # DCE whole per-component calls)
                    prng = np.random.default_rng(42)
                    picks = []
                    for k in range(8):
                        idx = tuple(int(prng.integers(0, d))
                                    for d in r.shape)
                        picks.append(r[idx])
                    return jnp.max(jnp.stack(picks)).astype(jnp.int32)

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return loop
        return mk_loop

    u32 = lambda c: c.astype(jnp.uint32)
    res = {}
    res["scan"] = delta(
        mk(scan_phase, lambda a, c: (a[0].at[0, 0].set(u32(c)),)),
        (words,))
    if not direct and split_fn is not None:
        res["split"] = delta(
            mk(split_phase,
               lambda a, c: (a[0].at[0, 0].set(u32(c)), a[1])),
            (words, bstart0))
    if bufs0_t is not None:
        res["block"] = delta(
            mk(block_phase,
               lambda a, c: (a[0].at[0, 0].set(u32(c)), a[1])),
            (bufs0_t, blen0))
    if sr_parts is not None:
        res["segrow"] = delta(
            mk(segrow_phase,
               lambda a, c: (a[0].at[0, 0].set(u32(c)), a[1])),
            (words, bstart0))
    res["post"] = delta(
        mk(post_phase, lambda a, c: (a[0].at[0, 0].set(c.astype(jnp.int16)),)),
        (coefs0_t,))

    def huff_phase(wd):
        bstart = scan_phase(wd)
        bufs = split_fn(dec_mod._bswap32(wd), bstart) \
            .reshape(nseg * bps, -1)
        blen = (bstart[:, 1:] - bstart[:, :-1]).reshape(1, nseg * bps)
        return block_phase(bufs.T, blen)

    if not direct and split_fn is not None:
        res["huff(scan+split+block)"] = delta(
            mk(huff_phase, lambda a, c: (a[0].at[0, 0].set(u32(c)),)),
            (words,))

    def mk_full(n):
        @jax.jit
        def loop(wd, nb):
            def body(i, carry):
                img, _needs = fn(wd.at[0, 0].set(carry.astype(jnp.uint32)),
                                 nb)
                return img.reshape(-1)[0].astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    res["full"] = delta(mk_full, (words, nbits))
    total = sum(v for k, v in res.items() if k != "full")
    print({k: round(v, 2) for k, v in res.items()},
          f"phase-sum {total:.2f}")


if __name__ == "__main__":
    main()
