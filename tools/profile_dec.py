#!/usr/bin/env python
"""Per-phase device timings for the decode pipeline on the real TPU.

Usage: python tools/profile_dec.py [HxW] [quality]
Phases: (A) boundary scan, (B) buffer split, (C) block decode,
(I) IDCT+postprocess, FULL fused pipeline.
Delta method (n=1 vs n=N inside one jit) cancels dispatch/fetch constants.
"""

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
    from gpujpeg_tpu.stream import reader, segments as segprep

    size = sys.argv[1] if len(sys.argv) > 1 else "1080x1920"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    print(f"backend={jax.default_backend()} {h}x{w} q{q}", file=sys.stderr)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = np.asarray(gen(jax.random.PRNGKey(7)))
    enc = Encoder()
    data = enc.encode(frame, Parameters(quality=q, restart_interval=-1))
    print(f"stream {len(data)} bytes", file=sys.stderr)

    dec = Decoder()
    t0 = time.time()
    fn, words, nbits = dec.compile_stream_pipeline(bytes(data))
    out = fn(words, nbits)
    jax.block_until_ready(out)
    print(f"pipeline compiled in {time.time()-t0:.1f}s", file=sys.stderr)

    # rebuild the plan pieces for per-phase timing
    ps = reader.parse(bytes(data))
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, dec._output_request,
                                    dec.alignment_bytes)
    from gpujpeg_tpu.utils.geometry import get_geometry
    geo = get_geometry(param, out_pi.with_(width_padding=0))
    plan = dec._plan_for(geo, ps)
    caps = plan.split_caps
    bps = plan.bps
    nseg = geo.segment_count
    blocks_per_seg = jnp.asarray(
        plan.blk_valid.reshape(nseg, bps).sum(axis=1).astype(np.int32))
    print(f"nseg={nseg} bps={bps} W={words.shape[1]} caps={caps}",
          file=sys.stderr)

    scan_fn = plan.scan_fn
    split_fn = dec._split_fn(bps, caps)
    block_fn = plan.block_fn()
    dc_l = jnp.asarray(plan.dc_luma_row)
    ac_l = jnp.asarray(plan.ac_luma_row)
    bdc = jnp.asarray(plan.blk_dc_luma)
    bac = jnp.asarray(plan.blk_ac_luma)
    bva = jnp.asarray(plan.blk_valid)

    bstart0, _ = scan_fn(words, nbits, blocks_per_seg, dc_l, ac_l)
    bstart0 = jax.block_until_ready(bstart0)
    bufs0 = split_fn(words, bstart0).reshape(nseg * bps, -1)
    bufs0 = jax.block_until_ready(bufs0)
    blen0 = jax.block_until_ready(
        (bstart0[:, 1:] - bstart0[:, :-1]).reshape(nseg * bps))

    def dtime(make_loop, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            lp = make_loop(n)
            r = lp(*args)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = lp(*args)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    def mk_scan(n):
        @jax.jit
        def lp(words, nbits):
            def body(i, carry):
                bs, err = scan_fn(words.at[0, 0].set(carry), nbits,
                                  blocks_per_seg, dc_l, ac_l)
                return bs.reshape(-1)[0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp

    def mk_split(n):
        @jax.jit
        def lp(words, bstart):
            def body(i, carry):
                b = split_fn(words.at[0, 0].set(carry), bstart)
                return b.reshape(-1)[0]
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp

    def mk_block(n):
        @jax.jit
        def lp(bufs, blen):
            def body(i, carry):
                c, e = block_fn(bufs.at[0, 0].set(carry), blen,
                                bdc, bac, bva)
                return c.reshape(-1)[0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp

    kfn = plan.kernel_block_fn(int(bufs0.shape[1]), False)
    bdc_i = jnp.asarray(plan.blk_dc_luma.astype(np.int32))[None, :]
    bac_i = jnp.asarray(plan.blk_ac_luma.astype(np.int32))[None, :]
    bva_i = jnp.asarray(plan.blk_valid.astype(np.int32))[None, :]
    bufs0_t = jax.block_until_ready(bufs0.T)
    blen0_r = jax.block_until_ready(blen0[None, :])

    def mk_ckern(n):
        @jax.jit
        def lp(bufs_t, blen):
            def body(i, carry):
                c, e = kfn(bufs_t.at[0, 0].set(carry), blen,
                           bdc_i, bac_i, bva_i)
                return c.reshape(-1)[0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp

    idct_fn = dec_mod._make_idct_post_fn(geo)
    qtabs = jnp.asarray(np.stack([
        ps.quant_tables[ps.quant_map[c.index]] for c in geo.components
    ]).astype(np.float32))
    coefs0, _ = block_fn(bufs0, blen0, bdc, bac, bva)
    coefs0 = jax.block_until_ready(
        dec_mod._dc_fixup(coefs0.reshape(nseg, bps, 64), plan.comp_pattern))

    def mk_idct(n):
        @jax.jit
        def lp(coefs):
            def body(i, carry):
                o = idct_fn(coefs.at[0, 0, 0].set(carry), qtabs)
                o = o[0] if isinstance(o, (list, tuple)) else o
                return o.reshape(-1)[0].astype(jnp.int16)
            return jax.lax.fori_loop(0, n, body, jnp.int16(0))
        return lp

    idct_t = None
    if kfn is not None and not geo.interleaved:
        idct_t_fn = dec_mod._make_idct_post_fn_t(geo)
        coefs_t0, _e = kfn(bufs0_t, blen0_r, bdc_i, bac_i, bva_i)
        coefs_t0 = jax.block_until_ready(
            dec_mod._dc_fixup_t(coefs_t0, plan.comp_pattern, nseg, bps))

        def mk_idct_t(n):
            @jax.jit
            def lp(ct):
                def body(i, carry):
                    o = idct_t_fn(ct.at[0, 0].set(carry), qtabs)
                    o = o[0] if isinstance(o, (list, tuple)) else o
                    return o.reshape(-1)[0].astype(jnp.int16)
                return jax.lax.fori_loop(0, n, body, jnp.int16(0))
            return lp
        idct_t = (mk_idct_t, (coefs_t0,))

    def mk_full(n):
        @jax.jit
        def lp(words, nbits):
            def body(i, carry):
                o = fn(words.at[0, 0].set(carry), nbits)
                o = o[0] if isinstance(o, (list, tuple)) else o
                return o.reshape(-1)[0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp

    jobs = [("A scan", mk_scan, (words, nbits)),
            ("B split", mk_split, (words, bstart0)),
            ("C block", mk_block, (bufs0, blen0)),
            ("I idct+post", mk_idct, (coefs0,)),
            ("FULL", mk_full, (words, nbits))]
    if kfn is not None:
        jobs.insert(3, ("C kernel", mk_ckern, (bufs0_t, blen0_r)))
    if idct_t is not None:
        jobs.insert(-1, ("I idct_t+post", idct_t[0], idct_t[1]))
    for name, mk, args in jobs:
        t0 = time.time()
        ms = dtime(mk, args)
        print(f"{name:12s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
