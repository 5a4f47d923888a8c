#!/usr/bin/env python
"""Per-stage device timings for the encode pipeline on the real TPU.

Usage: python tools/profile_stages.py [HxW] [quality]
Stages: (a) preprocess+DCT, (b) +tokenize, (c) pack+stuff only, (d) full.
Delta method (n=1 vs n=N inside one jit) cancels dispatch/fetch constants.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import dct, fusedpack, sample, tokens as tok
    from gpujpeg_tpu.utils import tables

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    print(f"backend={jax.default_backend()} {h}x{w} q{q}", file=sys.stderr)

    # synth frame
    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (h // 16, w // 16, 3), jnp.float32,
                                   0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = gen(jax.random.PRNGKey(7))
    jax.block_until_ready(frame)
    # sacrificial fetch
    t0 = time.time()
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    print(f"sacrificial fetch {time.time()-t0:.1f}s", file=sys.stderr)

    enc = Encoder()
    param = Parameters(quality=q, restart_interval=-1)
    t0 = time.time()
    geo, res, meta = enc.encode_to_device(frame, param)
    print(f"first frame {time.time()-t0:.1f}s  total_bytes={meta[-1]}",
          file=sys.stderr)
    caps = enc._caps[geo]
    print(f"caps={caps}", file=sys.stderr)
    print(f"nseg={geo.segment_count if geo.interleaved else sum(c.segment_count for c in geo.components)} "
          f"T={enc_mod.token_slots(geo)}", file=sys.stderr)

    mega = isinstance(caps, enc_mod.MegaCaps)
    tokens_impl = enc_mod.make_rows_tokens_impl(geo)
    qtabs, dc_luts, ac_luts, _aff = enc_mod._component_luts(geo.param.quality)

    def predct(raw):
        planes = sample.preprocess(raw, geo, geo.param_image)
        outs = []
        for c in geo.components:
            outs.append(dct.fdct_quantize(planes[c.index],
                                          qtabs[c.table_index]))
        return outs

    full_fn = enc_mod.make_full_encode_fn(geo, caps)

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

    # (a) preprocess + DCT (sum-forced: a single-element consumer lets XLA
    # DCE whole components)
    def mk_predct(n):
        @jax.jit
        def lp(raw):
            def body(i, carry):
                outs = predct(raw.at[0, 0, 0].set(carry))
                return sum(jnp.sum(o.astype(jnp.int32)) for o in outs
                           ).astype(jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    # (b) preprocess + DCT + tokenize
    def mk_tokens(n):
        @jax.jit
        def lp(raw):
            def body(i, carry):
                bits, lens = tokens_impl(raw.at[0, 0, 0].set(carry))
                return (jnp.sum(lens) + jnp.sum(bits.astype(jnp.int32))
                        ).astype(jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    # (c) entropy stage only, on fixed inputs
    if mega:
        coefs_impl = enc_mod.make_rows_coefs_impl(geo)
        consts = tables.entropy_kernel_consts(geo.param.quality)
        rst_mega = enc_mod.mega_rst_marker(geo)
        ct0, vt0, lt0 = jax.jit(coefs_impl)(frame)
        ct0 = jax.block_until_ready(ct0)
        vt0 = jnp.asarray(vt0)
        lt0 = jnp.asarray(lt0)

        def mk_coefs(n):
            @jax.jit
            def lp(raw):
                def body(i, carry):
                    ct, _v, _l = coefs_impl(raw.at[0, 0, 0].set(carry))
                    return ct.reshape(-1)[0].astype(jnp.uint8)
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp

        def mk_pack(n):
            @jax.jit
            def lp(ct, _unused):
                def body(i, carry):
                    rows, ob, needs = fusedpack.entropy_fused(
                        ct.at[0, 0].set(carry), vt0, lt0, rst_mega,
                        z_cap=caps.z_cap, w_out=caps.w_out, consts=consts,
                        compact_after=caps.compact)
                    return rows.reshape(-1)[0].astype(jnp.int16)
                return jax.lax.fori_loop(0, n, body, jnp.int16(0))
            return lp

        def mk_chain(n):
            @jax.jit
            def lp(raw):
                def body(i, carry):
                    ct, vt, lt = coefs_impl(raw.at[0, 0, 0].set(carry))
                    rows, ob, needs = fusedpack.entropy_fused(
                        ct, jnp.asarray(vt), jnp.asarray(lt),
                        rst_mega, z_cap=caps.z_cap,
                        w_out=caps.w_out, consts=consts,
                        compact_after=caps.compact)
                    return rows.reshape(-1)[0].astype(jnp.uint8)
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp

        def mk_chain_meta(n):
            scan_first = geo.scan_seg_bounds[:-1].astype(np.int32)
            scan_last = (geo.scan_seg_bounds[1:] - 1).astype(np.int32)

            @jax.jit
            def lp(raw):
                def body(i, carry):
                    ct, vt, lt = coefs_impl(raw.at[0, 0, 0].set(carry))
                    rows, ob, needs = fusedpack.entropy_fused(
                        ct, jnp.asarray(vt), jnp.asarray(lt),
                        rst_mega, z_cap=caps.z_cap,
                        w_out=caps.w_out, consts=consts,
                        compact_after=caps.compact)
                    cs = jnp.cumsum(ob)
                    meta = jnp.concatenate([
                        needs, (cs - ob)[jnp.asarray(scan_first)],
                        cs[jnp.asarray(scan_last)], cs[-1:],
                    ]).astype(jnp.int32)
                    return (meta[-1] + rows.reshape(-1)[0].astype(
                        jnp.int32)).astype(jnp.uint8)
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp

        bits0, lens0 = ct0, ct0
    else:
        bits0, lens0 = jax.jit(tokens_impl)(frame)
        bits0, lens0 = jax.block_until_ready((bits0, lens0))

        def mk_pack(n):
            @jax.jit
            def lp(bits, lens):
                def body(i, carry):
                    rows, ob, needs = fusedpack.pack_stuff_fused(
                        bits.at[0, 0].set(carry), lens, geo.rst_marker,
                        l0=caps.l0, z_cap=caps.z_cap, w_out=caps.w_out)
                    return rows.reshape(-1)[0]
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            return lp

    # (d) full pipeline
    def mk_full(n):
        @jax.jit
        def lp(raw):
            def body(i, carry):
                r = full_fn(raw.at[0, 0, 0].set(carry))
                return r["meta"][-1].astype(jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    jobs = [("pre+dct", mk_predct, (frame,)),
            ("pack+stuff", mk_pack, (bits0, lens0)),
            ("FULL", mk_full, (frame,))]
    if mega:
        jobs.insert(1, ("coefs_t (mega)", mk_coefs, (frame,)))
        jobs.insert(3, ("coefs+kernel", mk_chain, (frame,)))
        jobs.insert(4, ("chain+meta", mk_chain_meta, (frame,)))
    else:
        jobs.insert(1, ("pre+dct+tok", mk_tokens, (frame,)))
    for name, mk, args in jobs:
        t0 = time.time()
        ms = dtime(mk, args)
        print(f"{name:14s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
