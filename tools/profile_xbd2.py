#!/usr/bin/env python
"""Stage breakdown of the PRODUCTION 8K encode path (mega + fused DCT):

  (1) preprocess_packed kernel alone
  (2) xbd feed = preprocess + block-diagonal relayout
  (3) entropy_fused_u8 kernels on fixed xbd inputs
  (4) full pipeline (make_full_encode_fn)

Usage: python tools/profile_xbd2.py [HxW] [quality]
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
    from gpujpeg_tpu.ops import fusedpack, prepost_kernel
    from gpujpeg_tpu.utils import tables

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    print(f"backend={jax.default_backend()} {h}x{w} q{q}", file=sys.stderr,
          flush=True)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = gen(jax.random.PRNGKey(7))
    jax.block_until_ready(frame)

    enc = Encoder()
    param = Parameters(quality=q, restart_interval=-1)
    t0 = time.time()
    geo, res, meta = enc.encode_to_device(frame, param)
    caps = enc._caps[geo]
    print(f"first frame {time.time()-t0:.1f}s caps={caps}", file=sys.stderr,
          flush=True)
    assert isinstance(caps, enc_mod.MegaCaps), caps

    xbd_impl, xbd_infos = enc_mod.make_rows_xbd_impl(geo)
    consts = tables.entropy_kernel_consts(geo.param.quality)
    full_fn = enc_mod.make_full_encode_fn(geo, caps)

    def dtime(make_loop, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            lp = make_loop(n)
            jax.block_until_ready(lp(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    def mk_pre(n):
        @jax.jit
        def lp(raw):
            def body(i, carry):
                packed = prepost_kernel.preprocess_packed(
                    raw.at[0, 0, 0].set(carry), geo, geo.param_image)
                return sum(p.reshape(-1)[0] for p in packed) \
                    .astype(jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    def mk_xbd(n):
        @jax.jit
        def lp(raw):
            def body(i, carry):
                xbds = xbd_impl(raw.at[0, 0, 0].set(carry))
                return sum(x.reshape(-1)[0] for x in xbds) \
                    .astype(jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    xbds0 = jax.jit(xbd_impl)(frame)
    xbds0 = jax.block_until_ready(xbds0)
    stat = []
    for info in xbd_infos:
        lt = np.full((1, info["S"]), 1 if info["luma"] else 0, np.int32)
        stat.append((jnp.asarray(info["valid"]), jnp.asarray(lt),
                     info["rst"], info["dct_key"],
                     info.get("xq", False)))

    def mk_entropy(n):
        @jax.jit
        def lp(*xbds):
            def body(i, carry):
                tot = jnp.uint8(0)
                for xbd, (vt, lt, rstm, dk, xq) in zip(xbds, stat):
                    r, ob, nd = fusedpack.entropy_fused_u8(
                        xbd.at[0, 0].set(carry.astype(jnp.uint32)), vt,
                        lt, rstm, z_cap=caps.z_cap, w_out=caps.w_out,
                        consts=consts, dct_key=dk,
                        compact_after=caps.compact, xq=xq)
                    tot = (tot + r.reshape(-1)[0].astype(jnp.uint8)) \
                        .astype(jnp.uint8)
                return tot
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    def mk_full(n):
        @jax.jit
        def lp(raw):
            def body(i, carry):
                r = full_fn(raw.at[0, 0, 0].set(carry))
                return r["meta"][-1].astype(jnp.uint8)
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    def mk_chain(n):
        # xbd feed + entropy kernels from raw, NO meta reduction: the
        # FULL-minus-stages gap is either here (fusion/dispatch) or in
        # the meta sum/concat
        @jax.jit
        def lp(raw):
            def body(i, carry):
                xbds = xbd_impl(raw.at[0, 0, 0].set(carry))
                tot = jnp.uint8(0)
                for xbd, (vt, lt, rstm, dk, xq) in zip(xbds, stat):
                    r, ob, nd = fusedpack.entropy_fused_u8(
                        xbd, vt, lt, rstm, z_cap=caps.z_cap,
                        w_out=caps.w_out, consts=consts, dct_key=dk,
                        compact_after=caps.compact, xq=xq)
                    tot = (tot + r.reshape(-1)[0].astype(jnp.uint8)) \
                        .astype(jnp.uint8)
                return tot
            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
        return lp

    jobs = [("pre_packed", mk_pre, (frame,)),
            ("xbd feed", mk_xbd, (frame,)),
            ("entropy_u8", mk_entropy, tuple(xbds0)),
            ("chain", mk_chain, (frame,)),
            ("FULL", mk_full, (frame,))]
    for name, mk, args in jobs:
        t0 = time.time()
        ms = dtime(mk, args)
        print(f"{name:12s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
