#!/usr/bin/env python
"""Decompose the xbd feed: preprocess | +pack | +transpose, plus
raw-input-read and color-only floors."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import sample

    h, w = 4320, 7680

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (h // 16, w // 16, 3), jnp.float32,
                                   0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = jax.block_until_ready(gen(jax.random.PRNGKey(7)))
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)
    geo = enc.resolve(frame, param, None)
    xbd_impl, _infos = enc_mod.make_rows_xbd_impl(geo)
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    def dtime(fn, n_hi=9, reps=3):
        def mk(n):
            @jax.jit
            def lp(raw):
                def body(i, c):
                    return fn(raw.at[0, 0, 0].set(c)).astype(jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(frame))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(frame))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    def consume(arrs):
        # barrier forces materialization; then a cheap sampled reduce
        arrs = jax.lax.optimization_barrier(tuple(arrs))
        acc = jnp.int32(0)
        for a in arrs:
            acc = acc + a.reshape(-1)[0].astype(jnp.int32)
        return acc

    def f_pre(raw):
        return consume(sample.preprocess(raw, geo, geo.param_image))

    def pack_lanes(p):
        return jax.lax.bitcast_convert_type(
            p.reshape(p.shape[0], -1, 4), jnp.uint32)

    def f_pack_only(raw):
        planes = sample.preprocess(raw, geo, geo.param_image)
        # pack WITHOUT preprocess barrier interference: same consume
        return consume([pack_lanes(planes[0])])

    def f_T_only(raw):
        planes = sample.preprocess(raw, geo, geo.param_image)
        p32 = pack_lanes(planes[0])
        nbh, nsr, rst = p32.shape[0] // 8, 120, 8
        v = p32.reshape(nbh, 8, nsr, rst, 2).transpose(3, 1, 4, 0, 2)
        return consume([v.reshape(rst * 16, -1)])

    def f_pack(raw):
        planes = sample.preprocess(raw, geo, geo.param_image)
        return consume([pack_lanes(p) for p in planes])

    def f_xbd(raw):
        return consume(xbd_impl(raw))

    def f_pre_y(raw):
        return consume([sample.preprocess(raw, geo, geo.param_image)[0]])

    def f_pre_c(raw):
        return consume(sample.preprocess(raw, geo, geo.param_image)[1:])

    def f_xbd_c(raw):
        return consume(xbd_impl(raw)[1:])

    for name, fn in (("preY", f_pre_y), ("preC", f_pre_c),
                     ("xbdC", f_xbd_c), ("preprocess", f_pre),
                     ("pre+pack", f_pack), ("pre+packY", f_pack_only),
                     ("pre+packY+T", f_T_only), ("pre+pack+T", f_xbd)):
        t0 = time.time()
        ms = dtime(fn)
        print(f"{name:12s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
