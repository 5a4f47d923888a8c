#!/usr/bin/env python
"""Preprocessor stage split (round 4): where do the 2.83 ms at 8K go?

  p0  XLA RGBX pad + u32 bitcast alone
  p1  pallas kernel alone on a fixed padded px input
  p2  full preprocess_packed chain
  p3  xq relayout alone on fixed packed planes (the 16-word transpose)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import prepost_kernel
    from gpujpeg_tpu.utils.geometry import get_geometry

    h, w = (4320, 7680) if len(sys.argv) < 2 else \
        map(int, sys.argv[1].split("x"))
    q = 75
    rng = np.random.default_rng(0)
    frame_np = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    frame = jax.block_until_ready(jnp.asarray(frame_np))

    enc = Encoder()
    pi = enc.resolve(frame_np, Parameters(quality=q, restart_interval=-1),
                     None).param_image
    geo = enc.resolve(frame_np, Parameters(quality=q, restart_interval=-1),
                      None)

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

    def mk(f, seed_fn):
        def make(n):
            @jax.jit
            def lp(x):
                def body(i, c):
                    r = f(seed_fn(x, c))
                    # barrier forces full materialization (XLA slices
                    # through pure-layout ops when only [0] is consumed)
                    r = jax.lax.optimization_barrier(r)
                    return r.reshape(-1)[0]
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            return lp
        return make

    seed_u8 = lambda x, c: x.at[0, 0, 0].set(c.astype(jnp.uint8))
    seed_u32 = lambda x, c: x.at[0, 0].set(c)

    def p0(raw):
        rgbx = jnp.pad(raw, ((0, 0), (0, 0), (0, 1)))
        return jax.lax.bitcast_convert_type(rgbx, jnp.uint32) \
            .astype(jnp.uint32)

    def barrier_sum(outs):
        outs = jax.lax.optimization_barrier(outs)
        return sum(o.reshape(-1)[0] for o in outs).astype(jnp.uint32)

    print(f"p0 pad+bitcast : {dtime(mk(p0, seed_u8), (frame,)):7.3f} ms",
          flush=True)

    def p2(raw):
        return barrier_sum(prepost_kernel.preprocess_packed(raw, geo, pi))

    print(f"p2 full pre    : {dtime(mk(p2, seed_u8), (frame,)):7.3f} ms",
          flush=True)

    # p1: kernel alone on fixed px
    px = jax.block_until_ready(jax.jit(p0)(frame))

    from gpujpeg_tpu.ops.prepost_kernel import (_cached_pre_kernel,
                                                _col_chunk, _pre_row_chunk)
    CW = _col_chunk(w, 1)
    R = _pre_row_chunk(h, w, 1, CW, 3)
    kfn = _cached_pre_kernel(pi.color_space,
                             geo.param.color_space_internal,
                             (0, 1, 2), 1, R, CW, h, w, False)

    def p1(pxx):
        return barrier_sum(kfn(pxx))

    print(f"p1 kernel only : {dtime(mk(p1, seed_u32), (px,)):7.3f} ms  "
          f"(R={R}, CW={CW})", flush=True)

    # p3: xq relayout on fixed packed planes
    packed = jax.block_until_ready(jax.jit(
        lambda r: prepost_kernel.preprocess_packed(r, geo, pi))(frame))
    c0 = geo.components[0]
    nbh, nsr = c0.data_height // 8, (c0.data_width // 8) // 8

    def p3(p):
        x = p.reshape(nbh, 8, nsr, 16).transpose(0, 2, 1, 3) \
            .reshape(nbh * nsr, 128)
        return x.reshape(-1)[0]

    def mk3(n):
        @jax.jit
        def lp(*ps):
            def body(i, c):
                t = jnp.uint32(0)
                for p in ps:
                    x = p.at[0, 0].set(c)
                    x = x.reshape(nbh, 8, nsr, 16).transpose(0, 2, 1, 3) \
                        .reshape(nbh * nsr, 128)
                    x = jax.lax.optimization_barrier(x)
                    t = t + x.reshape(-1)[0]
                return t
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp

    print(f"p3 xq relayout : {dtime(mk3, tuple(packed)):7.3f} ms "
          "(3 comps)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
