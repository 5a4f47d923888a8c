#!/usr/bin/env python
"""Microbenchmark: Pallas in-kernel transpose vs XLA transpose for the
xbd-style relayout, at 8K-luma scale ((4320, 1920) u32 -> (128, 64800))."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W4 = 4320, 1920          # packed u32 luma plane at 8K
    nbh, nsr, rst = H // 8, 120, 8
    S = nbh * nsr
    x = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(0), (H, W4), 0, 1 << 30,
                           jnp.int32).astype(jnp.uint32))
    _ = np.asarray(jax.jit(lambda v: v + 1)(jnp.ones((8, 128))))

    def dtime(fn, arg, n_hi=9):
        def mk(n):
            @jax.jit
            def lp(a):
                def body(i, c):
                    r = fn(a.at[0, 0].set(c.astype(a.dtype)))
                    return r.reshape(-1)[0].astype(jnp.uint32)
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(arg))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(arg))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    # (a) XLA xbd-style 5D transpose
    def xla_t(p32):
        v = p32.reshape(nbh, 8, nsr, rst, 2)
        return v.transpose(3, 1, 4, 0, 2).reshape(rst * 16, nbh * nsr)

    print(f"XLA 5D transpose   {dtime(xla_t, x):8.2f} ms", flush=True)

    # (b) plain XLA 2D transpose for reference
    def xla_2d(p32):
        return p32.T

    print(f"XLA 2D transpose   {dtime(xla_2d, x):8.2f} ms", flush=True)

    # (c) Pallas: grid over block rows; tile (8, 1920) -> (128, 120) via
    # jnp reshape/transpose INSIDE the kernel
    def kern_body(in_ref, out_ref):
        v = in_ref[:, :]                        # (8, 1920)
        v = v.reshape(8, nsr, rst, 2)           # r, sr, b, ch
        v = v.transpose(2, 0, 3, 1)             # b, r, ch, sr
        out_ref[:, :] = v.reshape(rst * 16, nsr)

    def pallas_t(p32):
        return pl.pallas_call(
            kern_body,
            grid=(nbh,),
            in_specs=[pl.BlockSpec((8, W4), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rst * 16, nsr), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rst * 16, S), jnp.uint32),
        )(p32)

    try:
        r = pallas_t(x)
        ok = np.array_equal(np.asarray(r), np.asarray(jax.jit(xla_t)(x)))
        print(f"pallas tile-T      {dtime(pallas_t, x):8.2f} ms   "
              f"match={ok}", flush=True)
    except Exception as e:
        print("pallas tile-T FAILED:", str(e)[:300], flush=True)

    # (d) Pallas plain 2D transpose (128, 128) tiles
    def kern2(in_ref, out_ref):
        out_ref[:, :] = in_ref[:, :].T

    def pallas_2d(p32):
        Ht, Wt = p32.shape
        return pl.pallas_call(
            kern2,
            grid=(Ht // 128, Wt // 128),
            in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 128), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Wt, Ht), jnp.uint32),
        )(p32)

    try:
        x2 = x[:4224]            # 33 x 128 rows, 15 x 128 cols
        r = pallas_2d(x2)
        ok = np.array_equal(np.asarray(r), np.asarray(x2).T)
        print(f"pallas 2D (128^2)  {dtime(pallas_2d, x2):8.2f} ms   "
              f"match={ok}", flush=True)
    except Exception as e:
        print("pallas 2D FAILED:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
