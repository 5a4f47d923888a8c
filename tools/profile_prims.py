#!/usr/bin/env python
"""Primitive micro-costs for the Pallas preprocess design:
(1) in-kernel (128, 7680) u32 transpose
(2) in-kernel sublane stride-3 slice of (7680, 128)
(3) XLA pad RGB (H,W,3) -> RGBX (H,W,4)
(4) full candidate: bitcast strips -> T -> stride-3 sublanes -> bytes ->
    color -> repack -> T back, luma only
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = 4320, 7680
    W3 = W * 3
    raw = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(0), (H, W, 3), 0, 256, jnp.uint8))
    w32 = jax.block_until_ready(
        jax.jit(lambda r: jax.lax.bitcast_convert_type(
            r.reshape(H // 4, 4, W3).transpose(0, 2, 1), jnp.uint32))(raw)
        if False else
        jax.jit(lambda r: jax.lax.bitcast_convert_type(
            r.reshape(H, W3 // 4, 4), jnp.uint32))(raw))
    _ = np.asarray(jax.jit(lambda v: v + 1)(jnp.ones((8, 128))))

    def dtime(fn, arg, n_hi=9):
        def mk(n):
            @jax.jit
            def lp(a):
                def body(i, c):
                    r = fn(a.at[(0,) * a.ndim].set(c.astype(a.dtype)))
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

    # vertical-quad u32 view of raw, (H/4, W3): row-quad t, byte-col x
    vq = jax.block_until_ready(jax.jit(
        lambda r: jax.lax.bitcast_convert_type(
            r.reshape(H // 4, 4, W3).transpose(0, 2, 1).reshape(
                H // 4, W3, 4), jnp.uint32))(raw))
    # NOTE: the above does a transpose in XLA; the REAL path would bitcast
    # differently.  For primitive timing we just need the shape.

    CH = 7680  # byte-col chunk (2560 px)

    # (1) in-kernel transpose (128, CH) u32 -> (CH, 128)
    def k_t(in_ref, out_ref):
        out_ref[:, :] = in_ref[:, :].T

    def f_t(x):
        return pl.pallas_call(
            k_t,
            grid=(x.shape[0] // 128, x.shape[1] // CH),
            in_specs=[pl.BlockSpec((128, CH), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CH, 128), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[1], x.shape[0]),
                                           jnp.uint32),
        )(x)

    x1 = jax.block_until_ready(
        jnp.asarray(np.random.randint(0, 1 << 30,
                                      (1024, 23040), np.int64)
                    .astype(np.uint32)))
    try:
        r = f_t(x1)
        ok = np.array_equal(np.asarray(r), np.asarray(x1).T)
        print(f"(1) kernel T        {dtime(f_t, x1):8.2f} ms  match={ok}",
              flush=True)
    except Exception as e:
        print("(1) kernel T FAILED:", str(e)[:200], flush=True)

    # (2) in-kernel sublane stride-3 slice (CH, 128) -> 3 x (CH/3, 128)
    def k_s2(in_ref, out_ref):
        x = in_ref[:, :]
        out_ref[:, :] = x[0::2, :] + x[1::2, :]

    def f_s2(x):
        G = x.shape[0] // CH
        return pl.pallas_call(
            k_s2,
            grid=(G,),
            in_specs=[pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CH // 2, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[0] // 2, 128),
                                           jnp.uint32),
        )(x)

    x2 = jax.block_until_ready(
        jnp.asarray(np.random.randint(0, 1 << 20,
                                      (23040, 128), np.int64)
                    .astype(np.uint32)))
    try:
        r = f_s2(x2)
        a = np.asarray(x2)
        ref = a[0::2] + a[1::2]
        ok = np.array_equal(np.asarray(r), ref)
        print(f"(2a) sublane ::2    {dtime(f_s2, x2):8.2f} ms  match={ok}",
              flush=True)
    except Exception as e:
        print("(2a) sublane ::2 FAILED:", str(e)[:250], flush=True)

    # (2b) in-kernel u8 -> u32 bitcast pack of sublane quads
    def k_b(in_ref, out_ref):
        x = in_ref[:, :]                       # (CH, 128) i32 values 0..255
        xb = x.astype(jnp.uint8)
        out_ref[:, :] = pltpu.bitcast(xb, jnp.uint32)

    def f_b(x):
        G = x.shape[0] // CH
        return pl.pallas_call(
            k_b,
            grid=(G,),
            in_specs=[pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CH // 4, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[0] // 4, 128),
                                           jnp.uint32),
        )(x)

    x3 = jax.block_until_ready(
        jnp.asarray(np.random.randint(0, 256, (23040, 128), np.int64)
                    .astype(np.int32)))
    try:
        r = f_b(x3)
        a = np.asarray(x3).astype(np.uint8)
        ref = (a[0::4].astype(np.uint32) | (a[1::4].astype(np.uint32) << 8)
               | (a[2::4].astype(np.uint32) << 16)
               | (a[3::4].astype(np.uint32) << 24))
        ok = np.array_equal(np.asarray(r), ref)
        print(f"(2b) u8->u32 pack   {dtime(f_b, x3):8.2f} ms  match={ok}",
              flush=True)
    except Exception as e:
        print("(2b) u8->u32 pack FAILED:", str(e)[:250], flush=True)

    # (3) XLA pad to RGBX
    def f_pad(r):
        return jnp.pad(r, ((0, 0), (0, 0), (0, 1)))

    print(f"(3) XLA RGBX pad    {dtime(f_pad, raw):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
