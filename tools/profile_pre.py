#!/usr/bin/env python
"""Bisect the pre+dct stage at 8K: color transform, block transpose (by
plane dtype), DCT matmul, and the (S, rst, 64) row reshape."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.ops import color, dct
    from gpujpeg_tpu.utils import tables

    H, W = 4320, 7680
    qtab = tables.quant_table_zz(True, 75)
    Mq, bias = tables.fdct_fused_matrix(np.asarray(qtab))
    hi = Mq.astype(np.float32).astype(jnp.bfloat16)
    lo = (Mq.astype(np.float32) - np.asarray(hi).astype(np.float32)
          ).astype(jnp.bfloat16)

    raw = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(0), (H, W, 3), 0, 256,
                           jnp.uint8))
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    def dtime(fn, n_hi=9):
        def mk(n):
            @jax.jit
            def lp(raw):
                def body(i, c):
                    r = fn(raw.at[0, 0, 0].set(c))
                    return r.reshape(-1)[0].astype(jnp.uint8)
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(raw))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(raw))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    def colorize(raw):
        c = raw.astype(jnp.int32)
        out = color.transform(c, "RGB", "YCBCR_BT601_256LVLS") \
            if hasattr(color, "transform") else None
        return out

    # (a) color transform only (sum-consumed)
    from gpujpeg_tpu.types import ColorSpace

    def f_color(raw):
        return color.convert(raw, ColorSpace.RGB,
                             ColorSpace.YCBCR_BT601_256LVLS)

    try:
        print(f"color only        {dtime(f_color):8.2f} ms")
    except Exception as e:
        print("color only FAILED:", str(e)[:100])

    # (b) color + plane extraction + block transpose at several dtypes
    for name, dt in (("u8", jnp.uint8), ("i16", jnp.int16),
                     ("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        def f_blocks(raw, dt=dt):
            ch = color.convert(raw, ColorSpace.RGB,
                               ColorSpace.YCBCR_BT601_256LVLS)
            acc = jnp.zeros((), jnp.int32)
            outs = []
            for c in range(3):
                p = ch[:, :, c].astype(dt)
                b = dct.plane_to_blocks(p)
                outs.append(b)
            return sum(o.astype(jnp.int32).reshape(-1)[:1].sum()
                       for o in outs)[None]
        try:
            print(f"color+blocks {name:4s} {dtime(f_blocks):8.2f} ms")
        except Exception as e:
            print(f"color+blocks {name} FAILED:", str(e)[:100])

    # (c) full: color + blocks + bf16x2 matmul + round + row reshape
    def f_full(raw):
        ch = color.convert(raw, ColorSpace.RGB,
                           ColorSpace.YCBCR_BT601_256LVLS)
        outs = []
        for c in range(3):
            p = ch[:, :, c].astype(jnp.uint8)
            x = dct.plane_to_blocks(p).astype(jnp.bfloat16)
            y = (jnp.dot(x, jnp.asarray(hi),
                         preferred_element_type=jnp.float32)
                 + jnp.dot(x, jnp.asarray(lo),
                           preferred_element_type=jnp.float32))
            q = jnp.round(y + jnp.asarray(bias)).astype(jnp.int16)
            outs.append(q.reshape(64800, 8, 64))
        return sum(o.astype(jnp.int32).reshape(-1)[:1].sum()
                   for o in outs)[None]
    print(f"full pre+dct      {dtime(f_full):8.2f} ms")


if __name__ == "__main__":
    main()
