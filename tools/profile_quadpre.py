#!/usr/bin/env python
"""Test the quad-math preprocess: bitcast raw RGB to u32 words, stride-3
word slices, elementwise byte math -> packed Y32/Cb32/Cr32 planes."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    H, W = 4320, 7680
    raw = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(0), (H, W, 3), 0, 256, jnp.uint8))
    _ = np.asarray(jax.jit(lambda v: v + 1)(jnp.ones((8, 128))))

    def dtime(fn, n_hi=9):
        def mk(n):
            @jax.jit
            def lp(a):
                def body(i, c):
                    r = fn(a.at[0, 0, 0].set(c.astype(jnp.uint8)))
                    acc = jnp.uint32(0)
                    for v in r:
                        acc = acc + v.reshape(-1)[0].astype(jnp.uint32)
                    return acc
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
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

    def bytes_of(w, k):
        return (w >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)

    def transform_y(r, g, b):
        # BT.601 256lvls luma row: ((77 r' + 150 g' + 29 b' + 128) >> 8)
        # with r' = r*256//255
        rs = (r.astype(jnp.int32) * 256) // 255
        gs = (g.astype(jnp.int32) * 256) // 255
        bs = (b.astype(jnp.int32) * 256) // 255
        y = (rs * 77 + gs * 150 + bs * 29 + 128) >> 8
        return jnp.clip(y, 0, 255).astype(jnp.uint32)

    def quad_y(raw):
        w = jax.lax.bitcast_convert_type(
            raw.reshape(H, W * 3 // 4, 4), jnp.uint32)
        w0 = w[:, 0::3]
        w1 = w[:, 1::3]
        w2 = w[:, 2::3]
        # pixel quad: p0=(w0b0,w0b1,w0b2) p1=(w0b3,w1b0,w1b1)
        #             p2=(w1b2,w1b3,w2b0) p3=(w2b1,w2b2,w2b3)
        y0 = transform_y(bytes_of(w0, 0), bytes_of(w0, 1), bytes_of(w0, 2))
        y1 = transform_y(bytes_of(w0, 3), bytes_of(w1, 0), bytes_of(w1, 1))
        y2 = transform_y(bytes_of(w1, 2), bytes_of(w1, 3), bytes_of(w2, 0))
        y3 = transform_y(bytes_of(w2, 1), bytes_of(w2, 2), bytes_of(w2, 3))
        return (y0 | (y1 << 8) | (y2 << 16) | (y3 << 24),)

    print(f"quad Y32           {dtime(quad_y):8.2f} ms", flush=True)

    # verify
    out = np.asarray(jax.jit(quad_y)(raw)[0])
    rr = np.asarray(raw).astype(np.int64)
    rs = rr * 256 // 255
    y = np.clip((rs[..., 0] * 77 + rs[..., 1] * 150 + rs[..., 2] * 29
                 + 128) >> 8, 0, 255).astype(np.uint8)
    ref = y.reshape(H, W // 4, 4)
    got = np.stack([(out >> (8 * k)) & 0xFF for k in range(4)],
                   axis=-1).astype(np.uint8)
    print("match:", np.array_equal(ref, got), flush=True)


if __name__ == "__main__":
    main()
