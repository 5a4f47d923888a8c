#!/usr/bin/env python
"""blocks->plane relayout variants on the real TPU.

(a) (L, 64) i32 -> plane        [current decoder path]
(b) (L, 64) u8 -> plane
(c) (64, L) u8 transposed-source -> plane
(d) (64, L) f32 -> fused idct matmul + u8 + transposed b2p
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    print(f"backend={jax.default_backend()} {h}x{w}", file=sys.stderr)
    nbh, nbw = h // 8, w // 8
    L = nbh * nbw

    rng = np.random.default_rng(1)
    s_i32 = jax.block_until_ready(
        jnp.asarray(rng.integers(0, 256, (L, 64), np.int32)))
    s_u8 = jax.block_until_ready(s_i32.astype(jnp.uint8))
    st_u8 = jax.block_until_ready(jnp.asarray(
        np.asarray(s_u8).T.copy()))
    ct_i16 = jax.block_until_ready(
        jnp.asarray(rng.integers(-64, 64, (64, L), np.int16)))

    def dtime(make_loop, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            lp = make_loop(n)
            r = jax.block_until_ready(lp(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = jax.block_until_ready(lp(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    def b2p_rows(x):
        return x.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(h, w)

    def b2p_t(x):
        return x.reshape(8, 8, nbh, nbw).transpose(2, 0, 3, 1) \
            .reshape(h, w)

    def mk(fn, cast=None):
        def make(n):
            @jax.jit
            def lp(x):
                def body(i, carry):
                    xx = x.at[0, 0].set(carry.astype(x.dtype))
                    p = fn(xx)
                    return p[0, 0].astype(jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return lp
        return make

    from gpujpeg_tpu.utils import tables
    N = tables.idct2d_matrix_zz().astype(np.float32)
    qt = jnp.asarray(tables.quant_table_zz(True, 75).astype(np.float32))

    def fused_t(c):
        y = c.astype(jnp.float32) * qt[:, None]
        x = jnp.dot(jnp.asarray(N.T), y,
                    preferred_element_type=jnp.float32)
        x = jnp.clip(jnp.round(x + 128.0), 0, 255).astype(jnp.uint8)
        return b2p_t(x)

    for name, fn, arg in [("a (L,64)i32", b2p_rows, s_i32),
                          ("b (L,64)u8 ", b2p_rows, s_u8),
                          ("c (64,L)u8 ", b2p_t, st_u8),
                          ("d fused idct", fused_t, ct_i16)]:
        t0 = time.time()
        ms = dtime(mk(fn), (arg,))
        print(f"{name} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
