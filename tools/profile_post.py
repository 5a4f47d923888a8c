#!/usr/bin/env python
"""Decode-tail breakdown on the real TPU: dequant+IDCT matmul,
blocks_to_plane relayout, upsample+color+pack.

Usage: python tools/profile_post.py [HxW]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.ops import color, dct, sample
    from gpujpeg_tpu.utils import tables

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    print(f"backend={jax.default_backend()} {h}x{w}", file=sys.stderr)

    rng = np.random.default_rng(1)
    nb_y = (h // 8) * (w // 8)
    nb_c = (h // 16) * (w // 16)
    coefs_y = jnp.asarray(rng.integers(-64, 64, (nb_y, 64), np.int16))
    coefs_u = jnp.asarray(rng.integers(-64, 64, (nb_c, 64), np.int16))
    qt = jnp.asarray(tables.quant_table_zz(True, 75).astype(np.float32))

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

    N = tables.idct2d_matrix_zz().astype(np.float32)

    # (a) dequant+IDCT matmul only (all 3 components)
    def mk_mm(n):
        @jax.jit
        def lp(cy, cu):
            def body(i, carry):
                acc = jnp.float32(0)
                for c in (cy.at[0, 0].set(carry), cu, cu):
                    y = c.astype(jnp.float32) * qt[None, :]
                    x = jnp.dot(y, jnp.asarray(N),
                                preferred_element_type=jnp.float32)
                    acc = acc + x[0, 0]
                return acc
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return lp

    # (b) full dequantize_idct_traced incl blocks_to_plane
    def mk_idct(n):
        @jax.jit
        def lp(cy, cu):
            def body(i, carry):
                py = dct.dequantize_idct_traced(
                    cy.at[0, 0].set(carry), qt, h, w)
                pu = dct.dequantize_idct_traced(cu, qt, h // 2, w // 2)
                pv = dct.dequantize_idct_traced(cu, qt, h // 2, w // 2)
                return (py[0, 0] + pu[0, 0] + pv[0, 0]).astype(jnp.int16)
            return jax.lax.fori_loop(0, n, body, jnp.int16(0))
        return lp

    # (c) upsample + color + pack from ready planes
    py0 = jax.block_until_ready(
        jnp.asarray(rng.integers(0, 256, (h, w), np.int32)))
    pu0 = jax.block_until_ready(
        jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32)))

    def mk_post(n):
        @jax.jit
        def lp(py, pu):
            def body(i, carry):
                yy = py.at[0, 0].set(carry)
                u = jnp.repeat(jnp.repeat(pu, 2, axis=0), 2, axis=1)
                chans = jnp.stack([yy, u, u], axis=-1)
                from gpujpeg_tpu.types import YCBCR_JPEG
                from gpujpeg_tpu.types import ColorSpace
                rgb = color.convert(chans, YCBCR_JPEG, ColorSpace.RGB)
                out = rgb.astype(jnp.uint8)
                return out[0, 0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return lp

    # (d) blocks_to_plane alone (u8 samples)
    sy0 = jax.block_until_ready(
        jnp.asarray(rng.integers(0, 256, (nb_y, 64), np.int32)))

    def mk_b2p(n):
        @jax.jit
        def lp(s):
            def body(i, carry):
                p = dct.blocks_to_plane(s.at[0, 0].set(carry), h, w)
                return p[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return lp

    for name, mk, args in [("mm only", mk_mm, (coefs_y, coefs_u)),
                           ("idct+b2p", mk_idct, (coefs_y, coefs_u)),
                           ("b2p alone", mk_b2p, (sy0,)),
                           ("up+col+pack", mk_post, (py0, pu0))]:
        t0 = time.time()
        ms = dtime(mk, args)
        print(f"{name:12s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
