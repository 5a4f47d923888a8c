#!/usr/bin/env python
"""Time the fused pack+stuff Pallas kernel alone at 8K geometry for
several R_tile values (grid-step overhead vs VMEM pressure)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.ops import fusedpack

    R, W1 = 194400, 256          # 8K Q75 geometry, pairs mode (T=512)
    N0 = fusedpack.pow2_ge(W1)
    D = N0.bit_length() - 1
    w_out, z_cap = 150, 16
    print(f"backend={jax.default_backend()} R={R} N0={N0} D={D}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    # plausible pair words: ~12 bits per pair
    l2 = jax.random.randint(key, (R, W1), 0, 25, jnp.int32)
    x2 = (jax.random.randint(jax.random.PRNGKey(1), (R, W1), 0,
                             1 << 30, jnp.int32).astype(jnp.uint32)
          << jnp.uint32(2))
    x2 = jnp.where(l2 > 0, x2 & (jnp.uint32(0xFFFFFFFF)
                                 << (32 - jnp.clip(l2, 1, 31)).astype(jnp.uint32)),
                   jnp.uint32(0))
    rst = np.full(R, 0xD0, np.uint32)
    x2 = jax.block_until_ready(x2)
    l2 = jax.block_until_ready(l2)
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    for r_tile in (128, 256, 512, 1024):
        fn = fusedpack.make_deep_stuff_kernel(N0, D, w_out, z_cap,
                                              r_tile, False)
        rstj = jnp.asarray(rst).astype(jnp.int32).reshape(1, R)

        def mk(n):
            @jax.jit
            def lp(x2, l2):
                def body(i, c):
                    o, ob, nd = fn(x2 + c, l2, rstj)
                    return o.reshape(-1)[0]
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            return lp

        times = {}
        try:
            for n in (1, 9):
                lp = mk(n)
                jax.block_until_ready(lp(x2.T, l2.T))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(lp(x2.T, l2.T))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            ms = (times[9] - times[1]) / 8 * 1000.0
            print(f"R_tile={r_tile:5d}  {ms:8.2f} ms")
        except Exception as e:
            print(f"R_tile={r_tile:5d}  FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
