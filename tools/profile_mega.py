#!/usr/bin/env python
"""Bisect the entropy megakernel's internal stages on the real TPU.

Builds the DCT-fused kernel at the 8K luma geometry with stop_after in
(dct, token, tree, None) and times each via the delta method.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.ops import fusedpack
    from gpujpeg_tpu.utils import tables

    # 8K luma: rst=8, S=64800 segments, C=512
    C, B, Sp = 512, 8, 64896
    w_out, z_cap = 26, 16
    compact = (1, 3, 5, 6)
    quality = 75
    consts = tables.entropy_kernel_consts(quality)
    dct_key = (quality, True, 8, True)
    print(f"backend={jax.default_backend()} C={C} Sp={Sp}", file=sys.stderr)

    xbd = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(0), (C // 4, Sp), 0, 1 << 30,
        jnp.int32).astype(jnp.uint32))
    valid = jnp.ones((B, Sp), jnp.int32)
    luma = jnp.ones((1, Sp), jnp.int32)
    rst = jnp.full((1, Sp), 1, jnp.int32)
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    def timeit(stop, rtile=128):
        fn = fusedpack.make_entropy_kernel(
            C, w_out, z_cap, B, consts, rtile, False, compact,
            dct=fusedpack._dct_consts(dct_key, C), stop_after=stop)

        def loop(xbd, n):
            def body(i, c):
                o, ob, nd = fn(xbd.at[0, 0].set(c.astype(jnp.uint32)),
                               valid, luma, rst)
                return ob[0]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        jl = jax.jit(loop, static_argnums=1)
        ts = {}
        for n in (1, 9):
            jax.block_until_ready(jl(xbd, n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(jl(xbd, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[9] - ts[1]) / 8 * 1000.0

    for rtile in (256, 512):
        for stop in ("dct", "token", "tree", None):
            try:
                ms = timeit(stop, rtile)
                print(f"R={rtile} through {stop or 'full':5s}  "
                      f"{ms:8.2f} ms", flush=True)
            except Exception as e:
                print(f"R={rtile} {stop}: FAILED {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
