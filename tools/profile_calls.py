#!/usr/bin/env python
"""Per-call overhead: luma kernel alone vs luma+cb+cr in one jit, on
fixed device inputs (8K geometry)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.ops import fusedpack
    from gpujpeg_tpu.utils import tables

    C, B = 512, 8
    w_out, z_cap = 26, 16
    compact = (1, 3, 5, 6)
    consts = tables.entropy_kernel_consts(75)
    SY, SC = 64800, 16200
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    def mk_in(S, seed):
        xbd = jax.random.randint(jax.random.PRNGKey(seed), (C // 4, S), 0,
                                 1 << 30, jnp.int32).astype(jnp.uint32)
        valid = jnp.ones((B, S), jnp.int32)
        rst = np.full(S, 1, np.int32)
        return jax.block_until_ready(xbd), valid, rst

    xy, vy, ry = mk_in(SY, 0)
    xc1, vc1, rc1 = mk_in(SC, 1)
    xc2, vc2, rc2 = mk_in(SC, 2)
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    def call(x, v, r, luma):
        lt = jnp.full((1, x.shape[1]), 1 if luma else 0, jnp.int32)
        o, ob, nd = fusedpack.entropy_fused_u8(
            x, v, lt, r, z_cap=z_cap, w_out=w_out, consts=consts,
            dct_key=(75, luma, 8, True), compact_after=compact)
        return ob[0] + nd[0] + o[0, 0].astype(jnp.int32)

    def f_luma(xy, xc1, xc2):
        return call(xy, vy, ry, True)

    def f_all(xy, xc1, xc2):
        return (call(xy, vy, ry, True) + call(xc1, vc1, rc1, False)
                + call(xc2, vc2, rc2, False))

    def f_cb(xy, xc1, xc2):
        return call(xc1, vc1, rc1, False)

    def dtime(fn, n_hi=9):
        def mk(n):
            @jax.jit
            def lp(a, b, c):
                def body(i, acc):
                    r = fn(a.at[0, 0].set(acc.astype(jnp.uint32)), b, c)
                    return r
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(xy, xc1, xc2))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(xy, xc1, xc2))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    for name, fn in (("luma only", f_luma), ("cb only", f_cb),
                     ("all 3", f_all)):
        t0 = time.time()
        print(f"{name:10s} {dtime(fn):8.2f} ms  (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
