#!/usr/bin/env python
"""DCT matmul precision: speed + quantized-output accuracy at 8K scale."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.utils import tables

    B = 1555200   # 8K worth of blocks (one component x3 would be 3x518400)
    qtab = tables.quant_table_zz(True, 75)
    Mq, bias = tables.fdct_fused_matrix(np.asarray(qtab))

    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 256, (B, 64), np.uint8)
    x = jnp.asarray(x_np)

    def mk(prec):
        @jax.jit
        def f(x):
            y = jnp.dot(x.astype(jnp.float32), jnp.asarray(Mq),
                        preferred_element_type=jnp.float32,
                        precision=prec)
            return jnp.round(y + jnp.asarray(bias)).astype(jnp.int16)
        return f

    ref = None
    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        f = mk(prec)
        r = jax.block_until_ready(f(x))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        r_np = np.asarray(r)
        if ref is None:
            ref = r_np
            diff = "ref"
        else:
            nd = int((r_np != ref).sum())
            md = int(np.abs(r_np.astype(np.int32)
                            - ref.astype(np.int32)).max())
            diff = f"ndiff={nd} ({nd/r_np.size*100:.4f}%) maxabs={md}"
        print(f"{name:8s} {best*1000:7.2f} ms   {diff}", flush=True)

    # also: how fast is a pure f32 elementwise pass over the same data
    @jax.jit
    def ew(x):
        return (x.astype(jnp.float32) * 2.0 + 1.0).astype(jnp.int16)
    jax.block_until_ready(ew(x))
    t0 = time.perf_counter()
    jax.block_until_ready(ew(x))
    print(f"elementwise pass {(time.perf_counter()-t0)*1000:.2f} ms")


if __name__ == "__main__":
    main()
