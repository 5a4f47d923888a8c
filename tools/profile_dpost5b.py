#!/usr/bin/env python
"""Time the PRODUCTION dpost kernel (decode_post_fused) under its env
knobs: RG sweep + precision, at 8K 4:4:4."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu.models import decoder as dec_mod
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import prepost_kernel as ppk
    from gpujpeg_tpu.types import (ColorSpace, ImageParameters,
                                   Parameters, PixelFormat)
    from gpujpeg_tpu.utils.geometry import get_geometry

    h, w = 4320, 7680
    pi = ImageParameters(width=w, height=h, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    param = enc_mod.adjust_params(
        Parameters(quality=75, restart_interval=8), pi)
    geo = get_geometry(param, pi)
    L = sum(c.segment_count for c in geo.components) \
        * geo.max_blocks_per_seg
    rng = np.random.default_rng(0)
    coefs_t = jnp.asarray(
        rng.integers(-64, 64, (64, L)).astype(np.int16))
    qt = jnp.asarray(np.full((3, 64), 4, np.float32))

    def delta(mk_loop, args, n_hi=7, reps=3):
        times = {}
        for n in (1, n_hi):
            loop = mk_loop(n)
            _ = np.asarray(loop(*args))
            best = float("inf")
            for _r in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(loop(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    def run_cfg(rg, prec):
        os.environ["GPUJPEG_TPU_DPOST_RG"] = str(rg)
        os.environ["GPUJPEG_TPU_DPOST_PREC"] = prec
        ppk._cached_dpost_kernel.cache_clear()

        def mk(n):
            @jax.jit
            def loop(ct):
                def body(i, carry):
                    r = ppk.decode_post_fused(
                        ct.at[0, 0].set(carry.astype(jnp.int16)), qt,
                        geo, geo.param_image)
                    prng = np.random.default_rng(42)
                    picks = [r[tuple(int(prng.integers(0, d))
                                     for d in r.shape)]
                             for _ in range(8)]
                    return jnp.max(jnp.stack(picks)).astype(jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return loop

        try:
            dt = delta(mk, (coefs_t,))
            print(f"RG={rg} prec={prec}: {dt:.2f} ms", flush=True)
        except Exception as e:
            print(f"RG={rg} prec={prec}: FAIL {str(e)[:120]}", flush=True)

    for rg in (4, 8, 16, 24):
        run_cfg(rg, "highest")
    run_cfg(16, "default")
    run_cfg(8, "default")


if __name__ == "__main__":
    main()
