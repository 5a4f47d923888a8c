#!/usr/bin/env python
"""dpost kernel decomposition at 8K 4:4:4 (fetch-delta method).

Variants: full | noxpose (skip pt scatter+transposes, write block-order)
| nocolor (identity color) | matmul-only | RG sweep.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpujpeg_tpu.ops import color, prepost_kernel as ppk
    from gpujpeg_tpu.types import ColorSpace

    h, w = 4320, 7680
    NBW = w // 8
    NBH = h // 8
    dx = dy = 1
    NBC = NBW
    src_cs = ColorSpace.YCBCR_BT601_256LVLS
    dst_cs = ColorSpace.RGB

    rng = np.random.default_rng(0)
    L = NBW * NBH
    planes = [jnp.asarray(rng.integers(-64, 64, (64, L)).astype(np.int16))
              for _ in range(3)]
    qy = jnp.asarray(np.full((64, 1), 4, np.float32))
    my, mc = ppk._dpost_matrices(dx, dy)
    my_d, mc_d = jnp.asarray(my), jnp.asarray(mc)

    def make_variant(RG, mode, highest=True):
        nv = dx * dy
        steps = -(-NBH // RG)
        prec = (jax.lax.Precision.HIGHEST if highest
                else jax.lax.Precision.DEFAULT)

        def body(yc_hbm, cb_hbm, cr_hbm, qy_ref, qcb_ref, qcr_ref,
                 my_ref, mc_ref, out_ref, ysc, cbsc, crsc, pt_ref,
                 sy, sb, sr):
            i = pl.program_id(0)
            cy = pltpu.make_async_copy(
                yc_hbm.at[:, pl.ds(i * RG * dy * NBW, RG * dy * NBW)],
                ysc, sy)
            ccb = pltpu.make_async_copy(
                cb_hbm.at[:, pl.ds(i * RG * NBC, RG * NBC)], cbsc, sb)
            ccr = pltpu.make_async_copy(
                cr_hbm.at[:, pl.ds(i * RG * NBC, RG * NBC)], crsc, sr)
            cy.start(); ccb.start(); ccr.start()
            cy.wait(); ccb.wait(); ccr.wait()

            def idct(cv, q_ref, m_ref):
                y = cv.astype(jnp.float32) * q_ref[:, :]
                x = jnp.dot(m_ref[:, :], y,
                            preferred_element_type=jnp.float32,
                            precision=prec)
                return jnp.clip(jnp.round(x + 128.0), 0,
                                255).astype(jnp.int32)

            for rr in range(RG):
                Y = idct(ysc[:, rr * NBW:(rr + 1) * NBW], qy_ref, my_ref)
                Cb = idct(cbsc[:, rr * NBC:(rr + 1) * NBC], qcb_ref,
                          my_ref)
                Cr = idct(crsc[:, rr * NBC:(rr + 1) * NBC], qcr_ref,
                          my_ref)
                if mode == "matmul":
                    px = (Y | (Cb << 8) | (Cr << 16)).astype(jnp.uint32)
                    out_ref[8 * rr:8 * rr + 8, :] = \
                        px[:8, :].astype(jnp.uint32).repeat(8, axis=1)[
                            :, :8 * NBW]
                    continue
                if mode == "nocolor":
                    r, g, b = Y, Cb, Cr
                else:
                    r, g, b = color.convert_channels(Y, Cb, Cr, src_cs,
                                                     dst_cs)
                px = (r.astype(jnp.uint32) | (g.astype(jnp.uint32) << 8)
                      | (b.astype(jnp.uint32) << 16)
                      | jnp.uint32(0xFF000000))
                if mode == "noxpose":
                    # block-order writes, no pt scatter / transposes
                    out_ref[8 * rr:8 * rr + 8, :] = \
                        px.reshape(8, 8 * NBW)
                    continue
                xt = px[:, :].T
                for cc in range(8):
                    pt_ref[cc::8, :] = xt[:, 8 * cc:8 * cc + 8]
                out_ref[8 * rr:8 * rr + 8, :] = pt_ref[:, :].T

        def fn(yc, cb, cr):
            const = lambda i: (0, 0)
            return pl.pallas_call(
                body,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((64, 1), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 1), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 1), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 64), const,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nv * 64, 64), const,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8 * RG, NBW * 8),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((steps * 8 * RG, NBW * 8),
                                               jnp.uint32),
                scratch_shapes=[
                    pltpu.VMEM((64, RG * dy * NBW), jnp.int16),
                    pltpu.VMEM((64, RG * NBC), jnp.int16),
                    pltpu.VMEM((64, RG * NBC), jnp.int16),
                    pltpu.VMEM((8 * NBW, 8), jnp.uint32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            )(yc, cb, cr, qy, qy, qy, my_d, mc_d)

        return fn

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

    def timed(fnc):
        def mk_loop(n):
            @jax.jit
            def loop(a, b, c):
                def body(i, carry):
                    r = fnc(a.at[0, 0].set(carry.astype(jnp.int16)), b, c)
                    flat = r.reshape(-1)
                    return jnp.max(
                        flat[:: max(1, flat.size // 4096)]).astype(
                            jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return loop
        return mk_loop

    args = tuple(planes)
    for RG in (4, 8, 16, 32):
        if NBW * RG * 64 * 2 > 8e6:
            pass
        try:
            dt = delta(timed(make_variant(RG, "full")), args)
            print(f"RG={RG} full: {dt:.2f} ms", flush=True)
        except Exception as e:
            print(f"RG={RG} full: FAIL {str(e)[:100]}", flush=True)
    for mode in ("noxpose", "nocolor", "matmul"):
        try:
            dt = delta(timed(make_variant(16, mode)), args)
            print(f"RG=16 {mode}: {dt:.2f} ms", flush=True)
        except Exception as e:
            print(f"RG=16 {mode}: FAIL {str(e)[:100]}", flush=True)
    try:
        dt = delta(timed(make_variant(16, "full", highest=False)), args)
        print(f"RG=16 full-bf16: {dt:.2f} ms", flush=True)
    except Exception as e:
        print(f"RG=16 full-bf16: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
