#!/usr/bin/env python
"""Decompose the packed-preprocess path: pad | +bitcast | kernels | +5D."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.ops import prepost_kernel

    h, w = 4320, 7680
    raw = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(0), (h, w, 3), 0, 256, jnp.uint8))
    _ = np.asarray(jax.jit(lambda v: v + 1)(jnp.ones((8, 128))))

    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)
    geo = enc.resolve(raw, param, None)
    pi = geo.param_image

    def dtime(fn, n_hi=9, reps=3):
        def mk(n):
            @jax.jit
            def lp(a):
                def body(i, c):
                    r = fn(a.at[0, 0, 0].set(c.astype(jnp.uint8)))
                    acc = jnp.uint32(0)
                    for v in (r if isinstance(r, (list, tuple)) else [r]):
                        acc = acc + v.reshape(-1)[0].astype(jnp.uint32)
                    return acc
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(raw))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(raw))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    def f_pad(r):
        rgbx = jnp.pad(r, ((0, 0), (0, 0), (0, 1)))
        return jax.lax.bitcast_convert_type(rgbx, jnp.uint32)

    def f_luma(r):
        px = f_pad(r)
        c = geo.components[0]
        fn = prepost_kernel._cached_pre_kernel(
            pi.color_space, geo.param.color_space_internal, (0,), 1,
            prepost_kernel._pre_row_chunk(h, w, 1,
                                          prepost_kernel._col_chunk(w, 1)),
            prepost_kernel._col_chunk(w, 1),
            h, w, False)
        return fn(px)[0]

    def f_all(r):
        return prepost_kernel.preprocess_packed(r, geo, pi)

    def f_all5d(r):
        packed = prepost_kernel.preprocess_packed(r, geo, pi)
        out = []
        for c in geo.components:
            rstn = c.segment_mcu_count
            nbh = c.data_height // 8
            nsr = c.data_width // 8 // rstn
            x = packed[c.index].reshape(nbh, 8, nsr, rstn, 2)
            out.append(x.transpose(3, 1, 4, 0, 2)
                       .reshape(rstn * 16, nbh * nsr))
        return out

    def f_all5dpad(r):
        out = []
        for c, x in zip(geo.components, f_all5d(r)):
            S = c.segment_count
            Sp = -(-S // 128) * 128
            out.append(jnp.pad(x, ((0, 0), (0, Sp - x.shape[1])))
                       if Sp != x.shape[1] else x)
        return out

    from gpujpeg_tpu.models import encoder as enc_mod
    xbd_impl, _ = enc_mod.make_rows_xbd_impl(geo)

    def f_real(r):
        return xbd_impl(r)

    for name, fn in (("pad+bitcast", f_pad), ("luma kernel", f_luma),
                     ("all kernels", f_all), ("+5D transp", f_all5d),
                     ("+Sp pad", f_all5dpad), ("real xbd", f_real)):
        t0 = time.time()
        ms = dtime(fn)
        print(f"{name:12s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
