#!/usr/bin/env python
"""Decompose the decode idct_t+post stage: matmul | +pack | +5D | +post
(Pallas vs XLA postprocess)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import decoder as dec_mod
    from gpujpeg_tpu.ops import prepost_kernel, sample
    from gpujpeg_tpu.utils import tables

    h, w = 4320, 7680

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (h // 16, w // 16, 3), jnp.float32,
                                   0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = np.asarray(jax.device_get(gen(jax.random.PRNGKey(7))))
    enc = Encoder()
    data = enc.encode(frame, Parameters(quality=75, restart_interval=-1))
    from gpujpeg_tpu.models.decoder import resolve_output
    from gpujpeg_tpu.utils.geometry import get_geometry
    ps = dec_mod.reader.parse(bytes(data))
    param = dec_mod.reader.parsed_to_parameters(ps)
    out_pi = resolve_output(ps, None, 0)
    geo = get_geometry(param, out_pi.with_(width_padding=0))
    out_pi = geo.param_image
    print("post_supported:", prepost_kernel.post_supported(geo, out_pi),
          file=sys.stderr)

    L = sum(c.segment_count for c in geo.components) \
        * geo.max_blocks_per_seg
    coefs_t = jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(1), (64, L), -64, 64, jnp.int32)
        .astype(jnp.int16))
    qt = jnp.asarray(np.stack([np.asarray(
        tables.quant_table_zz(i == 0, 75), np.float32) for i in range(3)]))
    N = tables.idct2d_matrix_zz().astype(np.float32)

    def dtime(fn, n_hi=9):
        def mk(n):
            @jax.jit
            def lp(a):
                def body(i, c):
                    r = fn(a.at[0, 0].set(c.astype(jnp.int16)))
                    return r.reshape(-1)[0].astype(jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(coefs_t))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(coefs_t))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    def stage(coefs_t, upto, barrier=False):
        base = 0
        p32s = []
        acc = jnp.int32(0)
        for c in geo.components:
            S = c.segment_count
            rst = c.segment_mcu_count
            bps = geo.max_blocks_per_seg
            ct = coefs_t[:, base * bps:(base + S) * bps]
            ct = ct.reshape(64, S, bps)[:, :, :rst].reshape(64, S * rst)
            ct = ct[:, :c.mcu_count]
            y = ct.astype(jnp.float32) * qt[c.index][:, None]
            x = jnp.dot(jnp.asarray(N.T), y,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            x = jnp.clip(jnp.round(x + 128.0), 0, 255).astype(jnp.int32)
            if barrier:
                x = jax.lax.optimization_barrier(x)
            if upto == "matmul":
                acc = acc + jnp.sum(x[::8, ::512].astype(jnp.int32))
                base += S
                continue
            xw = x.reshape(16, 4, -1).astype(jnp.uint32)
            wd = (xw[:, 0] | (xw[:, 1] << 8) | (xw[:, 2] << 16)
                  | (xw[:, 3] << 24))
            if barrier:
                wd = jax.lax.optimization_barrier(wd)
            if upto == "pack":
                acc = acc + wd[0, 0].astype(jnp.int32)
                base += S
                continue
            nbh, nbw = c.data_height // 8, c.data_width // 8
            p32 = wd.reshape(8, 2, nbh, nbw).transpose(2, 0, 3, 1) \
                .reshape(c.data_height, c.data_width // 4)
            p32s.append(p32)
            base += S
        if upto in ("matmul", "pack"):
            return acc
        p32s = jax.lax.optimization_barrier(tuple(p32s))
        if upto == "5d":
            return sum(p[0, 0].astype(jnp.int32) for p in p32s)
        if upto == "post_pallas":
            out = prepost_kernel.postprocess_packed(list(p32s), geo,
                                                    out_pi)
            return out.reshape(-1)[0].astype(jnp.int32)
        planes = [jax.lax.bitcast_convert_type(p, jnp.uint8)
                  .reshape(c.data_height, c.data_width)
                  for p, c in zip(p32s, geo.components)]
        out = sample.postprocess(planes, geo, out_pi)
        return out.reshape(-1)[0].astype(jnp.int32)

    for bar in (False, True):
        for name in ("pack", "5d", "post_pallas"):
            t0 = time.time()
            ms = dtime(lambda ct, nm=name, b=bar: stage(ct, nm, b))
            print(f"bar={int(bar)} {name:12s} {ms:8.2f} ms  "
                  f"(setup {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
