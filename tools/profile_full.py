#!/usr/bin/env python
"""Bisect the FULL mega encode program: xbd feed | +kernels | +transpose
| +meta, each as one jit program on the real frame."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import fusedpack
    from gpujpeg_tpu.utils import tables

    h, w = (map(int, sys.argv[1].split("x")) if len(sys.argv) > 1
            else (4320, 7680))

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (h // 16, w // 16, 3), jnp.float32,
                                   0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = jax.block_until_ready(gen(jax.random.PRNGKey(7)))
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)
    geo, res, meta = enc.encode_to_device(frame, param)
    caps = enc._caps[geo]
    assert isinstance(caps, enc_mod.MegaCaps), caps
    consts = tables.entropy_kernel_consts(geo.param.quality)
    xbd_impl, xbd_infos = enc_mod.make_rows_xbd_impl(geo)
    print(f"backend={jax.default_backend()} caps={caps}", file=sys.stderr)

    def dtime(fn, n_hi=9, reps=3):
        def mk(n):
            @jax.jit
            def lp(raw):
                def body(i, c):
                    r = fn(raw.at[0, 0, 0].set(c))
                    return r.astype(jnp.uint8)
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp
        ts = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(frame))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(frame))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[n_hi] - ts[1]) / (n_hi - 1) * 1000.0

    def f_xbd(raw):
        xbds = jax.lax.optimization_barrier(tuple(xbd_impl(raw)))
        return functools.reduce(
            jnp.add, [x[0, 0].astype(jnp.int32) for x in xbds])

    def run_kernels(raw, transpose):
        xbds = jax.lax.optimization_barrier(tuple(xbd_impl(raw)))
        acc = jnp.int32(0)
        obs = []
        for xbd, info in zip(xbds, xbd_infos):
            luma_t = np.full((1, info["S"]),
                             1 if info["luma"] else 0, np.int32)
            r, ob, nd = fusedpack.entropy_fused_u8(
                xbd, jnp.asarray(info["valid"]), jnp.asarray(luma_t),
                info["rst"], z_cap=caps.z_cap, w_out=caps.w_out,
                consts=consts, dct_key=info["dct_key"],
                compact_after=caps.compact)
            if transpose:
                acc = acc + jnp.sum(r[::512].astype(jnp.int32)) \
                    + nd[0]
            else:
                # consume the PRE-transpose value: entropy_fused_u8
                # returns out_t.T; sampling [::1,:1] would still force the
                # transpose, so reach through with a cheap reduce instead
                acc = acc + r[0, 0].astype(jnp.int32) + nd[0]
            obs.append(ob)
        return acc, obs

    def f_kern(raw):
        acc, obs = run_kernels(raw, transpose=False)
        return acc + functools.reduce(jnp.add,
                                      [ob[0] for ob in obs])

    def f_kern_t(raw):
        acc, obs = run_kernels(raw, transpose=True)
        return acc + functools.reduce(jnp.add, [ob[0] for ob in obs])

    full_fn = enc_mod.make_full_encode_fn(geo, caps)

    def f_full(raw):
        out = full_fn(raw)
        return (out["meta"][-1]
                + functools.reduce(
                    jnp.add, [r[0, 0].astype(jnp.int32)
                              for r in out["rows"]])).astype(jnp.uint8)

    for name, fn in (("xbd", f_xbd), ("xbd+kern", f_kern),
                     ("xbd+kern+T", f_kern_t), ("FULL", f_full)):
        t0 = time.time()
        ms = dtime(fn)
        print(f"{name:12s} {ms:8.2f} ms   (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
