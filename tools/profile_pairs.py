#!/usr/bin/env python
"""Stage bisect of the ACTUAL pairs-mode fused pipeline at 8K Q75."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import fusedpack, sample, dct as dct_mod

    h, w = 4320, 7680
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (h // 16, w // 16, 3), jnp.float32,
                                   0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = jax.block_until_ready(gen(jax.random.PRNGKey(7)))
    _ = jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)
    geo, res, meta = enc.encode_to_device(frame, param)
    caps = enc._caps[geo]
    print(f"caps={caps}", file=sys.stderr)
    tokens_impl = enc_mod.make_rows_tokens_impl(geo, pairs=True)
    full_fn = enc_mod.make_full_encode_fn(geo, caps)

    def dtime(mk, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            lp = mk(n)
            jax.block_until_ready(lp(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    def wrap(body_fn):
        def mk(n):
            @jax.jit
            def lp(raw):
                def body(i, carry):
                    return body_fn(raw.at[0, 0, 0].set(carry))
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp
        return mk

    # s0: preprocess only (planes)
    def s0(raw):
        planes = sample.preprocess(raw, geo, geo.param_image)
        return sum(p.reshape(-1)[0].astype(jnp.uint32)
                   for p in planes).astype(jnp.uint8)

    # s1: tokens only (pairs)
    def s1(raw):
        bits, lens = tokens_impl(raw)
        return (bits.reshape(-1)[0]
                + lens.reshape(-1)[0].astype(jnp.uint32)).astype(jnp.uint8)

    # s2: tokens + fused kernel (actual path)
    def s2(raw):
        bits, lens = tokens_impl(raw)
        rows, ob, needs = fusedpack.pack_stuff_fused_pre(
            bits, lens, geo.rst_marker, z_cap=caps.z_cap, w_out=caps.w_out)
        return ob.reshape(-1)[0].astype(jnp.uint8)

    # s3: full
    def s3(raw):
        r = full_fn(raw)
        return r["meta"][-1].astype(jnp.uint8)

    for name, fn in [("pre", s0), ("tokens", s1),
                     ("tok+kernel", s2), ("FULL", s3)]:
        t0 = time.time()
        ms = dtime(wrap(fn), (frame,))
        print(f"{name:12s} {ms:8.2f} ms  (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
