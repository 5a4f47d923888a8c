#!/usr/bin/env python
"""Bisect the FULL-pipeline overhead vs sum-of-stages at 8K."""

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
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))

    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)
    geo, res, meta = enc.encode_to_device(frame, param)
    caps = enc._caps[geo]
    tokens_impl = enc_mod.make_rows_tokens_impl(geo)
    T2 = fusedpack.pow2_ge(enc_mod.token_slots(geo))
    N0 = T2 >> caps.l0
    D = N0.bit_length() - 1

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

    # v1: tokens + barrier + early levels + transpose
    def v1(raw):
        bits, lens = tokens_impl(raw)
        bits, lens = jax.lax.optimization_barrier((bits, lens))
        words, blen, needs_e = fusedpack.early_levels(bits, lens, caps.l0, T2)
        wt, bt = words.T, blen.T
        return (wt.reshape(-1)[0] + bt.reshape(-1)[0].astype(jnp.uint32)
                ).astype(jnp.uint8)

    # v2: + pallas kernel
    kern = fusedpack._cached_kernel(N0, D, caps.w_out, caps.z_cap, 128, False)
    R = geo.segment_count if geo.interleaved else sum(
        c.segment_count for c in geo.components)
    rst = jnp.asarray(geo.rst_marker).astype(jnp.int32).reshape(1, R)

    def v2(raw):
        bits, lens = tokens_impl(raw)
        bits, lens = jax.lax.optimization_barrier((bits, lens))
        words, blen, needs_e = fusedpack.early_levels(bits, lens, caps.l0, T2)
        out_t, ob, needs_d = kern(words.T, blen.T, rst)
        return ob.reshape(-1)[0].astype(jnp.uint8)

    # v3: v2 + final transpose of rows output
    def v3(raw):
        bits, lens = tokens_impl(raw)
        rows, ob, needs = fusedpack.pack_stuff_fused(
            bits, lens, geo.rst_marker, l0=caps.l0, z_cap=caps.z_cap,
            w_out=caps.w_out)
        return rows.reshape(-1)[0].astype(jnp.uint8)

    # v4: full fn incl meta
    full_fn = enc_mod.make_full_encode_fn(geo, caps)

    def v4(raw):
        r = full_fn(raw)
        return r["meta"][-1].astype(jnp.uint8)

    # v5: no barrier variant
    def v5(raw):
        bits, lens = tokens_impl(raw)
        words, blen, needs_e = fusedpack.early_levels(bits, lens, caps.l0, T2)
        out_t, ob, needs_d = kern(words.T, blen.T, rst)
        return ob.reshape(-1)[0].astype(jnp.uint8)

    for name, fn in [("tok+early+T", v1), ("tok..kernel", v2),
                     ("tok..rows.T", v3), ("FULL", v4),
                     ("nobarrier", v5)]:
        t0 = time.time()
        ms = dtime(wrap(fn), (frame,))
        print(f"{name:12s} {ms:8.2f} ms  (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
