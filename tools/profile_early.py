#!/usr/bin/env python
"""Isolate tokenizer / barrier / early_levels / transpose costs at 8K."""

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
    geo, res, meta = enc.encode_to_device(
        frame, Parameters(quality=75, restart_interval=-1))
    caps = enc._caps[geo]
    tokens_impl = enc_mod.make_rows_tokens_impl(geo)
    T2 = fusedpack.pow2_ge(enc_mod.token_slots(geo))

    bits0, lens0 = jax.block_until_ready(jax.jit(tokens_impl)(frame))

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

    def wrapu32(body_fn):
        def mk(n):
            @jax.jit
            def lp(a, b):
                def body(i, carry):
                    return body_fn(a.at[0, 0].set(carry), b)
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            return lp
        return mk

    # e1: early_levels from HBM, no transpose
    def e1(bits, lens):
        wds, blen, ne = fusedpack.early_levels(bits, lens, caps.l0, T2)
        return wds.reshape(-1)[0] + blen.reshape(-1)[0].astype(jnp.uint32)

    # e2: early_levels + transpose
    def e2(bits, lens):
        wds, blen, ne = fusedpack.early_levels(bits, lens, caps.l0, T2)
        wt, bt = wds.T, blen.T
        return wt.reshape(-1)[0] + bt.reshape(-1)[0].astype(jnp.uint32)

    # e3: transpose only (of bits)
    def e3(bits, lens):
        return bits.T.reshape(-1)[0]

    # e4: pure copy pass (baseline HBM rw)
    def e4(bits, lens):
        return (bits + jnp.uint32(1)).reshape(-1)[0]

    for name, fn in [("early(HBM)", e1), ("early+T(HBM)", e2),
                     ("transpose", e3), ("copy", e4)]:
        ms = dtime(wrapu32(fn), (bits0, lens0))
        print(f"{name:14s} {ms:8.2f} ms", flush=True)

    # t1: tokenizer with sum-consumer (forced full compute, no big write)
    def wrapraw(body_fn):
        def mk(n):
            @jax.jit
            def lp(raw):
                def body(i, carry):
                    return body_fn(raw.at[0, 0, 0].set(carry))
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return lp
        return mk

    def t1(raw):
        bits, lens = tokens_impl(raw)
        return (jnp.sum(lens) + jnp.sum(bits.astype(jnp.int32))
                ).astype(jnp.uint8)

    # t2: tokenizer + barrier + early + transpose, checksum consumer
    def t2(raw):
        bits, lens = tokens_impl(raw)
        bits, lens = jax.lax.optimization_barrier((bits, lens))
        wds, blen, ne = fusedpack.early_levels(bits, lens, caps.l0, T2)
        wt, bt = wds.T, blen.T
        return (wt.reshape(-1)[0] + bt.reshape(-1)[0].astype(jnp.uint32)
                ).astype(jnp.uint8)

    # t3: same as t2 but NO barrier
    def t3(raw):
        bits, lens = tokens_impl(raw)
        wds, blen, ne = fusedpack.early_levels(bits, lens, caps.l0, T2)
        wt, bt = wds.T, blen.T
        return (wt.reshape(-1)[0] + bt.reshape(-1)[0].astype(jnp.uint32)
                ).astype(jnp.uint8)

    for name, fn in [("tok(sum)", t1), ("tok+e+T barr", t2),
                     ("tok+e+T nobar", t3)]:
        ms = dtime(wrapraw(fn), (frame,))
        print(f"{name:14s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
