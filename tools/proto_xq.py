#!/usr/bin/env python
"""Prototype: XLA relayout variants + in-kernel transpose for the
entropy megakernel's input feed (round-4 data-movement attack).

Variants measured on the 8K luma plane p32 (H, W/4) u32:

  a1  current xbd chain: (nbh,8,nsr,rstn,2) -> (3,1,4,0,2) => (128, S)
  a2  xq16: (nbh,8,nsr,16) -> (0,2,1,3) => (S, 128)  [16-word contig]
  a3  xq2:  (nbh,8,nsr,8,2) -> (0,2,3,1,4) => (S, 128) [xbd sublane
      order after in-kernel .T — minor run 2 words]
  k0  kernel consuming (128, R) xbd blocks directly (status quo shape)
  k1  kernel consuming (R, 128) xq blocks + in-kernel jnp .T
  k2  k1 + static sublane permutation (r,b,g)->(b,r,g) via index gather

Each kernel does a cheap reduce so nothing is DCE'd; the delta between
k1/k2 and k0 is the in-kernel transpose/permute cost.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 4320, 7680
RSTN = 8
NSR = W // (8 * RSTN)          # 120
NBH = H // 8                   # 540
S = NBH * NSR                  # 64800
W4 = W // 4


def xbd_chain(p32):
    x = p32.reshape(NBH, 8, NSR, RSTN, 2)
    return x.transpose(3, 1, 4, 0, 2).reshape(RSTN * 16, S)


def xq16_chain(p32):
    x = p32.reshape(NBH, 8, NSR, 16)
    return x.transpose(0, 2, 1, 3).reshape(S, 128)


def xq2_chain(p32):
    x = p32.reshape(NBH, 8, NSR, 8, 2)
    return x.transpose(0, 2, 3, 1, 4).reshape(S, 128)


def _k0(in_ref, out_ref):
    w = in_ref[:, :]                       # (128, R)
    out_ref[:, :] = jnp.max((w ^ pltpu.roll(w, 1, axis=0))
                            .astype(jnp.int32), axis=0,
                            keepdims=True).astype(jnp.uint32)


def _bitswap_sub(w, i, j):
    """Swap index bits i > j of the sublane dimension: a fixed
    permutation as 1 iota + 2 rolls + 2 selects (no captured arrays)."""
    d = (1 << i) - (1 << j)
    sub = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    bi = (sub >> i) & 1
    bj = (sub >> j) & 1
    n = w.shape[0]
    up = pltpu.roll(w, d % n, axis=0)        # dest p <- src p-d
    dn = pltpu.roll(w, (n - d) % n, axis=0)  # dest p <- src p+d
    return jnp.where((bi == 1) & (bj == 0), up,
                     jnp.where((bi == 0) & (bj == 1), dn, w))


def _k1(in_ref, out_ref, *, perm):
    w = in_ref[:, :].T                     # (R, 128) -> (128, R)
    if perm is not None:
        # (r,b,g)->(b,r,g): swap sublane index bit fields r (6..4) and
        # b (3..1) — three pairwise bit swaps
        for i, j in ((6, 3), (5, 2), (4, 1)):
            w = _bitswap_sub(w, i, j)
    out_ref[:, :] = jnp.max((w ^ pltpu.roll(w, 1, axis=0))
                            .astype(jnp.int32), axis=0,
                            keepdims=True).astype(jnp.uint32)


def make_k(kind, R_tile=256):
    if kind == "k0":
        kern = _k0
        in_spec = pl.BlockSpec((128, R_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        in_shape_check = (128, S)
    else:
        # (r,b,g) -> (b,r,g): sub' = b*16 + r*2 + g from sub = r*16+b*2+g
        perm = None
        if kind == "k2":
            src = np.arange(128)
            r, bg = src // 16, src % 16
            b, g = bg // 2, bg % 2
            tgt = b * 16 + r * 2 + g
            perm = np.zeros(128, np.int32)
            perm[tgt] = src                # out[tgt] = in[src]
        kern = functools.partial(_k1, perm=perm)
        in_spec = pl.BlockSpec((R_tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        in_shape_check = (S, 128)

    def fn(x):
        assert x.shape == in_shape_check, (x.shape, in_shape_check)
        G = -(-S // R_tile)
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((1, R_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, G * R_tile), jnp.uint32),
        )(x)
    return fn


def dtime(make_loop, args, n_hi=9, reps=3):
    times = {}
    for n in (1, n_hi):
        lp = make_loop(n)
        jax.block_until_ready(lp(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(lp(*args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0


def mk(f):
    def make(n):
        @jax.jit
        def lp(p):
            def body(i, c):
                r = f(p.at[0, 0].set(c))
                return r.reshape(-1)[0]
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
        return lp
    return make


def main():
    rng = np.random.default_rng(0)
    p32_np = rng.integers(0, 1 << 32, (H, W4), dtype=np.uint64) \
        .astype(np.uint32)
    x = jnp.asarray(p32_np)

    # correctness: xq chains + in-kernel transpose == xbd chain
    xbd = np.asarray(jax.jit(xbd_chain)(x))
    xq16 = np.asarray(jax.jit(xq16_chain)(x))
    xq2 = np.asarray(jax.jit(xq2_chain)(x))
    src = np.arange(128)
    r, bg = src // 16, src % 16
    b, g = bg // 2, bg % 2
    # xq16[s, r*16+b*2+g] == xbd[b*16+r*2+g, s]
    ok16 = np.array_equal(xq16.T[(b * 16 + r * 2 + g)[..., None]
                                 * 0 + np.arange(128)[:, None] * 0
                                 + (r * 16 + b * 2 + g)[:, None],
                                 np.arange(S)[None, :]][
                              np.argsort(b * 16 + r * 2 + g)],
                          xbd[np.argsort(np.arange(128))])
    # simpler: build mapping directly
    m16 = np.empty(128, np.int64)
    m16[b * 16 + r * 2 + g] = r * 16 + b * 2 + g
    ok16 = np.array_equal(xq16.T[m16], xbd)
    ok2 = np.array_equal(xq2.T, xbd)
    print("xq16 ok:", ok16, "xq2 ok:", ok2, flush=True)
    if jax.default_backend() != "tpu":
        return 0

    jax.block_until_ready(x)
    print(f"a1 xbd  : {dtime(mk(xbd_chain), (x,)):7.3f} ms/comp",
          flush=True)
    print(f"a2 xq16 : {dtime(mk(xq16_chain), (x,)):7.3f} ms/comp",
          flush=True)
    print(f"a3 xq2  : {dtime(mk(xq2_chain), (x,)):7.3f} ms/comp",
          flush=True)

    xbd_d = jax.block_until_ready(jnp.asarray(xbd))
    xq_d = jax.block_until_ready(jnp.asarray(xq2))
    print(f"k0 direct(128,R): {dtime(mk(make_k('k0')), (xbd_d,)):7.3f}"
          " ms/comp", flush=True)
    print(f"k1 .T   (R,128): {dtime(mk(make_k('k1')), (xq_d,)):7.3f}"
          " ms/comp", flush=True)
    print(f"k2 .T+perm     : {dtime(mk(make_k('k2')), (xq_d,)):7.3f}"
          " ms/comp", flush=True)
    # end-to-end: relayout + kernel consume
    for nm, chain, kk in (("a2+k2", xq16_chain, "k2"),
                          ("a3+k1", xq2_chain, "k1")):
        f = lambda p, c=chain, k=make_k(kk): k(c(p))
        print(f"{nm}          : {dtime(mk(f), (x,)):7.3f} ms/comp",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
