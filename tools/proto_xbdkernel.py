#!/usr/bin/env python
"""Prototype: DENSE Pallas relayout kernel packed-plane -> xbd vs the XLA
reshape/transpose chain (models/encoder.make_rows_xbd_impl).

  in  p32 (H, W/4) u32, word c4 = sr*16 + b*2 + k of row r
  out xbd (128, nbh*nsr) u32: sublane = b*16 + (r%8)*2 + k,
      lane = (r//8)*nsr + sr   (EXACT segment lanes, no padding)

Grid steps cover GBR block rows with GBR*nsr % 128 == 0; H is padded to
a GBR*8 multiple by the caller (trailing garbage lanes = pad segments).
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
NSR = W // (8 * RSTN)          # 120 segments per block row


def _kernel(in_ref, out_ref, t_ref, *, GBR: int, nsr: int):
    R = GBR * 8
    t_ref[:, :] = in_ref[:, :].T           # (W/4, R) [c4, (g, r8)]
    for b2k in range(16):
        b, k = b2k >> 1, b2k & 1
        tkb = t_ref[b2k::16, :].T           # (R, nsr) [(g, r8), sr]
        for g in range(GBR):
            out_ref[b * 16 + k:b * 16 + k + 16:2,
                    g * nsr:(g + 1) * nsr] = tkb[g * 8:g * 8 + 8, :]


def make_fn(GBR, nbh_pad, interpret=False):
    R = GBR * 8
    kern = functools.partial(_kernel, GBR=GBR, nsr=NSR)

    def fn(p32):  # (nbh_pad*8, W/4)
        return pl.pallas_call(
            kern,
            grid=(nbh_pad // GBR,),
            in_specs=[pl.BlockSpec((R, W // 4), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, GBR * NSR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, nbh_pad * NSR),
                                           jnp.uint32),
            scratch_shapes=[pltpu.VMEM((W // 4, R), jnp.uint32)],
            interpret=interpret,
        )(p32)
    return fn


def xla_relayout(p32, nbh):
    x = p32.reshape(nbh, 8, NSR, RSTN, 2)
    return x.transpose(3, 1, 4, 0, 2).reshape(RSTN * 16, nbh * NSR)


def main():
    rng = np.random.default_rng(0)
    nbh = H // 8
    GBR = 128 // int(np.gcd(NSR, 128))      # 16 at 8K
    nbh_pad = -(-nbh // GBR) * GBR          # 544
    p32_np = rng.integers(0, 1 << 32, (H, W // 4), dtype=np.uint64) \
        .astype(np.uint32)
    p32_pad = np.zeros((nbh_pad * 8, W // 4), np.uint32)
    p32_pad[:H] = p32_np

    interp = False
    try:
        interp = jax.default_backend() == "cpu"
    except Exception:
        pass
    ref = np.asarray(jax.jit(functools.partial(xla_relayout, nbh=nbh))(
        jnp.asarray(p32_np)))
    fn = make_fn(GBR, nbh_pad, interpret=interp)
    out = np.asarray(jax.jit(fn)(jnp.asarray(p32_pad)))
    ok = np.array_equal(out[:, :nbh * NSR], ref)
    print("correct:", ok, "backend:", jax.default_backend())
    if not ok:
        print(np.argwhere(out[:, :nbh * NSR] != ref)[:4])
        return 1
    if jax.default_backend() == "cpu":
        return 0

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

    x = jax.block_until_ready(jnp.asarray(p32_np))
    xp = jax.block_until_ready(jnp.asarray(p32_pad))

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

    print(f"xla relayout: "
          f"{dtime(mk(functools.partial(xla_relayout, nbh=nbh)), (x,)):.3f}"
          " ms/comp")
    print(f"pallas dense: {dtime(mk(fn), (xp,)):.3f} ms/comp")
    return 0


if __name__ == "__main__":
    sys.exit(main())
