#!/usr/bin/env python
"""Internal phase breakdown of the entropy megakernel (stop_after stubs):
dct -> token -> tree -> FULL on the 8K luma component's real inputs.

Usage: python tools/profile_kphases.py [HxW] [quality]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.ops import fusedpack
    from gpujpeg_tpu.utils import tables

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 75

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = jax.block_until_ready(gen(jax.random.PRNGKey(7)))
    enc = Encoder()
    geo, res, meta = enc.encode_to_device(
        frame, Parameters(quality=q, restart_interval=-1))
    caps = enc._caps[geo]
    print(f"caps={caps}", file=sys.stderr, flush=True)
    consts = tables.entropy_kernel_consts(q)

    xbd_impl, xbd_infos = enc_mod.make_rows_xbd_impl(geo)
    xbds = jax.block_until_ready(jax.jit(xbd_impl)(frame))
    # luma only (largest component)
    xbd = xbds[0]
    info = xbd_infos[0]
    vt = jnp.asarray(info["valid"])
    lt = jnp.asarray(np.full((1, info["S"]), 1, np.int32))
    rstm = info["rst"]
    dk = info["dct_key"]

    def dtime(make_loop, args, n_hi=9, reps=3):
        # fetch-based sync: block_until_ready does not reliably wait on
        # the axon tunnel; the delta method cancels the fetch constant
        times = {}
        for n in (1, n_hi):
            lp = make_loop(n)
            _ = np.asarray(lp(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(lp(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    xq = bool(info.get("xq", False))
    print(f"xq={xq} xbd.shape={xbd.shape}", file=sys.stderr, flush=True)

    def mk(stop):
        def makeloop(n):
            @jax.jit
            def lp(xbd):
                def body(i, carry):
                    o, ob, nd = fusedpack.entropy_fused_u8(
                        xbd.at[0, 0].set(carry.astype(jnp.uint32)),
                        vt, lt, rstm, caps.z_cap, caps.w_out, consts,
                        dk, compact_after=tuple(caps.compact), xq=xq,
                        stop_after=stop)
                    return o.reshape(-1)[0].astype(jnp.int32)
                return jax.lax.fori_loop(0, n, body, jnp.int32(0))
            return lp
        return makeloop

    for stop in ("dct", "runs", "token", "tree", None):
        t0 = time.time()
        ms = dtime(mk(stop), (xbd,))
        print(f"{str(stop):8s} {ms:8.2f} ms  (setup {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
