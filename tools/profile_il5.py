#!/usr/bin/env python
"""Interleaved 4:4:4 encode: restart-interval sweep on the TPU.

The interleaved megakernel pads segment slot counts to a power of two
(C0 = rst * 192 slots for 4:4:4); rst=2 pads 384->512 (+33%), rst=5
pads 960->1024 (+6.7%).  Total kernel work scales with the pad factor
(lanes x slots is constant otherwise), so rst=5 should cut ~20%.

Usage: python tools/profile_il5.py [HxW] [rst,rst,...]
"""

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
    from gpujpeg_tpu.utils.geometry import get_geometry

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    rsts = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else ["2", "4", "5", "10"])]

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = gen(jax.random.PRNGKey(7))
    jax.block_until_ready(frame)

    def delta(loopmk, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            loop = loopmk(n)
            _ = np.asarray(loop(*args))
            best = float("inf")
            for _r in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(loop(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    for rst in rsts:
        t0 = time.time()
        enc = Encoder()
        param = Parameters(quality=75, restart_interval=rst,
                           interleaved=True)
        geo, res, meta = enc.encode_to_device(frame, param)
        caps = enc._caps[geo]
        fn = enc_mod.make_full_encode_fn(geo, caps)

        def mk(n):
            @jax.jit
            def loop(raw):
                def body(i, carry):
                    r = fn(raw.at[0, 0, 0].set(carry))
                    return r["meta"][-1].astype(jnp.uint8)
                return jax.lax.fori_loop(0, n, body, jnp.uint8(0))
            return loop

        dt = delta(mk, (frame,))
        print(f"rst={rst}: {dt:.2f} ms  (setup {time.time()-t0:.0f}s, "
              f"seg={geo.segment_count} bps={geo.max_blocks_per_seg})",
              flush=True)


if __name__ == "__main__":
    main()
