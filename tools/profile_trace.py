#!/usr/bin/env python
"""Capture a device trace of the FULL 8K encode and dump top ops by time."""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod

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
    full_fn = enc_mod.make_full_encode_fn(geo, caps)

    @jax.jit
    def loop(raw):
        def body(i, carry):
            r = full_fn(raw.at[0, 0, 0].set(carry))
            return r["meta"][-1].astype(jnp.uint8)
        return jax.lax.fori_loop(0, 4, body, jnp.uint8(0))

    jax.block_until_ready(loop(frame))

    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        jax.block_until_ready(loop(frame))

    # parse the perfetto trace
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, file=sys.stderr)
    ops = {}
    for fp in files:
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            # device track events only (heuristic: XLA op names)
            ops.setdefault((pid, name), [0, 0])
            ops[(pid, name)][0] += dur
            ops[(pid, name)][1] += 1
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])[:60]
    for (pid, name), (dur, cnt) in rows:
        print(f"{dur/1000:10.2f} ms  x{cnt:<4d} pid={pid} {name[:110]}")


if __name__ == "__main__":
    main()
