#!/usr/bin/env python
"""Headline benchmark: 8K (7680x4320, 33 Mpix) RGB encode at Q75.

Measures the DEVICE encode pipeline (preprocess -> MXU DCT+quant -> tokenize
-> segment-parallel pack -> on-device byte stuffing + restart markers), i.e.
the same thing the reference reports as "without PCIe transfers": GPUJPEG on
RTX 3080 encodes 8K Q75 in ~2.45 ms/frame device-side (README.md:128 reports
2.13 ms at Q10 and 2.50 ms at Q90; Q75 interpolated).  The with-transfers
number (6.20 ms) is not comparable on this rig: the host<->TPU link here is
a development tunnel ~200x slower than PCIe 3.0 x16, and worse, the first
device-to-host fetch in a process permanently degrades the tunnel's execution
dispatch (~1.8 s/step afterwards).  The benchmark therefore runs in two
phases:

  1. a WARMUP SUBPROCESS does the full encode including host readback:
     capacity convergence, stream assembly, and a PIL decode check.  It
     reports the converged jit capacities and populates the persistent
     compilation cache.
  2. the parent process re-builds the identical program (compile-cache hit)
     and times it honestly with the DELTA method: N serialized encodes
     inside one jit program (block_until_ready does not synchronize through
     this tunnel, so wall-clock deltas between N values are the only true
     device-time measurement; constants cancel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostic lines go to stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

H, W = 4320, 7680
BASELINE_MS = 2.45  # RTX 3080, 8K Q75, without PCIe transfers


def synth_frame_device(h, w, seed=7):
    """Photo-like synthetic content generated on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (h // 16, w // 16, 3), jnp.float32,
                                   0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    return gen(jax.random.PRNGKey(seed))


def warmup():
    """Subprocess: full encode with readback; print converged caps as JSON."""
    import io

    import jax

    from gpujpeg_tpu import Encoder, Parameters

    frame = synth_frame_device(H, W)
    jax.block_until_ready(frame)
    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)

    t0 = time.perf_counter()
    out = enc.encode(frame, param)
    print(f"[warmup] first frame {time.perf_counter() - t0:.0f} s, "
          f"stream {len(out) / 1e6:.2f} MB "
          f"({len(out) * 8 / (H * W):.3f} bpp)", file=sys.stderr)
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(out))
        img.load()
        assert img.size == (W, H)
        print(f"[warmup] PIL decode OK {img.size}", file=sys.stderr)
    except ImportError:
        pass

    geo = next(iter(enc._caps))
    caps = enc._caps[geo]
    print(json.dumps({"pack": list(caps.pack), "z_cap": caps.z_cap}))


def main():
    # phase 1: warmup subprocess (pays the tunnel's fetch penalty there)
    env = dict(os.environ)
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--warmup"], capture_output=True, text=True, env=env)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        sys.stderr.write(r.stdout)
        raise SystemExit("warmup subprocess failed")
    caps_json = json.loads(r.stdout.strip().splitlines()[-1])

    # phase 2: fetch-free steady-state timing
    import jax

    from gpujpeg_tpu import Parameters
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu import Encoder

    frame = synth_frame_device(H, W)
    jax.block_until_ready(frame)
    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)

    # preload the converged capacities so the compiled program matches the
    # warmup subprocess (compile-cache hit) and never overflows
    from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat
    from gpujpeg_tpu.utils.geometry import get_geometry

    pi = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    geo = get_geometry(enc_mod.adjust_params(param, pi), pi)
    caps = enc_mod.Caps(pack=tuple(caps_json["pack"]),
                        z_cap=int(caps_json["z_cap"]))

    # Honest timing on this rig: block_until_ready does NOT synchronize
    # through the tunnel, and any fetch costs a large constant.  So run N
    # serialized encodes INSIDE one jit program (each frame perturbed by the
    # previous frame's first output word to force true sequential execution),
    # fetch one element, and report the wall-clock DELTA between N values —
    # constants (dispatch, fetch, transfer) cancel exactly.
    import functools

    import jax.numpy as jnp

    base = enc_mod.make_full_encode_fn(geo, caps)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(raw, n):
        def body(i, carry):
            res = base(raw.at[0, 0, 0].set(carry))
            return res["rows"][0, 0].astype(jnp.uint8)

        return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

    _ = np.asarray(loop(frame, 1))  # sacrificial first fetch + compile
    times = {}
    n_hi = 9
    for n in (1, n_hi):
        _ = np.asarray(loop(frame, n))  # compile this n
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(frame, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
        print(f"[bench] n={n}: {best * 1000:.1f} ms", file=sys.stderr)
    dt = (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    print(f"{n} frames, {dt:.2f} ms/frame device pipeline", file=sys.stderr)
    print(json.dumps({
        "metric": "encode_8k_rgb_q75_device_ms_per_frame",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / dt, 3),
    }))


if __name__ == "__main__":
    if "--warmup" in sys.argv:
        warmup()
    else:
        main()
