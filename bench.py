#!/usr/bin/env python
"""Headline benchmark: 8K (7680x4320, 33 Mpix) RGB encode at Q75.

Baseline: GPUJPEG on RTX 3080 encodes this in 6.20 ms/frame including PCIe
transfers (reference README.md:110-115, BASELINE.md).  vs_baseline is
baseline_ms / our_ms (>1 means we are faster).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostic lines go to stderr.
"""

import json
import sys
import time

import numpy as np


def synth_frame(h, w, seed=7):
    """Photograph-like synthetic content: low-frequency field + fine noise
    (compressibility comparable to the reference's 8K test frame)."""
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, size=(h // 16, w // 16, 3)).astype(np.float32)
    up = np.kron(small, np.ones((16, 16, 1), np.float32))
    noise = rng.normal(0, 6.0, size=(h, w, 3)).astype(np.float32)
    return np.clip(up + noise, 0, 255).astype(np.uint8)


def main():
    h, w = 4320, 7680
    import jax
    from gpujpeg_tpu import Encoder, Parameters

    frame = synth_frame(h, w)
    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)  # RESTART_AUTO

    # warmup (2 iterations: compile + steady-state buffers)
    out = enc.encode(frame, param)
    out = enc.encode(frame, param)
    print(f"stream size: {len(out)/1e6:.2f} MB "
          f"({len(out)*8/(h*w):.3f} bpp)", file=sys.stderr)

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        enc.encode(frame, param)
    dt = (time.perf_counter() - t0) / n * 1000.0

    baseline_ms = 6.20  # RTX 3080, 8K Q75 incl. transfers
    print(json.dumps({
        "metric": "encode_8k_rgb_q75_ms_per_frame",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / dt, 3),
    }))


if __name__ == "__main__":
    main()
