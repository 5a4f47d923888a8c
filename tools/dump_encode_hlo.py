#!/usr/bin/env python
"""Compile the full 8K encode program and print its largest HLO ops —
used to find where FULL-vs-sum-of-stages time goes.

Usage: python tools/dump_encode_hlo.py [HxW]
"""

import re
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    frame = np.zeros((h, w, 3), np.uint8)

    enc = Encoder()
    param = Parameters(quality=75, restart_interval=-1)
    geo, res, meta = enc.encode_to_device(frame, param)
    caps = enc._caps[geo]
    full_fn = enc_mod.make_full_encode_fn(geo, caps)
    lowered = jax.jit(full_fn).lower(jnp.asarray(frame))
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)} chars", file=sys.stderr)
    # keep only the ENTRY computation: ops here materialize buffers;
    # ops inside fusion bodies do not
    m = re.search(r"^ENTRY [^\n]*\{(.*?)^\}", txt, re.M | re.S)
    if m:
        txt = m.group(1)
        print(f"ENTRY: {len(txt)} chars", file=sys.stderr)

    # histogram ops by opcode and total output bytes
    sizes = {}
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^ ]* (\w+)",
            txt, re.M):
        dt, shp, opc = m.groups()
        n = 1
        for d in shp.split(","):
            if d:
                n *= int(d)
        bytes_ = n * {"u8": 1, "s8": 1, "pred": 1, "u16": 2, "s16": 2,
                      "bf16": 2, "u32": 4, "s32": 4, "f32": 4}.get(dt, 4)
        sizes[opc] = sizes.get(opc, 0) + bytes_
    for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{k:20s} {v/1e6:10.1f} MB")

    # biggest single ops
    print("\nbiggest single ops:")
    ops = []
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\][^ ]* (\w+)",
            txt, re.M):
        name, dt, shp, opc = m.groups()
        n = 1
        for d in shp.split(","):
            if d:
                n *= int(d)
        bytes_ = n * {"u8": 1, "s8": 1, "pred": 1, "u16": 2, "s16": 2,
                      "bf16": 2, "u32": 4, "s32": 4, "f32": 4}.get(dt, 4)
        ops.append((bytes_, opc, dt, shp, name))
    for b, opc, dt, shp, name in sorted(ops, reverse=True)[:25]:
        print(f"{b/1e6:9.1f} MB  {opc:16s} {dt}[{shp}]  {name[:60]}")


if __name__ == "__main__":
    main()
