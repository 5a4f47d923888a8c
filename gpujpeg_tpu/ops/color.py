"""Integer color-space transforms (VPU elementwise path).

Bit-exact re-implementation of the reference's 8-bit fixed-point transform
(src/gpujpeg_colorspace.h:64-101):

    to:   r = c * 256 / 255            (C integer division)
          out = clamp(((M @ r + 128) >> 8) + base)
    from: r = (c - base) * 256 / 255   (C trunc-toward-zero division!)
          out = clamp((M @ r + 128) >> 8)

Composite conversions route via RGB, exactly like the template
specializations at gpujpeg_colorspace.h:353-427.  On TPU this is pure VPU
work; XLA fuses the whole chain into the surrounding preprocessing.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..types import ColorSpace

# integer matrices from gpujpeg_colorspace.h (row-major 3x3) and bases
_TO_RGB = {  # color space -> (matrix, base) for the "from" direction
    ColorSpace.YCBCR_BT601: ([298, 0, 409, 298, -100, -208, 298, 516, 0], (16, 128, 128)),
    ColorSpace.YCBCR_BT601_256LVLS: ([256, 0, 359, 256, -88, -183, 256, 454, 0], (0, 128, 128)),
    ColorSpace.YCBCR_BT709: ([298, 0, 459, 298, -55, -136, 298, 541, 0], (16, 128, 128)),
    ColorSpace.YUV: ([256, 0, 292, 256, -101, -149, 256, 520, 0], (0, 128, 128)),
}
_FROM_RGB = {  # color space -> (matrix, base) for the "to" direction
    ColorSpace.YCBCR_BT601: ([66, 129, 25, -38, -74, 112, 112, -94, -18], (16, 128, 128)),
    ColorSpace.YCBCR_BT601_256LVLS: ([77, 150, 29, -43, -85, 128, 128, -107, -21], (0, 128, 128)),
    ColorSpace.YCBCR_BT709: ([47, 157, 16, -26, -87, 112, 112, -102, -10], (16, 128, 128)),
    ColorSpace.YUV: ([77, 150, 29, -38, -74, 112, 157, -132, -26], (0, 128, 128)),
}


def _scale_255_to_256(c):
    """c * 256 / 255 for int c in [0, 255].

    256c = 255c + c, so floor(256c/255) = c + floor(c/255) = c + [c == 255]
    — two VPU ops instead of an integer division (the VPU has no divide;
    the lowered div sequence dominated the preprocessor kernel, ~2.3 ms
    of its 2.8 at 8K)."""
    return c + (c >= 255).astype(c.dtype)


def _scale_255_to_256_trunc(c):
    """c * 256 / 255 with C truncation-toward-zero semantics for int c in
    (-255, 256) — the domain of (u8 - base).

    For c >= 0 this is c + [c == 255]; for -255 < c < 0 the quotient
    magnitude |256c|/255 = |c| + |c|/255 truncates to |c|, giving exactly
    c.  Same identity as _scale_255_to_256, division-free."""
    return c + (c >= 255).astype(c.dtype)


def _mat3(r, m):
    """(..., 3) @ m.T as explicit VPU elementwise ops — a (.., 3) x (3, 3)
    integer dot would otherwise lower through a degenerate MXU path."""
    cols = [r[..., 0], r[..., 1], r[..., 2]]
    outs = []
    for i in range(3):
        acc = cols[0] * int(m[i][0])
        acc = acc + cols[1] * int(m[i][1])
        acc = acc + cols[2] * int(m[i][2])
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def _apply_to(c, matrix, base):
    """'to' direction (gpujpeg_color_transform_to<8>)."""
    m = np.asarray(matrix, dtype=np.int32).reshape(3, 3)
    b = np.asarray(base, dtype=np.int32)
    r = _scale_255_to_256(c.astype(jnp.int32))
    out = (_mat3(r, m) + 128) >> 8
    return jnp.clip(out + jnp.asarray(b), 0, 255)


def _apply_from(c, matrix, base):
    """'from' direction (gpujpeg_color_transform_from<8>)."""
    m = np.asarray(matrix, dtype=np.int32).reshape(3, 3)
    b = np.asarray(base, dtype=np.int32)
    r = _scale_255_to_256_trunc(c.astype(jnp.int32) - jnp.asarray(b))
    out = (_mat3(r, m) + 128) >> 8
    return jnp.clip(out, 0, 255)


def transform_steps(src: ColorSpace, dst: ColorSpace) -> List[Tuple[str, ColorSpace]]:
    """Sequence of ('from'|'to', colorspace) primitive steps for src->dst."""
    if src == dst or src == ColorSpace.NONE or dst == ColorSpace.NONE:
        return []
    steps: List[Tuple[str, ColorSpace]] = []
    if src != ColorSpace.RGB:
        steps.append(("from", src))
    if dst != ColorSpace.RGB:
        steps.append(("to", dst))
    return steps


def convert_channels(c0, c1, c2, src: ColorSpace, dst: ColorSpace):
    """Tuple-of-planes variant of convert(): transforms three integer
    channel arrays elementwise without stacking a (..., 3) axis — the
    form usable inside Pallas kernels (where a minor stacked axis would
    wreck the tiling) and shared with the XLA path for testability.

    Returns (c0', c1', c2') int32 in [0, 255]."""
    ch = (c0.astype(jnp.int32), c1.astype(jnp.int32), c2.astype(jnp.int32))
    for direction, cs in transform_steps(src, dst):
        if direction == "from":
            mat, base = _TO_RGB[cs]
            m = np.asarray(mat, dtype=np.int64).reshape(3, 3)
            r = tuple(_scale_255_to_256_trunc(ch[i] - int(base[i]))
                      for i in range(3))
            ch = tuple(jnp.clip(
                (r[0] * int(m[i][0]) + r[1] * int(m[i][1])
                 + r[2] * int(m[i][2]) + 128) >> 8, 0, 255)
                for i in range(3))
        else:
            mat, base = _FROM_RGB[cs]
            m = np.asarray(mat, dtype=np.int64).reshape(3, 3)
            r = tuple(_scale_255_to_256(ch[i]) for i in range(3))
            ch = tuple(jnp.clip(
                ((r[0] * int(m[i][0]) + r[1] * int(m[i][1])
                  + r[2] * int(m[i][2]) + 128) >> 8) + int(base[i]),
                0, 255) for i in range(3))
    return ch


def convert(c, src: ColorSpace, dst: ColorSpace):
    """Transform (..., 3) integer channels from `src` to `dst` color space.

    Returns int32 in [0, 255].  Extra channels beyond 3 must be handled by
    the caller (alpha passes through untouched, as in the reference where the
    matrix only touches .xyz of the uchar4).
    """
    c = c.astype(jnp.int32)
    for direction, cs in transform_steps(src, dst):
        if direction == "from":
            mat, base = _TO_RGB[cs]
            c = _apply_from(c, mat, base)
        else:
            mat, base = _FROM_RGB[cs]
            c = _apply_to(c, mat, base)
    return c


def convert_numpy(c: np.ndarray, src: ColorSpace, dst: ColorSpace) -> np.ndarray:
    """Reference/oracle numpy implementation (for tests and CPU paths)."""
    c = c.astype(np.int64)
    for direction, cs in transform_steps(src, dst):
        if direction == "from":
            mat, base = _TO_RGB[cs]
            m = np.asarray(mat, dtype=np.int64).reshape(3, 3)
            t = (c - np.asarray(base)) * 256
            r = np.trunc(t / 255).astype(np.int64)
            c = np.clip((r @ m.T + 128) >> 8, 0, 255)
        else:
            mat, base = _FROM_RGB[cs]
            m = np.asarray(mat, dtype=np.int64).reshape(3, 3)
            r = (c * 256) // 255
            c = np.clip(((r @ m.T + 128) >> 8) + np.asarray(base), 0, 255)
    return c
