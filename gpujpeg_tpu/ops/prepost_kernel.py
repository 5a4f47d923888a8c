"""Pallas pre/postprocessor: interleaved-RGB <-> packed component planes.

XLA cannot read a stride-3 (or stride-4) minor dimension fast: every
formulation of the encode preprocessor (channel slice, quad byte math,
bitcast + strided word slice) measured 4-6 ms at 8K — pure shuffle cost
on ~130 MB of traffic whose floor is ~0.2 ms.  The reference does this
with a thread-per-pixel CUDA kernel (src/gpujpeg_preprocessor.cu); the
TPU-native equivalent is a Pallas kernel built from three cheap
primitives (measured on real hardware):

  * in-kernel 2D transpose: (128, CW) u32 <-> (CW, 128), ~0.4 ms per
    94 MB round trip (XLU) — moves the pixel axis onto SUBLANES where
    byte tricks work;
  * byte extraction: elementwise shifts on u32 words (VPU);
  * sublane packing: pltpu.bitcast u8->u32 / u16->u32 merges 4/2
    consecutive SUBLANES for free — this is both the final 4-samples-
    per-word pack and (byte-extract + narrow + bitcast) the x-decimator.

Pipeline per component (decimation dx in {1, 2, 4}; row decimation is a
major-dim slice, which XLA does at full speed):

  raw (H, W, 3) u8 --XLA--> pad to RGBX, bitcast (H, W) u32, rows[::dy]
  --pallas--> [per (R, CW) chunk] T -> bytes -> color transform ->
              u8-bitcast pack -> (dx>1: even-byte fold) -> T back
  --XLA--> slice real dims, zero-pad to (data_h, data_w/4) u32

Output is the PACKED-u32 plane layout consumed by the entropy
megakernel's xbd feed (models/encoder.make_rows_xbd_impl).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import ColorSpace, ImageParameters, PixelFormat
from . import color


def _row_chunk(h: int) -> int:
    """Largest divisor of h that is a multiple of 8 and <= 96 (the cap
    keeps a double-buffered full-width 8K row chunk inside the 16 MB
    VMEM budget)."""
    for r in range(96, 7, -8):
        if h % r == 0:
            return r
    return 0


def _col_chunk(w: int, dx: int) -> int:
    """Largest divisor of w (pixels) <= 2048 compatible with the pack
    chain: multiples of 16*dx keep every bitcast stage's sublane count a
    multiple of 8."""
    step = 16 * dx
    for c in range(2048 - 2048 % step, step - 1, -step):
        if w % c == 0:
            return c
    return 0


def _pre_kernel_body(px_ref, out_ref, *, src_cs, dst_cs, comp_idx: int,
                     dx: int, SW: int, identity: bool):
    # full-width row chunk; the transpose trick runs over SW-pixel slabs
    # so the (pixels, rows) intermediates stay small (out lane widths per
    # slab need not be 128-divisible — in-kernel ref slices may be
    # arbitrary static ranges, unlike BlockSpec block shapes)
    W = px_ref.shape[1]
    for j in range(0, W, SW):
        xt = px_ref[:, j:j + SW].T         # (SW, R) pixels on sublanes
        if identity:
            c = ((xt >> jnp.uint32(8 * comp_idx)) & jnp.uint32(0xFF)) \
                .astype(jnp.int32)
        else:
            r = (xt & jnp.uint32(0xFF)).astype(jnp.int32)
            g = ((xt >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
            b = ((xt >> 16) & jnp.uint32(0xFF)).astype(jnp.int32)
            c = color.convert_channels(r, g, b, src_cs, dst_cs)[comp_idx]
        w = pltpu.bitcast(c.astype(jnp.uint8), jnp.uint32)   # (SW/4, R)
        d = dx
        while d > 1:
            # keep bytes of even sample positions: bytes 0 and 2 of each
            # word, narrowed to u16 and re-merged by the sublane bitcast
            ev = (w & jnp.uint32(0xFF)) | ((w >> 16) & jnp.uint32(0xFF00))
            w = pltpu.bitcast(ev.astype(jnp.uint16), jnp.uint32)
            d //= 2
        ow = SW // (4 * dx)
        out_ref[:, j // (4 * dx):j // (4 * dx) + ow] = w.T


@functools.lru_cache(maxsize=64)
def _cached_pre_kernel(src_cs, dst_cs, comp_idx, dx, R, CW, h, w,
                       interpret):
    kernel = functools.partial(
        _pre_kernel_body, src_cs=src_cs, dst_cs=dst_cs,
        comp_idx=comp_idx, dx=dx, SW=CW,
        identity=(src_cs == dst_cs or src_cs == ColorSpace.NONE
                  or dst_cs == ColorSpace.NONE))

    def fn(px):
        return pl.pallas_call(
            kernel,
            grid=(h // R,),
            in_specs=[pl.BlockSpec((R, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, w // (4 * dx)), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w // (4 * dx)),
                                           jnp.uint32),
            interpret=interpret,
        )(px)

    return fn


def pre_supported(geo, pi: ImageParameters) -> bool:
    """True when the Pallas packed preprocessor covers this config."""
    if pi.pixel_format != PixelFormat.P444_U8_P012 or geo.comp_count != 3:
        return False
    if pi.width_padding:
        return False
    src, dst = pi.color_space, geo.param.color_space_internal
    if not (src == dst or src == ColorSpace.NONE or dst == ColorSpace.NONE):
        for direction, cs in color.transform_steps(src, dst):
            if cs not in (color._TO_RGB if direction == "from"
                          else color._FROM_RGB):
                return False
    H, W = pi.height, pi.width
    for c in geo.components:
        dx = geo.max_h // c.samp_h
        dy = geo.max_v // c.samp_v
        if dx not in (1, 2, 4) or dy not in (1, 2, 4):
            return False
        if W % dx or H % dy:
            return False
        h_c, w_c = H // dy, W // dx
        if h_c != c.height or w_c != c.width:
            return False
        if not _row_chunk(h_c) or not _col_chunk(W, dx):
            return False
    return True


def preprocess_packed(raw, geo, pi: ImageParameters,
                      interpret: bool = False) -> Optional[List]:
    """raw (H, W, 3) u8 -> [(data_h, data_w/4) u32 packed plane per
    component], or None when unsupported (caller falls back to the XLA
    preprocessor + bitcast pack)."""
    if not pre_supported(geo, pi):
        return None
    H, W = pi.height, pi.width
    rgbx = jnp.pad(raw, ((0, 0), (0, 0), (0, 1)))
    px = jax.lax.bitcast_convert_type(rgbx, jnp.uint32)   # (H, W)
    src, dst = pi.color_space, geo.param.color_space_internal
    out = []
    for c in geo.components:
        dx = geo.max_h // c.samp_h
        dy = geo.max_v // c.samp_v
        px_c = px[::dy] if dy > 1 else px
        h_c = H // dy
        R = _row_chunk(h_c)
        CW = _col_chunk(W, dx)
        fn = _cached_pre_kernel(src, dst, c.index, dx, R, CW, h_c, W,
                                interpret)
        p32 = fn(px_c)
        dw4 = c.data_width // 4
        p32 = jnp.pad(p32, ((0, c.data_height - h_c),
                            (0, dw4 - p32.shape[1])))
        out.append(p32)
    return out
