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


def _row_chunk_for(h: int, per_row_bytes: int) -> int:
    """Largest divisor of h that is a multiple of 8, <= 96, and keeps the
    kernel's scoped VMEM inside the hardware's 16 MB limit given an
    estimated per-row byte cost.  Budget 13 MB for safety margin."""
    cap = min(96, int(13e6) // max(per_row_bytes, 1) // 8 * 8)
    for r in range(cap, 7, -8):
        if h % r == 0:
            return r
    return 0


def _pre_row_chunk(h: int, w: int, dx: int, sw: int,
                   n_out: int = 1) -> int:
    """Row chunk for the encode preprocessor kernel.

    Cost model calibrated on the one real datapoint (Mosaic reported
    24.27 MB scoped at R=96, w=15360, dx=1, sw=2048): double-buffered
    in/out blocks 8*R*w + n_out*2*R*w/dx bytes plus ~50*sw bytes of slab
    temporaries per row (+16*sw per extra fused component output)."""
    return _row_chunk_for(h, 8 * w + n_out * 2 * w // dx
                          + (50 + 16 * (n_out - 1)) * sw)


def _post_row_chunk(h: int, w: int, dxc: int, sw: int) -> int:
    """Row chunk for the decode postprocessor kernel: double-buffered
    luma-in (2*R*w) + chroma-in (4*R*w/dxc) + RGBX-out (8*R*w) blocks
    plus slab temporaries (the upsample repeats make them a bit larger
    than the pre kernel's)."""
    return _row_chunk_for(h, 10 * w + 4 * w // dxc + 60 * sw)


def _col_chunk(w: int, dx: int) -> int:
    """Largest divisor of w (pixels) <= 2048 compatible with the pack
    chain: multiples of 16*dx keep every bitcast stage's sublane count a
    multiple of 8."""
    step = 16 * dx
    for c in range(2048 - 2048 % step, step - 1, -step):
        if w % c == 0:
            return c
    return 0


def _pre_kernel_body(px_ref, *out_refs, src_cs, dst_cs,
                     comp_idxs: tuple, dx: int, SW: int, identity: bool):
    # full-width row chunk; the transpose trick runs over SW-pixel slabs
    # so the (pixels, rows) intermediates stay small (out lane widths per
    # slab need not be 128-divisible — in-kernel ref slices may be
    # arbitrary static ranges, unlike BlockSpec block shapes).  All
    # same-decimation components are emitted from ONE pass: the image
    # read, the slab transposes, and the color transform are shared
    # (separate per-component kernels re-read the full frame each —
    # measured 5.4 ms vs the ~0.6 ms traffic floor at 8K).
    W = px_ref.shape[1]
    for j in range(0, W, SW):
        xt = px_ref[:, j:j + SW].T         # (SW, R) pixels on sublanes
        if identity:
            cvals = [((xt >> jnp.uint32(8 * ci)) & jnp.uint32(0xFF))
                     .astype(jnp.int32) for ci in comp_idxs]
        else:
            r = (xt & jnp.uint32(0xFF)).astype(jnp.int32)
            g = ((xt >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
            b = ((xt >> 16) & jnp.uint32(0xFF)).astype(jnp.int32)
            conv = color.convert_channels(r, g, b, src_cs, dst_cs)
            cvals = [conv[ci] for ci in comp_idxs]
        for out_ref, c in zip(out_refs, cvals):
            w = pltpu.bitcast(c.astype(jnp.uint8), jnp.uint32)  # (SW/4, R)
            d = dx
            while d > 1:
                # keep bytes of even sample positions: bytes 0 and 2 of
                # each word, narrowed to u16 and re-merged by the sublane
                # bitcast
                ev = ((w & jnp.uint32(0xFF))
                      | ((w >> 16) & jnp.uint32(0xFF00)))
                w = pltpu.bitcast(ev.astype(jnp.uint16), jnp.uint32)
                d //= 2
            ow = SW // (4 * dx)
            out_ref[:, j // (4 * dx):j // (4 * dx) + ow] = w.T


@functools.lru_cache(maxsize=64)
def _cached_pre_kernel(src_cs, dst_cs, comp_idxs: tuple, dx, R, CW, h, w,
                       interpret):
    n_out = len(comp_idxs)
    kernel = functools.partial(
        _pre_kernel_body, src_cs=src_cs, dst_cs=dst_cs,
        comp_idxs=tuple(comp_idxs), dx=dx, SW=CW,
        identity=(src_cs == dst_cs or src_cs == ColorSpace.NONE
                  or dst_cs == ColorSpace.NONE))
    ospec = pl.BlockSpec((R, w // (4 * dx)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((h, w // (4 * dx)), jnp.uint32)

    def fn(px):
        out = pl.pallas_call(
            kernel,
            grid=(h // R,),
            in_specs=[pl.BlockSpec((R, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[ospec] * n_out,
            out_shape=[oshape] * n_out,
            interpret=interpret,
        )(px)
        return out

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
    groups = {}
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
        groups.setdefault((dx, dy), []).append(c)
    for (dx, dy), comps in groups.items():
        cw = _col_chunk(W, dx)
        if not cw or not _pre_row_chunk(H // dy, W, dx, cw, len(comps)):
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
    groups = {}
    for c in geo.components:
        dx = geo.max_h // c.samp_h
        dy = geo.max_v // c.samp_v
        groups.setdefault((dx, dy), []).append(c)
    out = [None] * len(geo.components)
    for (dx, dy), comps in groups.items():
        px_c = px[::dy] if dy > 1 else px
        h_c = H // dy
        CW = _col_chunk(W, dx)
        R = _pre_row_chunk(h_c, W, dx, CW, len(comps))
        fn = _cached_pre_kernel(src, dst, tuple(c.index for c in comps),
                                dx, R, CW, h_c, W, interpret)
        p32s = fn(px_c)
        for c, p32 in zip(comps, p32s):
            dw4 = c.data_width // 4
            p32 = jnp.pad(p32, ((0, c.data_height - h_c),
                                (0, dw4 - p32.shape[1])))
            out[c.index] = p32
    return out


# --------------------------------------------------------------------------
# Postprocessor: packed component planes -> interleaved RGB
# --------------------------------------------------------------------------
#
# The decode-side mirror: the XLA postprocessor's chroma upsample +
# channel stack + (H, W, 3) interleaved store are all minor-dim shuffles
# (~6 ms at 8K).  The kernel consumes the PACKED u32 planes the IDCT
# stage already produces, upsamples x on SUBLANES (element repeat),
# color-transforms elementwise, and emits RGBX pixel words; XLA then
# narrows (H, W, 4)[..., :3] — a cheap contiguous-minor slice.  Chroma
# row (y-direction) upsample stays in XLA as a major-dim row gather.
# Counterpart of src/gpujpeg_postprocessor.cu comp_to_raw kernels.

def _post_kernel_body(y_ref, cb_ref, cr_ref, out_ref, *, src_cs, dst_cs,
                      dxc: int, SW: int, identity: bool):
    W4 = y_ref.shape[1]                    # packed luma words per row
    for j in range(0, W4, SW // 4):
        yT = y_ref[:, j:j + SW // 4].T     # (SW/4, R) packed words
        w4 = jnp.repeat(yT, 4, axis=0)
        k = jax.lax.broadcasted_iota(jnp.int32, w4.shape, 0) & 3
        Y = ((w4 >> (k * 8).astype(jnp.uint32)) & jnp.uint32(0xFF)) \
            .astype(jnp.int32)             # (SW, R)
        jc = j // dxc
        cw = SW // (4 * dxc)
        cbT = cb_ref[:, jc:jc + cw].T
        crT = cr_ref[:, jc:jc + cw].T
        wc = jnp.repeat(cbT, 4, axis=0)
        wr = jnp.repeat(crT, 4, axis=0)
        kc = jax.lax.broadcasted_iota(jnp.int32, wc.shape, 0) & 3
        Cb = ((wc >> (kc * 8).astype(jnp.uint32)) & jnp.uint32(0xFF)) \
            .astype(jnp.int32)
        Cr = ((wr >> (kc * 8).astype(jnp.uint32)) & jnp.uint32(0xFF)) \
            .astype(jnp.int32)
        if dxc > 1:
            Cb = jnp.repeat(Cb, dxc, axis=0)
            Cr = jnp.repeat(Cr, dxc, axis=0)
        if identity:
            r, g, b = Y, Cb, Cr
        else:
            r, g, b = color.convert_channels(Y, Cb, Cr, src_cs, dst_cs)
        px = (r.astype(jnp.uint32) | (g.astype(jnp.uint32) << 8)
              | (b.astype(jnp.uint32) << 16) | jnp.uint32(0xFF000000))
        out_ref[:, j * 4:j * 4 + SW] = px.T


@functools.lru_cache(maxsize=64)
def _cached_post_kernel(src_cs, dst_cs, dxc, R, SW, h, w, interpret):
    kernel = functools.partial(
        _post_kernel_body, src_cs=src_cs, dst_cs=dst_cs, dxc=dxc, SW=SW,
        identity=(src_cs == dst_cs or src_cs == ColorSpace.NONE
                  or dst_cs == ColorSpace.NONE))

    def fn(y32, cb32, cr32):
        return pl.pallas_call(
            kernel,
            grid=(h // R,),
            in_specs=[
                pl.BlockSpec((R, w // 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, w // (4 * dxc)), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, w // (4 * dxc)), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint32),
            interpret=interpret,
        )(y32, cb32, cr32)

    return fn


def post_supported(geo, pi: ImageParameters) -> bool:
    """True when the Pallas packed postprocessor covers this config:
    3 components, luma full-res, same x/y chroma decimation in {1, 2, 4},
    interleaved RGB-like output."""
    if geo.comp_count != 3:
        return False
    if pi.pixel_format not in (PixelFormat.P444_U8_P012,
                               PixelFormat.P4444_U8_P0123):
        return False
    src = geo.param.color_space_internal
    dst = pi.color_space
    if not (src == dst or src == ColorSpace.NONE or dst == ColorSpace.NONE):
        for direction, cs in color.transform_steps(src, dst):
            if cs not in (color._TO_RGB if direction == "from"
                          else color._FROM_RGB):
                return False
    cy = geo.components[0]
    if geo.max_h != cy.samp_h or geo.max_v != cy.samp_v:
        return False
    dxs = {geo.max_h // c.samp_h for c in geo.components[1:]}
    dys = {geo.max_v // c.samp_v for c in geo.components[1:]}
    if len(dxs) != 1 or len(dys) != 1:
        return False
    dx, dy = dxs.pop(), dys.pop()
    if dx not in (1, 2, 4) or dy not in (1, 2, 4):
        return False
    W, H = pi.width, pi.height
    if W % (16 * dx):
        return False
    cw = _col_chunk(W, 1)
    if not cw or not _post_row_chunk(H, W, dx, cw):
        return False
    return True


def postprocess_packed(p32s, geo, pi: ImageParameters,
                       interpret: bool = False):
    """[(data_h, data_w/4) u32 packed plane per component] -> packed raw
    output for pi.pixel_format (P444 interleaved RGB via an RGBX narrow,
    or P4444 RGBA with alpha = 255), or None when unsupported."""
    if not post_supported(geo, pi):
        return None
    W, H = pi.width, pi.height
    cy, ccb, ccr = geo.components
    dx = geo.max_h // ccb.samp_h
    dy = geo.max_v // ccb.samp_v
    y32 = p32s[0][:H, : W // 4]
    rows = np.minimum(np.arange(H) // dy, ccb.height - 1)
    cw4 = -(-W // (4 * dx))
    cb32 = p32s[1][jnp.asarray(rows)][:, :cw4]
    cr32 = p32s[2][jnp.asarray(rows)][:, :cw4]
    SW = _col_chunk(W, 1)
    R = _post_row_chunk(H, W, dx, SW)
    fn = _cached_post_kernel(geo.param.color_space_internal,
                             pi.color_space, dx, R, SW, H, W, interpret)
    rgbx = fn(y32, cb32, cr32)
    out4 = jax.lax.bitcast_convert_type(rgbx, jnp.uint8)   # (H, W, 4)
    if pi.pixel_format == PixelFormat.P4444_U8_P0123:
        return out4
    return out4[..., :3]


# --------------------------------------------------------------------------
# Fused decode back-half: dequant + IDCT + upsample + color + RGBX,
# straight from phase-C coefficients
# --------------------------------------------------------------------------
#
# The XLA formulation of this stage (per-component IDCT matmul -> byte
# pack -> 5D block->plane transpose -> postprocess) spends ~11 of its
# ~13 ms at 8K in the pack + transpose: the output's innermost dim
# interleaves at stride 2, which XLA's transpose emitter handles a byte
# at a time.  In-kernel the whole chain is cheap because the fold can
# use primitives XLA has no access to:
#
#   * chroma upsample-x: transpose, SUBLANE element repeat, transpose
#     back (lane-dim repeats are unsupported; sublane repeats are free);
#   * chroma row/column phase selection: folded INTO the IDCT matrix —
#     one (nv*64, 64) matmul emits all nv = dx*dy (row-pair, column-
#     parity) sample orders at once, selected per lane afterwards;
#   * block -> raster fold: with IDCT output order q = c*8 + r, the
#     transposed pixel words (J, 64) scatter into a (8J, 8) scratch with
#     8 SUBLANE-STRIDED stores (PT[c::8] = xt[:, 8c:8c+8]) — the one
#     relayout class Mosaic supports that XLA lacks.
#
# Luma blocks-per-row must be padded to a 128 multiple (the caller pads
# the coefficient plane; pad blocks decode to gray and are sliced away).
# Counterpart of gpujpeg_idct_gpu + gpujpeg_postprocessor.cu in one pass.

def _dpost_kernel_body(yc_hbm, cb_hbm, cr_hbm, qy_ref, qcb_ref,
                       qcr_ref, my_ref, mc_ref, out_ref,
                       ysc, cbsc, crsc, pt_ref, sy, sb, sr, *,
                       dx: int, dy: int, NBW: int, NBC: int, RG: int,
                       src_cs, dst_cs, identity: bool,
                       highest: bool = True):
    # Mosaic lowers only DEFAULT/HIGHEST dot precisions; HIGHEST is the
    # f32-faithful 6-pass emulation (matches the XLA reference path)
    prec = (jax.lax.Precision.HIGHEST if highest
            else jax.lax.Precision.DEFAULT)
    nv = dx * dy
    i = pl.program_id(0)

    # coefficient tiles arrive via MANUAL DMA (an XLA pad to
    # BlockSpec-able aligned rows cost 5.7 ms/frame); Mosaic requires the
    # lane extent of an HBM slice to be a 128 multiple, so each grid step
    # covers RG chroma block-rows with RG * NBC % 128 == 0 (the caller
    # end-pads the planes so the last step stays in bounds)
    cy = pltpu.make_async_copy(
        yc_hbm.at[:, pl.ds(i * RG * dy * NBW, RG * dy * NBW)], ysc, sy)
    ccb = pltpu.make_async_copy(
        cb_hbm.at[:, pl.ds(i * RG * NBC, RG * NBC)], cbsc, sb)
    ccr = pltpu.make_async_copy(
        cr_hbm.at[:, pl.ds(i * RG * NBC, RG * NBC)], crsc, sr)
    cy.start(); ccb.start(); ccr.start()
    cy.wait(); ccb.wait(); ccr.wait()

    def idct(cv, q_ref, m_ref):
        y = cv.astype(jnp.float32) * q_ref[:, :]
        x = jnp.dot(m_ref[:, :], y, preferred_element_type=jnp.float32,
                    precision=prec)
        return jnp.clip(jnp.round(x + 128.0), 0, 255).astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (64, NBW), 1)
    par = lane & (dx - 1) if dx > 1 else None
    for rr in range(RG):
        Y = idct(ysc[:, rr * dy * NBW:(rr + 1) * dy * NBW],
                 qy_ref, my_ref)                   # (64, dy*NBW)
        Call = []
        for c_ref, q_ref in ((cbsc, qcb_ref), (crsc, qcr_ref)):
            C = idct(c_ref[:, rr * NBC:(rr + 1) * NBC],
                     q_ref, mc_ref)                # (nv*64, NBC)
            if dx > 1:
                C = jnp.repeat(C.T, dx, axis=0).T  # lane expand via T
            Call.append(C)                         # (nv*64, NBW)
        for rp in range(dy):
            Yr = Y[:, rp * NBW:(rp + 1) * NBW]
            cvs = []
            for C in Call:
                if dx > 1:
                    v0 = rp * dx
                    cv = C[64 * v0:64 * v0 + 64, :]
                    for p in range(1, dx):
                        vv = C[64 * (v0 + p):64 * (v0 + p) + 64, :]
                        cv = jnp.where(par == p, vv, cv)
                else:
                    cv = C[64 * rp:64 * rp + 64, :]
                cvs.append(cv)
            if identity:
                r, g, b = Yr, cvs[0], cvs[1]
            else:
                r, g, b = color.convert_channels(Yr, cvs[0], cvs[1],
                                                 src_cs, dst_cs)
            px = (r.astype(jnp.uint32) | (g.astype(jnp.uint32) << 8)
                  | (b.astype(jnp.uint32) << 16) | jnp.uint32(0xFF000000))
            # fold blocks -> raster: q = c*8 + r sample order lets the
            # transposed pixel words scatter into PT (8*NBW, 8) with eight
            # SUBLANE-STRIDED stores (the relayout class Mosaic supports
            # and XLA lacks); the final transpose runs in the u32 domain
            # (4x fewer elements than the old u8-domain transpose) and the
            # caller bitcasts the (rows, W) u32 image to bytes — a
            # layout no-op on the contiguous minor dim
            xt = px[:, :].T                            # (NBW, 64)
            for cc in range(8):
                pt_ref[cc::8, :] = xt[:, 8 * cc:8 * cc + 8]
            ro = 8 * (rr * dy + rp)
            out_ref[ro:ro + 8, :] = pt_ref[:, :].T     # (8, 8*NBW) u32


@functools.lru_cache(maxsize=32)
def _cached_dpost_kernel(dx, dy, NBW, RG, nbh_steps, src_cs, dst_cs,
                         interpret, highest=True):
    nv = dx * dy
    NBC = NBW // dx
    kernel = functools.partial(
        _dpost_kernel_body, dx=dx, dy=dy, NBW=NBW, NBC=NBC, RG=RG,
        src_cs=src_cs, dst_cs=dst_cs, highest=highest,
        identity=(src_cs == dst_cs or src_cs == ColorSpace.NONE
                  or dst_cs == ColorSpace.NONE))
    rows_per = 8 * dy * RG
    Wb = NBW * 8                       # output row RGBX words (u32)

    def fn(yc, cb, cr, qy, qcb, qcr, my, mc):
        const = lambda i: (0, 0)
        return pl.pallas_call(
            kernel,
            grid=(nbh_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((64, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 64), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((nv * 64, 64), const,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows_per, Wb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nbh_steps * rows_per, Wb),
                                           jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((64, RG * dy * NBW), jnp.int16),
                pltpu.VMEM((64, RG * NBC), jnp.int16),
                pltpu.VMEM((64, RG * NBC), jnp.int16),
                pltpu.VMEM((8 * NBW, 8), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(yc, cb, cr, qy, qcb, qcr, my, mc)

    return fn


def _dpost_matrices(dx: int, dy: int):
    """(my (64, 64), mc (dx*dy*64, 64)) f32: IDCT rows in q = c*8 + r
    output order; chroma variants fold the (row-pair, column-parity)
    sample selection of nearest upsampling into the matrix."""
    from ..utils import tables as _t

    NT = np.asarray(_t.idct2d_matrix_zz(), np.float64).T  # rows r*8+c
    my = np.zeros((64, 64), np.float64)
    for c in range(8):
        for r in range(8):
            my[c * 8 + r] = NT[r * 8 + c]
    nv = dx * dy
    mc = np.zeros((nv * 64, 64), np.float64)
    for rp in range(dy):
        for p in range(dx):
            v = rp * dx + p
            for c in range(8):
                for r in range(8):
                    rc = (8 * rp + r) // dy if dy > 1 else r
                    cc = ((8 * p + c) // dx) if dx > 1 else c
                    mc[v * 64 + c * 8 + r] = NT[rc * 8 + cc]
    return my.astype(np.float32), mc.astype(np.float32)


def decode_post_supported(geo, pi: ImageParameters) -> bool:
    """Fused decode back-half coverage: non-interleaved 3-component
    scans, uniform chroma decimation dx, dy in {1, 2}, RGB-like output,
    bps == segment_mcu_count for every component."""
    if geo.comp_count != 3 or geo.interleaved:
        return False
    if pi.pixel_format not in (PixelFormat.P444_U8_P012,
                               PixelFormat.P4444_U8_P0123):
        return False
    src = geo.param.color_space_internal
    dst = pi.color_space
    if not (src == dst or src == ColorSpace.NONE or dst == ColorSpace.NONE):
        for direction, cs in color.transform_steps(src, dst):
            if cs not in (color._TO_RGB if direction == "from"
                          else color._FROM_RGB):
                return False
    cy = geo.components[0]
    if geo.max_h != cy.samp_h or geo.max_v != cy.samp_v:
        return False
    dxs = {geo.max_h // c.samp_h for c in geo.components[1:]}
    dys = {geo.max_v // c.samp_v for c in geo.components[1:]}
    if len(dxs) != 1 or len(dys) != 1:
        return False
    dx, dy = dxs.pop(), dys.pop()
    if dx not in (1, 2) or dy not in (1, 2):
        return False
    for c in geo.components:
        if c.segment_mcu_count != geo.max_blocks_per_seg:
            return False
        if c.segment_count * c.segment_mcu_count != c.mcu_count:
            return False
    cyh, cch = cy.data_height // 8, geo.components[1].data_height // 8
    if cyh != dy * cch:
        return False
    if (geo.components[1].data_width // 8) * dx != cy.data_width // 8:
        return False
    return True


#: per-(dx, dy, NBW, nbh_c) RG ceilings learned from Mosaic VMEM compile
#: failures (the auto-scaling model below is empirical; an untested
#: geometry may overshoot the 16 MB scoped-VMEM limit) — see
#: dpost_note_vmem_failure.
_DPOST_RG_CAPS: dict = {}
_DPOST_GEN = 0


def dpost_generation() -> int:
    """Bump counter for jit caches that bake the dpost RG choice in."""
    return _DPOST_GEN


def is_vmem_failure(exc: BaseException) -> bool:
    s = str(exc).lower()
    return ("vmem" in s or "scoped" in s or "mosaic" in s
            or "resource_exhausted" in s or "resource exhausted" in s)


def dpost_note_vmem_failure(geo, pi) -> bool:
    """Record a Mosaic VMEM compile failure for this geometry's dpost
    kernel: halve its RG ceiling so the next attempt compiles smaller
    tiles.  Returns False when RG is already at the minimum (the caller
    should fall back to the XLA tail)."""
    global _DPOST_GEN
    if not decode_post_supported(geo, pi):
        return False
    cy, ccb = geo.components[0], geo.components[1]
    dx = geo.max_h // ccb.samp_h
    NBW = cy.data_width // 8
    NBC = NBW // dx
    nbh_c = ccb.data_height // 8
    rg_min = 128 // int(np.gcd(NBC, 128))
    key = (dx, geo.max_v // ccb.samp_v, NBW, nbh_c)
    cur = _DPOST_RG_CAPS.get(key)
    if cur is None:
        cur = _dpost_rg(dx, key[1], NBW, NBC, nbh_c, None)
    if cur <= rg_min:
        return False
    _DPOST_RG_CAPS[key] = max(rg_min, cur // 2)
    _DPOST_GEN += 1
    return True


def _dpost_rg(dx, dy, NBW, NBC, nbh_c, cap) -> int:
    """RG auto-scaling under the calibrated scoped-VMEM model, clamped
    by any learned failure ceiling."""
    import os

    RG = 128 // int(np.gcd(NBC, 128))
    rg_target = int(os.environ.get("GPUJPEG_TPU_DPOST_RG", "16"))
    if cap is not None:
        rg_target = min(rg_target, cap)
    while RG * 2 <= rg_target and RG * 2 <= nbh_c:
        RGn = RG * 2
        # scoped-VMEM model RE-calibrated round 5: the old 2200 B/col
        # constant was far too pessimistic — RG=16 AND RG=24 at
        # NBW=960 (model: 34/50 MB) compile and run fine (4.26/4.47 ms
        # vs 4.54 at the model's RG=8), so the per-row temporaries cost
        # <= ~600 B/col.  700 B/col keeps a margin; an overshoot on an
        # untested geometry degrades gracefully through
        # dpost_note_vmem_failure (halve-and-retry).  This matters most
        # at 16K (NBW=1920), where 2200 capped RG at 2.
        vmem = (RGn * dy * NBW * 700             # per-rr loop temporaries
                + 64 * RGn * dy * NBW * 2        # ysc i16
                + 2 * 64 * RGn * NBC * 2         # cb + cr i16
                + 2 * 8 * dy * RGn * NBW * 32    # out tile, double-buffered
                + 8 * NBW * 8 * 4)               # pt scratch
        # budget 21 MB under the recalibrated constant: RG=16 at 8K
        # (NBW=960) measured fastest (4.26 ms vs 4.54 at RG=8) and
        # compiles; a geometry that overshoots Mosaic's real scoped
        # limit falls back through dpost_note_vmem_failure
        if vmem > 21e6:
            break
        RG = RGn
    return RG


def decode_post_fused(coefs_t, qtabs, geo, pi: ImageParameters,
                      interpret: bool = False):
    """coefs_t (64, nseg*bps) int16 (DC already integrated) -> packed
    raw output for pi (P444 RGB via RGBX narrow / P4444 RGBA), or None
    when unsupported.

    The in-kernel IDCT uses Precision.HIGHEST (f32-faithful).  On TPU
    hardware the Mosaic matmul's accumulation order differs from XLA's,
    so outputs can differ from the XLA tail by +-2 codes on ~1e-5 of
    pixels (round-boundary cases); PIL-oracle error stats are
    indistinguishable between the two paths."""
    if not decode_post_supported(geo, pi):
        return None
    cy, ccb, ccr = geo.components
    dx = geo.max_h // ccb.samp_h
    dy = geo.max_v // ccb.samp_v
    nbh_c = ccb.data_height // 8
    bps = geo.max_blocks_per_seg

    def comp_plane(ci, c):
        S = c.segment_count
        base = sum(cc.segment_count for cc in geo.components[:ci])
        return coefs_t[:, base * bps:(base + S) * bps]

    NBW = cy.data_width // 8
    NBC = NBW // dx
    # Mosaic HBM DMA slices need 128-multiple lane extents: group RG
    # chroma block-rows per grid step and END-pad each plane's lanes (a
    # contiguous pad — the per-block-row strided pad cost 5.7 ms at 8K).
    # Scale RG up to ~8 rows while the VMEM tiles (in coefs + out pixels,
    # double-buffered) stay under ~10 MB: fewer grid steps amortize the
    # per-step DMA/loop overhead (measured 6.8 -> 5.9 ms at 8K).  A
    # learned per-config ceiling (set on Mosaic VMEM compile failure —
    # the model is empirical) degrades RG gracefully on untested
    # geometries instead of erroring; GPUJPEG_TPU_DPOST_RG overrides.
    import os

    RG = _dpost_rg(dx, dy, NBW, NBC, nbh_c,
                   _DPOST_RG_CAPS.get((dx, dy, NBW, nbh_c)))
    steps = -(-nbh_c // RG)

    def padded(plane, per_step):
        need = steps * per_step
        if plane.shape[1] < need:
            plane = jnp.pad(plane, ((0, 0), (0, need - plane.shape[1])))
        return plane

    yc = padded(comp_plane(0, cy), RG * dy * NBW)
    cb = padded(comp_plane(1, ccb), RG * NBC)
    cr = padded(comp_plane(2, ccr), RG * NBC)
    qy = qtabs[0].astype(jnp.float32).reshape(64, 1)
    qcb = qtabs[1].astype(jnp.float32).reshape(64, 1)
    qcr = qtabs[2].astype(jnp.float32).reshape(64, 1)
    my, mc = _dpost_matrices(dx, dy)
    fn = _cached_dpost_kernel(dx, dy, NBW, RG, steps,
                              geo.param.color_space_internal,
                              pi.color_space, interpret,
                              os.environ.get("GPUJPEG_TPU_DPOST_PREC",
                                             "highest") == "highest")
    rgbx = fn(yc, cb, cr, qy, qcb, qcr, jnp.asarray(my),
              jnp.asarray(mc))
    out4 = jax.lax.bitcast_convert_type(rgbx, jnp.uint8)  # (rows, W, 4)
    out4 = out4[:pi.height, :pi.width]
    if pi.pixel_format == PixelFormat.P4444_U8_P0123:
        return out4
    return out4[..., :3]

