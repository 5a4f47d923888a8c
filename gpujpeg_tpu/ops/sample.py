"""Pixel-format unpack/pack + chroma resampling (pre/postprocessor).

TPU-native equivalent of the reference pre/postprocessor kernels
(src/gpujpeg_preprocessor.cu, src/gpujpeg_postprocessor.cu): instead of a
thread-per-pixel CUDA kernel with templated load/store, we express the same
semantics as XLA slicing/reshape ops which fuse with the color transform:

  encode:  unpack raw -> full-res channels -> color transform -> decimate
           (subsample-store skips non-sampled positions,
            gpujpeg_preprocessor.cu:51-64: pure decimation, no filtering)
  decode:  per-comp planes -> nearest upsample -> color transform -> pack
           (comp_to_raw_load, gpujpeg_postprocessor.cu:51-113)

Padding of component planes to MCU multiples is zero-fill, matching the
reference's zeroed device buffers (gpujpeg_common.c:941-944).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from ..types import ImageParameters, PixelFormat
from ..utils.geometry import Geometry, div_round_up
from . import color


def _split_planar(raw, width: int, height: int, sampling) -> List[jnp.ndarray]:
    """Split a flat planar buffer into per-plane 2D arrays (libyuv sizing,
    see types.image_size_bytes)."""
    max_h = max(s[0] for s in sampling)
    max_v = max(s[1] for s in sampling)
    planes = []
    off = 0
    for (sh, sv) in sampling:
        cw = (width * sh + max_h - 1) // max_h
        ch = (height * sv + max_v - 1) // max_v
        planes.append(raw[off:off + cw * ch].reshape(ch, cw))
        off += cw * ch
    return planes


def _upsample_to(plane, width: int, height: int):
    """Nearest-neighbor upsample a plane to (height, width) via index gather
    (matches x/2-style loads in the reference)."""
    ph, pw = plane.shape
    fy = div_round_up(height, ph)
    fx = div_round_up(width, pw)
    if fy == 1 and fx == 1:
        return plane[:height, :width]
    out = jnp.repeat(jnp.repeat(plane, fy, axis=0), fx, axis=1)
    return out[:height, :width]


def unpack_to_channels(raw, pi: ImageParameters) -> jnp.ndarray:
    """Raw image buffer -> (H, W, C) int32 full-resolution channels.

    `raw` is a flat uint8 device array of image_size_bytes length (or an
    already-shaped (H, W, C) array for interleaved formats).
    """
    W, H = pi.width, pi.height
    pf = pi.pixel_format
    if raw.ndim == 3:
        return raw.astype(jnp.int32)
    if raw.ndim == 2:
        return raw.astype(jnp.int32)[..., None]
    raw = raw.reshape(-1)
    wp = pi.width_padding
    if wp:
        # input rows are padded to width*unit + width_padding BYTES
        # (gpujpeg_common.h:283-294, preprocessor.cu:189); strip the
        # padding with a reshape+slice (fuses with the unpack)
        from ..types import pixel_format_unit_size

        unit = pixel_format_unit_size(pf)
        if unit == 0:
            raise ValueError(
                "width_padding is only supported for packed pixel formats")
        raw = raw.reshape(H, W * unit + wp)[:, :W * unit].reshape(-1)
    if pf == PixelFormat.U8:
        return raw.reshape(H, W, 1).astype(jnp.int32)
    if pf == PixelFormat.P444_U8_P012:
        return raw.reshape(H, W, 3).astype(jnp.int32)
    if pf == PixelFormat.P4444_U8_P0123:
        return raw.reshape(H, W, 4).astype(jnp.int32)
    if pf == PixelFormat.P422_U8_P1020:
        # UYVY: u y0 v y1 (gpujpeg_preprocessor.cu raw_to_comp_load<422_U8_P1020>)
        b = raw.reshape(H, W // 2, 4).astype(jnp.int32)
        y = b[:, :, 1::2].reshape(H, W)
        u = jnp.repeat(b[:, :, 0], 2, axis=1)
        v = jnp.repeat(b[:, :, 2], 2, axis=1)
        return jnp.stack([y, u, v], axis=-1)
    if pf in (PixelFormat.P444_U8_P0P1P2, PixelFormat.P422_U8_P0P1P2,
              PixelFormat.P420_U8_P0P1P2):
        from ..types import pixel_format_sampling
        planes = _split_planar(raw, W, H, pixel_format_sampling(pf))
        chans = [_upsample_to(p, W, H).astype(jnp.int32) for p in planes]
        return jnp.stack(chans, axis=-1)
    raise ValueError(f"unsupported pixel format {pf}")


def preprocess(raw, geo: Geometry, pi: ImageParameters) -> List[jnp.ndarray]:
    """Encode-side preprocessor: raw image -> per-component padded planes.

    Returns one (data_height, data_width) uint8 plane per component,
    color-transformed to param.color_space_internal, decimated per the
    component sampling factors, zero-padded to MCU multiples.
    """
    chans = unpack_to_channels(raw, pi)
    ncomp = geo.comp_count
    if chans.shape[-1] < ncomp:
        # grayscale encoded as more comps: chroma = 128 (preprocessor.cu:95-98)
        fill = jnp.full(chans.shape[:-1] + (ncomp - chans.shape[-1],), 128,
                        dtype=jnp.int32)
        chans = jnp.concatenate([chans, fill], axis=-1)

    # One independent fusion per component, each DECIMATING FIRST:
    # subsampling is pure selection (no filtering, preprocessor.cu:51-64),
    # so it commutes exactly with the per-pixel color transform — chroma
    # converts 1/4 of the pixels instead of materializing a full-res
    # YCbCr image and then decimating (the old barrier formulation cost
    # ~4.1 ms at 8K; this one reads the raw frame once per component and
    # writes the decimated u8 plane, ~3x less HBM traffic).  XLA DCEs the
    # unused output channels of convert() inside each fusion.
    planes = []
    for c in geo.components:
        sh = geo.max_h // c.samp_h
        sv = geo.max_v // c.samp_v
        sub = chans[::sv, ::sh]
        if ncomp >= 3 and c.index < 3:
            val = color.convert(sub[..., :3], pi.color_space,
                                geo.param.color_space_internal)[..., c.index]
        else:
            val = sub[..., c.index]
        # pad real dims up to component dims then data dims (zero-fill);
        # planes are uint8 (values already clipped to [0, 255]) so the
        # downstream block transpose moves 1 B/sample, not 4
        p = jnp.pad(val.astype(jnp.uint8),
                    ((0, c.data_height - val.shape[0]),
                     (0, c.data_width - val.shape[1])))
        planes.append(p)
    return planes


def pack_channels(chans: jnp.ndarray, pi: ImageParameters) -> jnp.ndarray:
    """(H, W, C) int channels -> raw buffer shaped for pi.pixel_format
    (interleaved: (H, W[, C]) uint8; planar/packed: flat (N,))."""
    W, H = pi.width, pi.height
    pf = pi.pixel_format
    if pf == PixelFormat.U8:
        return chans[..., 0].astype(jnp.uint8)
    if pf == PixelFormat.P444_U8_P012:
        return chans[..., :3].astype(jnp.uint8)
    if pf == PixelFormat.P4444_U8_P0123:
        if chans.shape[-1] < 4:
            alpha = jnp.full(chans.shape[:-1] + (1,), 255, jnp.int32)
            chans = jnp.concatenate([chans, alpha], axis=-1)
        return chans.astype(jnp.uint8)
    if pf == PixelFormat.P422_U8_P1020:
        y = chans[..., 0]
        u = chans[:, ::2, 1]
        v = chans[:, ::2, 2]
        out = jnp.stack([u, y[:, ::2], v, y[:, 1::2]], axis=-1)
        return out.reshape(H, W * 2).astype(jnp.uint8).reshape(-1)
    if pf in (PixelFormat.P444_U8_P0P1P2, PixelFormat.P422_U8_P0P1P2,
              PixelFormat.P420_U8_P0P1P2):
        from ..types import pixel_format_sampling
        sampling = pixel_format_sampling(pf)
        max_h = max(s[0] for s in sampling)
        max_v = max(s[1] for s in sampling)
        parts = []
        for i, (sh, sv) in enumerate(sampling):
            cw = (W * sh + max_h - 1) // max_h
            ch = (H * sv + max_v - 1) // max_v
            dh, dw = max_v // sv, max_h // sh
            p = chans[::dh, ::dw, i][:ch, :cw]
            p = jnp.pad(p, ((0, ch - p.shape[0]), (0, cw - p.shape[1])))
            parts.append(p.reshape(-1))
        return jnp.concatenate(parts).astype(jnp.uint8)
    raise ValueError(f"unsupported pixel format {pf}")


def postprocess(planes: Sequence[jnp.ndarray], geo: Geometry,
                pi: ImageParameters) -> jnp.ndarray:
    """Decode-side postprocessor: per-component planes -> packed raw image.

    `planes` are (data_height, data_width) int32 in color_space_internal.
    Returns a uint8 array shaped for the output pixel format:
      - interleaved formats: (H, W, C) (or (H, W) for U8)
      - planar formats: flat (N,) buffer in plane order
    """
    W, H = pi.width, pi.height
    pf = pi.pixel_format
    ncomp = geo.comp_count

    # upsample every component to full resolution (nearest)
    full = []
    for c in geo.components:
        sh = geo.max_h // c.samp_h
        sv = geo.max_v // c.samp_v
        p = planes[c.index][:c.height, :c.width]
        p = _upsample_to(p, W, H) if (sh > 1 or sv > 1) else p[:H, :W]
        full.append(p)
    if ncomp == 1:
        # gray -> RGB fill if target needs 3 channels (postprocessor.cu:128-168)
        if pf not in (PixelFormat.U8,):
            full = [full[0], jnp.full_like(full[0], 128),
                    jnp.full_like(full[0], 128)]
    chans = jnp.stack(full, axis=-1).astype(jnp.int32)

    if chans.shape[-1] >= 3:
        rgb = color.convert(chans[..., :3], geo.param.color_space_internal,
                            pi.color_space)
        chans = (jnp.concatenate([rgb, chans[..., 3:]], axis=-1)
                 if chans.shape[-1] > 3 else rgb)

    return pack_channels(chans, pi)
