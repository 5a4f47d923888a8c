"""Color-accuracy tier: pixel-format x colorspace round trips at Q100.

Port of the reference's colors/ suite (colors/test_common.sh:17-55): each
combination is encoded at Q100, decoded, and compared at PSNR >= 40 dB.
The oracle for YCbCr->RGB correctness is an INDEPENDENT float
implementation of the BT.601/BT.709 equations written here (not
ops/color.py's fixed-point matrices), so a wrong matrix / wrong range /
swapped channel fails loudly while fixed-point rounding passes.
"""

import numpy as np
import pytest

from gpujpeg_tpu import Decoder, Encoder, Parameters
from gpujpeg_tpu.types import (ColorSpace, ImageParameters, PixelFormat,
                               PixelFormatRequest, SamplingFactor)

W, H = 192, 112   # small enough for the CPU backend, MCU-aligned


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


# ---- independent float color conversions (ITU-R BT.601 / BT.709) ---------

def yuv_to_rgb_float(y, u, v, cs):
    y = y.astype(np.float64)
    u = u.astype(np.float64) - 128.0
    v = v.astype(np.float64) - 128.0
    if cs == ColorSpace.YCBCR_BT709:          # limited range
        y = (y - 16.0) * (255.0 / 219.0)
        u = u * (255.0 / 224.0)
        v = v * (255.0 / 224.0)
        kr, kb = 0.2126, 0.0722
    elif cs == ColorSpace.YCBCR_BT601:        # limited range
        y = (y - 16.0) * (255.0 / 219.0)
        u = u * (255.0 / 224.0)
        v = v * (255.0 / 224.0)
        kr, kb = 0.299, 0.114
    else:                                     # BT.601 full range (JPEG)
        kr, kb = 0.299, 0.114
    kg = 1.0 - kr - kb
    r = y + 2 * (1 - kr) * v
    b = y + 2 * (1 - kb) * u
    g = y - (2 * kb * (1 - kb) * u + 2 * kr * (1 - kr) * v) / kg
    return np.clip(np.stack([r, g, b], -1), 0, 255)


def rgb_to_yuv_float(rgb, cs):
    r, g, b = (rgb.astype(np.float64)[..., i] for i in range(3))
    if cs == ColorSpace.YCBCR_BT709:
        kr, kb = 0.2126, 0.0722
    else:
        kr, kb = 0.299, 0.114
    kg = 1.0 - kr - kb
    y = kr * r + kg * g + kb * b
    u = (b - y) / (2 * (1 - kb))
    v = (r - y) / (2 * (1 - kr))
    if cs in (ColorSpace.YCBCR_BT709, ColorSpace.YCBCR_BT601):
        y = y * (219.0 / 255.0) + 16.0
        u = u * (224.0 / 255.0)
        v = v * (224.0 / 255.0)
    return (np.clip(y, 0, 255), np.clip(u + 128.0, 0, 255),
            np.clip(v + 128.0, 0, 255))


def smooth_rgb(rng):
    """Smooth content so subsampling loss stays far above 40 dB."""
    g = rng.normal(size=(H // 16 + 2, W // 16 + 2, 3))
    up = np.kron(g, np.ones((16, 16, 1)))[:H, :W]
    up = (up - up.min()) / (np.ptp(up) + 1e-9)
    # keep away from clip boundaries (limited-range excursions)
    return (32 + up * 191).astype(np.uint8)


def pack_uyvy(y, u, v):
    """(H, W) planes -> UYVY bytes with 2x1-subsampled chroma."""
    u2 = ((u[:, 0::2].astype(np.int32) + u[:, 1::2].astype(np.int32) + 1)
          // 2).astype(np.uint8)
    v2 = ((v[:, 0::2].astype(np.int32) + v[:, 1::2].astype(np.int32) + 1)
          // 2).astype(np.uint8)
    out = np.zeros((H, W // 2, 4), np.uint8)
    out[:, :, 0] = u2
    out[:, :, 1] = y[:, 0::2]
    out[:, :, 2] = v2
    out[:, :, 3] = y[:, 1::2]
    return out.reshape(-1)


def pack_planar(y, u, v, sh, sv):
    def dec(p, fh, fv):
        if fh == 1 and fv == 1:
            return p
        ph = -(-H // fv)
        pw = -(-W // fh)
        acc = np.zeros((ph, pw), np.float64)
        cnt = np.zeros((ph, pw), np.float64)
        for dy in range(fv):
            for dx in range(fh):
                part = p[dy::fv, dx::fh]
                acc[: part.shape[0], : part.shape[1]] += part
                cnt[: part.shape[0], : part.shape[1]] += 1
        return np.round(acc / cnt).astype(np.uint8)

    planes = [y, dec(u, sh, sv), dec(v, sh, sv)]
    return np.concatenate([p.reshape(-1) for p in planes])


@pytest.mark.parametrize("cs", [ColorSpace.YCBCR_BT709,
                                ColorSpace.YCBCR_BT601,
                                ColorSpace.YCBCR_BT601_256LVLS])
def test_uyvy_roundtrip_to_rgb(rng, cs):
    """UYVY input (limited/full range) -> Q100 encode -> decode to RGB;
    oracle = independent float conversion of the same UYVY content
    (colors/test_common.sh case 422i)."""
    rgb_src = smooth_rgb(rng)
    y, u, v = rgb_to_yuv_float(rgb_src, cs)
    y, u, v = (np.round(a).astype(np.uint8) for a in (y, u, v))
    raw = pack_uyvy(y, u, v)

    pi = ImageParameters(width=W, height=H, color_space=cs,
                         pixel_format=PixelFormat.P422_U8_P1020)
    out = Encoder().encode(raw, Parameters(quality=100, restart_interval=8),
                           pi)
    dec = Decoder().decode(out)   # default: interleaved RGB

    # oracle RGB from the (chroma-decimated) UYVY content
    u_full = np.repeat(((u[:, 0::2].astype(int) + u[:, 1::2].astype(int)
                         + 1) // 2), 2, axis=1)
    v_full = np.repeat(((v[:, 0::2].astype(int) + v[:, 1::2].astype(int)
                         + 1) // 2), 2, axis=1)
    ref = yuv_to_rgb_float(y, u_full, v_full, cs)
    p = psnr(dec, ref)
    assert dec.shape == (H, W, 3)
    assert p >= 40, f"{cs}: PSNR {p:.2f} < 40"


@pytest.mark.parametrize("pf,sh,sv", [
    (PixelFormat.P420_U8_P0P1P2, 2, 2),
    (PixelFormat.P422_U8_P0P1P2, 2, 1),
    (PixelFormat.P444_U8_P0P1P2, 1, 1),
])
def test_planar_identity_roundtrip(rng, pf, sh, sv):
    """Planar YCbCr input -> Q100 -> decode back to the SAME planar
    format; PSNR >= 40 vs the original planes (colors/ 420p/422p/444p)."""
    cs = ColorSpace.YCBCR_BT601_256LVLS
    rgb_src = smooth_rgb(rng)
    y, u, v = rgb_to_yuv_float(rgb_src, cs)
    y, u, v = (np.round(a).astype(np.uint8) for a in (y, u, v))
    raw = pack_planar(y, u, v, sh, sv)

    pi = ImageParameters(width=W, height=H, color_space=cs, pixel_format=pf)
    out = Encoder().encode(raw, Parameters(quality=100, restart_interval=8),
                           pi)
    dec = Decoder().decode(out, pi)          # same planar format back
    dec = np.asarray(dec).reshape(-1)
    p = psnr(dec, raw)
    assert p >= 40, f"{pf}: PSNR {p:.2f} < 40"


def test_bt709_limited_to_bt601_full_internal(rng):
    """BT.709-limited input transcodes through the BT.601-full internal
    space and back out to RGB (the reference's default path for UYVY
    camera feeds)."""
    cs = ColorSpace.YCBCR_BT709
    rgb_src = smooth_rgb(rng)
    y, u, v = rgb_to_yuv_float(rgb_src, cs)
    y, u, v = (np.round(a).astype(np.uint8) for a in (y, u, v))
    raw = pack_planar(y, u, v, 1, 1)
    pi = ImageParameters(width=W, height=H, color_space=cs,
                         pixel_format=PixelFormat.P444_U8_P0P1P2)
    out = Encoder().encode(raw, Parameters(quality=100, restart_interval=8),
                           pi)
    dec = Decoder().decode(out)
    ref = yuv_to_rgb_float(y, u, v, cs)
    p = psnr(dec, ref)
    assert p >= 40, f"PSNR {p:.2f} < 40"


def test_rgb_internal_native(rng):
    """-N native RGB: encode with color_space_internal=RGB (no transform),
    decode back to RGB; Q100 must round-trip >= 45 dB."""
    rgb_src = smooth_rgb(rng)
    pi = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    param = Parameters(quality=100, restart_interval=8,
                       color_space_internal=ColorSpace.RGB)
    out = Encoder().encode(rgb_src, param, pi)
    dec = Decoder().decode(out)
    p = psnr(dec, rgb_src)
    assert p >= 45, f"PSNR {p:.2f}"


def test_alpha_4comp_roundtrip(rng):
    """4-component (RGBA) encode at Q90 (reference regression floor
    36.3 dB for random RGBA; smooth content must clear 40)."""
    rgb_src = smooth_rgb(rng)
    alpha = np.full((H, W, 1), 200, np.uint8)
    rgba = np.concatenate([rgb_src, alpha], axis=-1)
    pi = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P4444_U8_P0123)
    param = Parameters(quality=90, restart_interval=8, comp_count=4,
                       color_space_internal=ColorSpace.RGB,
                       sampling_factor=(SamplingFactor(1, 1),) * 4)
    out = Encoder().encode(rgba, param, pi)
    dec = Decoder().decode(out)
    assert dec.shape == (H, W, 4)
    p = psnr(dec, rgba)
    assert p >= 40, f"PSNR {p:.2f}"


def test_decoder_native_pseudo_format(rng):
    """PixelFormatRequest.NATIVE resolves to the stream's subsampling."""
    cs = ColorSpace.YCBCR_BT601_256LVLS
    rgb_src = smooth_rgb(rng)
    pi = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    param = Parameters(quality=95, restart_interval=8).chroma_subsampled(
        ((2, 2), (1, 1), (1, 1)))
    out = Encoder().encode(rgb_src, param, pi)

    dec = Decoder()
    dec.set_output_format(cs, PixelFormatRequest.NATIVE)
    arr = dec.decode(out)
    assert dec.last_output.pixel_format == PixelFormat.P420_U8_P0P1P2
    # planar 4:2:0 buffer size
    from gpujpeg_tpu.types import image_size_bytes

    assert np.asarray(arr).size == image_size_bytes(
        W, H, PixelFormat.P420_U8_P0P1P2)
