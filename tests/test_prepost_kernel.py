"""Pallas packed preprocessor vs the XLA preprocessor oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpujpeg_tpu.ops import prepost_kernel, sample
from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat
from gpujpeg_tpu.models.encoder import adjust_params
from gpujpeg_tpu import Parameters
from gpujpeg_tpu.types import SamplingFactor
from gpujpeg_tpu.utils import geometry

_SUBS = {
    "4:4:4": (SamplingFactor(1, 1),) * 4,
    "4:2:0": (SamplingFactor(2, 2), SamplingFactor(1, 1),
              SamplingFactor(1, 1), SamplingFactor(1, 1)),
    "4:2:2": (SamplingFactor(2, 1), SamplingFactor(1, 1),
              SamplingFactor(1, 1), SamplingFactor(1, 1)),
}


def _geo(w, h, subsampling, quality=75, cs=ColorSpace.RGB):
    pi = ImageParameters(width=w, height=h, color_space=cs,
                         pixel_format=PixelFormat.P444_U8_P012)
    p = Parameters(quality=quality, restart_interval=4,
                   sampling_factor=_SUBS[subsampling], interleaved=False)
    p = adjust_params(p, pi)
    return geometry.get_geometry(p, pi), pi


def _unpack(p32):
    return np.stack([(np.asarray(p32) >> (8 * k)) & 0xFF
                     for k in range(4)], axis=-1) \
        .reshape(p32.shape[0], -1).astype(np.uint8)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_pre_kernel_matches_xla(rng, sub):
    h, w = 64, 128
    geo, pi = _geo(w, h, sub)
    assert prepost_kernel.pre_supported(geo, pi)
    raw = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    packed = prepost_kernel.preprocess_packed(
        jnp.asarray(raw), geo, pi, interpret=True)
    assert packed is not None
    planes = jax.jit(
        lambda r: tuple(sample.preprocess(r, geo, pi)))(jnp.asarray(raw))
    for c in geo.components:
        got = _unpack(packed[c.index])
        ref = np.asarray(planes[c.index])
        assert got.shape == ref.shape, (got.shape, ref.shape)
        assert np.array_equal(got, ref), \
            f"{sub} comp {c.index}: {np.argwhere(got != ref)[:4]}"


def test_pre_kernel_odd_pad(rng):
    # real dims not MCU-aligned: zero-pad region must match
    h, w = 48, 192
    geo, pi = _geo(w, h - 8, "4:2:0")
    if not prepost_kernel.pre_supported(geo, pi):
        pytest.skip("geometry unsupported by packed preprocessor")
    raw = rng.integers(0, 256, (h - 8, w, 3), dtype=np.uint8)
    packed = prepost_kernel.preprocess_packed(
        jnp.asarray(raw), geo, pi, interpret=True)
    planes = jax.jit(
        lambda r: tuple(sample.preprocess(r, geo, pi)))(jnp.asarray(raw))
    for c in geo.components:
        assert np.array_equal(_unpack(packed[c.index]),
                              np.asarray(planes[c.index]))


def test_pre_kernel_bt709(rng):
    h, w = 32, 128
    pi = ImageParameters(width=w, height=h, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    p = Parameters(quality=75, restart_interval=4,
                   sampling_factor=_SUBS["4:2:0"], interleaved=False,
                   color_space_internal=ColorSpace.YCBCR_BT709)
    p = adjust_params(p, pi)
    geo = geometry.get_geometry(p, pi)
    if not prepost_kernel.pre_supported(geo, pi):
        pytest.skip("unsupported")
    raw = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    packed = prepost_kernel.preprocess_packed(
        jnp.asarray(raw), geo, pi, interpret=True)
    planes = jax.jit(
        lambda r: tuple(sample.preprocess(r, geo, pi)))(jnp.asarray(raw))
    for c in geo.components:
        assert np.array_equal(_unpack(packed[c.index]),
                              np.asarray(planes[c.index]))


def _pack(plane):
    # (h, w) u8 -> (h, w/4) u32 packed words
    p = np.asarray(plane, np.uint8)
    return jnp.asarray(p.reshape(p.shape[0], -1, 4).view("<u4")[..., 0])


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_post_kernel_matches_xla(rng, sub):
    from gpujpeg_tpu.ops import color
    h, w = 64, 128
    geo, _pi_in = _geo(w, h, sub)
    out_pi = ImageParameters(width=w, height=h, color_space=ColorSpace.RGB,
                             pixel_format=PixelFormat.P444_U8_P012)
    assert prepost_kernel.post_supported(geo, out_pi)
    planes, p32s = [], []
    for c in geo.components:
        p = rng.integers(0, 256, (c.data_height, c.data_width),
                         dtype=np.uint8)
        planes.append(jnp.asarray(p))
        p32s.append(_pack(p))
    got = prepost_kernel.postprocess_packed(p32s, geo, out_pi,
                                            interpret=True)
    assert got is not None
    ref = jax.jit(lambda ps: sample.postprocess(ps, geo, out_pi))(
        tuple(planes))
    assert np.array_equal(np.asarray(got), np.asarray(ref)), \
        f"{sub}: {np.argwhere(np.asarray(got) != np.asarray(ref))[:4]}"


def test_post_kernel_odd_height(rng):
    h, w = 56, 128
    geo, _ = _geo(w, h - 7, "4:2:0")   # height 49: odd, chroma rows 25
    out_pi = ImageParameters(width=w, height=h - 7,
                             color_space=ColorSpace.RGB,
                             pixel_format=PixelFormat.P444_U8_P012)
    if not prepost_kernel.post_supported(geo, out_pi):
        pytest.skip("unsupported geometry")
    planes, p32s = [], []
    for c in geo.components:
        p = rng.integers(0, 256, (c.data_height, c.data_width),
                         dtype=np.uint8)
        planes.append(jnp.asarray(p))
        p32s.append(_pack(p))
    got = prepost_kernel.postprocess_packed(p32s, geo, out_pi,
                                            interpret=True)
    ref = jax.jit(lambda ps: sample.postprocess(ps, geo, out_pi))(
        tuple(planes))
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_decode_post_fused_matches_xla(rng, sub):
    from gpujpeg_tpu.ops import dct
    from gpujpeg_tpu.utils import tables

    h, w = 64, 128
    geo, _ = _geo(w, h, sub)
    out_pi = ImageParameters(width=w, height=h, color_space=ColorSpace.RGB,
                             pixel_format=PixelFormat.P444_U8_P012)
    assert prepost_kernel.decode_post_supported(geo, out_pi)
    bps = geo.max_blocks_per_seg
    L = sum(c.segment_count for c in geo.components) * bps
    coefs_t = jnp.asarray(
        rng.integers(-48, 48, (64, L)).astype(np.int16))
    qtabs = jnp.asarray(np.stack(
        [np.asarray(tables.quant_table_zz(i == 0, 75), np.float32)
         for i in range(3)]))

    got = prepost_kernel.decode_post_fused(coefs_t, qtabs, geo, out_pi,
                                           interpret=True)
    assert got is not None

    def oracle(coefs_t, qtabs):
        planes = []
        base = 0
        for c in geo.components:
            S = c.segment_count
            ct = coefs_t[:, base * bps:(base + S) * bps]
            ct = ct[:, : c.mcu_count * bps] if False else ct
            ct = ct.reshape(64, S * bps)[:, :c.mcu_count]
            plane = dct.dequantize_idct_traced(
                ct.T, qtabs[c.index], c.data_height, c.data_width)
            planes.append(plane)
            base += S
        return sample.postprocess(planes, geo, out_pi)

    ref = jax.jit(oracle)(coefs_t, qtabs)
    g, r = np.asarray(got).astype(np.int32), np.asarray(ref).astype(np.int32)
    assert g.shape == r.shape
    if not np.array_equal(g, r):
        diff = np.abs(g - r)
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01, \
            (diff.max(), (diff > 0).mean())
