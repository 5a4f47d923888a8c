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
