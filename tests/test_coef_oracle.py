"""Coefficient-exact decode oracle: the entropy decoder's quantized DCT
coefficients must match LIBJPEG's bit-for-bit on foreign (PIL/libjpeg-
encoded) streams and on our own encoder's streams.

This is the checkable proxy for BASELINE's "bit-exact with GPUJPEG's
decoder on its own streams" north star: GPUJPEG and libjpeg both decode
T.81 F.2.2 entropy data to identical coefficients
(gpujpeg_huffman_gpu_decoder.cu:286-316 vs jdhuff.c), so matching
libjpeg at the coefficient level == matching GPUJPEG.  PSNR-based gates
(tests/test_decode.py) tolerate mid-band defects; these do not.

The oracle is a tiny on-demand-built C library around
jpeg_read_coefficients (gpujpeg_tpu/native/jpeg_oracle.c); tests skip
when libjpeg dev files are absent.
"""

import io

import numpy as np
import pytest

from gpujpeg_tpu import Decoder, Encoder, Parameters
from gpujpeg_tpu import native
from gpujpeg_tpu.utils.tables import NATURAL_TO_ZIGZAG

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

pytestmark = pytest.mark.skipif(
    native.jpeg_oracle() is None,
    reason="libjpeg oracle unavailable (no libjpeg dev files)")


def _assert_coefs_match_libjpeg(data: bytes):
    """Crop our (block-padded, zig-zag) component grids to libjpeg's
    true ceil(size/8) dims, permute to natural order, compare exactly."""
    ours = Decoder().decode_coefficients(data)
    oracle, _qts = native.libjpeg_coefficients(data)
    assert len(ours) == len(oracle)
    for c, (mine, ref) in enumerate(zip(ours, oracle)):
        bh, bw, _ = ref.shape
        got = mine[:bh, :bw][:, :, NATURAL_TO_ZIGZAG]
        assert got.shape == ref.shape, c
        if not np.array_equal(got, ref):
            bad = np.argwhere((got != ref).any(axis=2))
            raise AssertionError(
                f"component {c}: {len(bad)} blocks differ, first at "
                f"{bad[0]}: got {got[tuple(bad[0])]} want "
                f"{ref[tuple(bad[0])]}")


def _pil_jpeg(img: np.ndarray, **save_kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", **save_kw)
    return buf.getvalue()


def _smooth(rng, h, w, c=3):
    small = rng.integers(0, 256, size=(h // 8, w // 8, c)).astype(np.uint8)
    img = np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR))
    return img


# -- foreign streams (libjpeg-encoded, various tables/subsampling) --------

def test_foreign_420_annexk_interleaved(rng):
    """PIL Q75 4:2:0, default Annex-K tables, interleaved single scan."""
    img = _smooth(rng, 64, 80)
    _assert_coefs_match_libjpeg(_pil_jpeg(img, quality=75,
                                          subsampling=2))


def test_foreign_444_optimized_tables(rng):
    """PIL Q90 4:4:4 with optimize=True: per-image Huffman tables (the
    generic/foreign-table decode machinery, not the Annex-K bake)."""
    img = _smooth(rng, 56, 72)
    _assert_coefs_match_libjpeg(_pil_jpeg(img, quality=90, subsampling=0,
                                          optimize=True))


def test_foreign_422_q95(rng):
    """PIL Q95 4:2:2 — horizontal-only subsampling, dense content."""
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    _assert_coefs_match_libjpeg(_pil_jpeg(img, quality=95,
                                          subsampling=1))


def test_foreign_grayscale(rng):
    """PIL Q85 grayscale — single component, odd dims."""
    img = _smooth(rng, 56, 72)[:, :, 0][:53, :67]
    _assert_coefs_match_libjpeg(_pil_jpeg(np.ascontiguousarray(img),
                                          quality=85))


def test_foreign_restart_markers(rng):
    """PIL with restart markers: segmented foreign stream (the same
    restart-parallel structure our encoder emits)."""
    img = _smooth(rng, 64, 64)
    try:
        data = _pil_jpeg(img, quality=80, subsampling=0,
                         restart_marker_blocks=4)
    except TypeError:
        pytest.skip("PIL too old for restart_marker_blocks")
    _assert_coefs_match_libjpeg(data)


# -- own streams: encoder bitstream gated at the coefficient level --------

@pytest.mark.parametrize("quality,interleaved,rst", [
    (75, False, 4),
    (90, True, 2),
    (100, False, 1),
])
def test_own_stream_coefs_match_libjpeg(rng, quality, interleaved, rst):
    """libjpeg must decode OUR streams to exactly the coefficients our
    decoder sees — gating encoder bitstream and decoder together."""
    img = rng.integers(0, 256, (56, 72, 3), np.uint8)
    data = bytes(Encoder().encode(
        img, Parameters(quality=quality, restart_interval=rst,
                        interleaved=interleaved)))
    _assert_coefs_match_libjpeg(data)


def test_oracle_matches_kernel_and_xla(rng, monkeypatch):
    """decode_coefficients honors GPUJPEG_TPU_DECKERNEL: both the Pallas
    kernels (interpret mode) and the XLA fallback match the oracle."""
    img = _smooth(rng, 48, 48)
    data = _pil_jpeg(img, quality=75, subsampling=0)
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "0")
    _assert_coefs_match_libjpeg(data)
    monkeypatch.setenv("GPUJPEG_TPU_DECKERNEL", "interpret")
    _assert_coefs_match_libjpeg(data)
