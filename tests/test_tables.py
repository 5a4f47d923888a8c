"""Unit tests for table math (golden values from ITU-T T.81 / reference
gpujpeg_table.c constants)."""

import numpy as np
import pytest

from gpujpeg_tpu.utils import tables


def test_zigzag_roundtrip():
    z2n = tables.ZIGZAG_TO_NATURAL
    n2z = tables.NATURAL_TO_ZIGZAG
    assert sorted(z2n.tolist()) == list(range(64))
    assert np.array_equal(z2n[n2z], np.arange(64))
    # first diagonal walk
    assert z2n[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_quality_scaling_q50_is_identity():
    assert np.array_equal(tables.quant_table_zz(True, 50),
                          tables.DEFAULT_QUANT_LUMA_ZZ)


def test_quality_scaling_golden():
    # IJG formula checks (gpujpeg_table.c:83-99)
    q10 = tables.quant_table_zz(True, 10)
    assert q10[0] == (500 * 16 + 50) // 100  # s = 5000/10 = 500
    q90 = tables.quant_table_zz(True, 90)
    assert q90[0] == (20 * 16 + 50) // 100  # s = 200 - 180 = 20
    q100 = tables.quant_table_zz(True, 100)
    assert q100.min() == 1 and q100.max() == 1  # s=0 -> all clamp to 1
    assert tables.quant_table_zz(False, 1).max() == 255


def test_huffman_canonical_dc_luma():
    syms, lens, codes = tables.huffman_canonical(*tables.HUFF_DC_LUMA)
    # Annex K.3.1: code lengths 2,3,3,3,3,3,4,5,6,7,8,9
    assert lens.tolist() == [2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9]
    assert codes[0] == 0b00
    assert codes[1] == 0b010
    assert codes[-1] == 0b111111110


def test_huffman_canonical_ac_luma_known_codes():
    syms, lens, codes = tables.huffman_canonical(*tables.HUFF_AC_LUMA)
    by_sym = {int(s): (int(l), int(c)) for s, l, c in zip(syms, lens, codes)}
    # EOB (0x00) = 1010 (4 bits); ZRL (0xF0) = 11111111001 (11 bits)  [T.81 K.3.2]
    assert by_sym[0x00] == (4, 0b1010)
    assert by_sym[0xF0] == (11, 0b11111111001)
    assert by_sym[0x01] == (2, 0b00)


def test_encode_lut_layout():
    lut = tables.huffman_encode_lut(*tables.HUFF_AC_LUMA, 256)
    entry = int(lut[0x00])
    assert entry >> 16 == 4 and (entry & 0xFFFF) == 0b1010


def test_decode_lut16():
    lut = tables.huffman_decode_lut16(*tables.HUFF_AC_LUMA)
    # peek of EOB code 1010 followed by anything
    peek = 0b1010 << 12
    entry = int(lut[peek])
    assert entry >> 8 == 4 and (entry & 0xFF) == 0x00
    peek = (0b11111111001 << 5) | 0b10101
    entry = int(lut[peek])
    assert entry >> 8 == 11 and (entry & 0xFF) == 0xF0


def test_dct_matrix_orthonormal():
    M = tables.dct2d_matrix_zz()
    assert np.allclose(M @ M.T, np.eye(64), atol=1e-12)


def test_dct_matrix_matches_scipy():
    scipy = pytest.importorskip("scipy")
    from scipy.fft import dctn
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, size=(8, 8)).astype(np.float64)
    ours = (x.reshape(1, 64) @ tables.dct2d_matrix_zz()).reshape(64)
    ref = dctn(x, norm="ortho")[
        tables.ZIGZAG_TO_NATURAL // 8, tables.ZIGZAG_TO_NATURAL % 8]
    assert np.allclose(ours, ref, atol=1e-9)


def test_fdct_idct_roundtrip():
    rng = np.random.default_rng(1)
    q = tables.quant_table_zz(True, 100)  # all ones
    Mq, bias = tables.fdct_fused_matrix(q)
    Ni = tables.idct_fused_matrix(q)
    x = rng.integers(0, 256, size=(4, 64)).astype(np.float32)
    y = np.round(x @ Mq + bias)
    back = np.clip(np.round(y @ Ni + 128), 0, 255)
    assert np.abs(back - x).max() <= 1


def test_subsampling_names_golden():
    """gpujpeg_subsampling_get_name parity (reference unit test pairs,
    test/unit/run_tests.c:17-35, + the J:a:b derivation corners)."""
    from gpujpeg_tpu.types import (PixelFormat, pixel_format_comp_count,
                                   pixel_format_sampling, subsampling_name)

    pairs = [
        (PixelFormat.U8, "4:0:0"),
        (PixelFormat.P420_U8_P0P1P2, "4:2:0"),
        (PixelFormat.P422_U8_P1020, "4:2:2"),
        (PixelFormat.P444_U8_P0P1P2, "4:4:4"),
        (PixelFormat.P4444_U8_P0123, "4:4:4:4"),
    ]
    for pf, want in pairs:
        n = pixel_format_comp_count(pf)
        got = subsampling_name(n, pixel_format_sampling(pf)[:n])
        assert got == want, (pf, got, want)
    assert subsampling_name(3, [(1, 2), (1, 1), (1, 1)]) == "4:4:0"
    assert subsampling_name(3, [(4, 1), (1, 1), (1, 1)]) == "4:1:1"
    assert subsampling_name(3, [(1, 2), (1, 2), (1, 1)]) == "4:4:2"
    assert subsampling_name(3, [(2, 2), (2, 1), (1, 1)]) == "4:2:1"
    assert subsampling_name(2, [(1, 1), (1, 1)]) == "4:0:0:4"
