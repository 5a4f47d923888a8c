"""I/O layer tests: formats, PNM/PAM, Y4M, .tst generator, CLI dispatch."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from gpujpeg_tpu.io import formats, image as iio, pnm, tst, y4m
from gpujpeg_tpu.types import (ColorSpace, ImageParameters, PixelFormat,
                               image_size_bytes)


def test_extension_map():
    assert formats.get_file_format("x.jpg") == formats.FileFormat.JPEG
    assert formats.get_file_format("x.PPM") == formats.FileFormat.PPM
    assert formats.get_file_format("a/b/c.y4m") == formats.FileFormat.Y4M
    assert formats.get_file_format("1920x1080.tst") == formats.FileFormat.TST
    assert formats.get_file_format("noext") == formats.FileFormat.UNKNOWN


def test_implied_raw_parameters():
    pi = formats.implied_parameters(formats.FileFormat.RGB)
    assert pi.color_space == ColorSpace.RGB
    assert pi.pixel_format == PixelFormat.P444_U8_P012
    pi = formats.implied_parameters(formats.FileFormat.I420)
    assert pi.color_space == ColorSpace.YCBCR_BT601_256LVLS
    assert pi.pixel_format == PixelFormat.P420_U8_P0P1P2


def test_pnm_roundtrip():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    pi = ImageParameters(width=23, height=17)
    data = pnm.save_pnm(pi, arr)
    back, pi2 = pnm.load_pnm(data)
    assert pi2.width == 23 and pi2.height == 17
    np.testing.assert_array_equal(arr, back)
    # grayscale P5
    g = rng.integers(0, 256, size=(7, 9), dtype=np.uint8)
    back, pi3 = pnm.load_pnm(pnm.save_pnm(pi, g))
    np.testing.assert_array_equal(g, back)
    assert pi3.pixel_format == PixelFormat.U8


def test_pnm_comments():
    data = b"P5\n# a comment\n4 2\n# another\n255\n" + bytes(8)
    arr, pi = pnm.load_pnm(data)
    assert arr.shape == (2, 4)


def test_pam_roundtrip():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, size=(5, 6, 4), dtype=np.uint8)
    pi = ImageParameters(width=6, height=5)
    back, pi2 = pnm.load_pnm(pnm.save_pnm(pi, arr, pam=True))
    np.testing.assert_array_equal(arr, back)
    assert pi2.pixel_format == PixelFormat.P4444_U8_P0123


def test_y4m_roundtrip():
    rng = np.random.default_rng(5)
    pi = ImageParameters(width=32, height=16, color_space=ColorSpace.YCBCR_BT601_256LVLS,
                         pixel_format=PixelFormat.P420_U8_P0P1P2)
    size = image_size_bytes(32, 16, pi.pixel_format)
    arr = rng.integers(0, 256, size=size, dtype=np.uint8)
    data = y4m.save_y4m(pi, arr)
    assert data.startswith(b"YUV4MPEG2 W32 H16")
    back, pi2 = y4m.load_y4m(data)
    np.testing.assert_array_equal(arr, back)
    assert pi2.pixel_format == PixelFormat.P420_U8_P0P1P2
    assert pi2.color_space == ColorSpace.YCBCR_BT601_256LVLS


def test_y4m_limited_range():
    pi = ImageParameters(width=4, height=2, color_space=ColorSpace.YCBCR_BT601,
                         pixel_format=PixelFormat.P444_U8_P0P1P2)
    data = y4m.save_y4m(pi, np.zeros(24, np.uint8))
    assert b"XCOLORRANGE=LIMITED" in data
    _, pi2 = y4m.load_y4m(data)
    assert pi2.color_space == ColorSpace.YCBCR_BT601


def test_tst_parse_and_patterns():
    pi, t = tst.parse_tst_filename("1920x1080.tst")
    assert (pi.width, pi.height) == (1920, 1080)
    assert pi.pixel_format == PixelFormat.P444_U8_P012
    pi, t = tst.parse_tst_filename("64x32.c_ycbcr-jpeg.p_u8.random_77.tst")
    assert pi.color_space == ColorSpace.YCBCR_BT601_256LVLS
    assert pi.pixel_format == PixelFormat.U8
    assert t["pattern"] == "random" and t["seed"] == 77

    data, pi = tst.generate("16x8.blank_128.tst")
    assert data.shape == (16 * 8 * 3,)
    assert (data == 128).all()

    g, pi = tst.generate("8x8.p_u8.tst")
    # gradient: line i filled with i*255/height
    assert (g.reshape(8, 8) == (np.arange(8) * 255 // 8)[:, None]).all()


def test_tst_lcg_matches_reference_algorithm():
    """Vectorized LCG == the reference's scalar loop
    (image_delegate.c:560-582)."""
    A, C, M = 1664525, 1013904223, 2147483647
    state = 12345
    want = []
    for _ in range(1000):
        state = (A * state + C) % M
        want.append(state % 256)
    got = tst.lcg_bytes(1000, 12345)
    np.testing.assert_array_equal(np.asarray(want, np.uint8), got)


def test_image_dispatch_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    pi = ImageParameters(width=11, height=9, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    p = str(tmp_path / "img.ppm")
    iio.save(p, pi, arr)
    back, pi2 = iio.load(p)
    np.testing.assert_array_equal(arr, back)
    # raw passthrough
    p2 = str(tmp_path / "img.rgb")
    iio.save(p2, pi, arr)
    back2, pi3 = iio.load(p2)
    np.testing.assert_array_equal(arr.reshape(-1), back2)
    assert pi3.pixel_format == PixelFormat.P444_U8_P012


def test_image_probe(tmp_path):
    pi = iio.probe("320x200.p_u8.tst")
    assert (pi.width, pi.height) == (320, 200)
    assert pi.pixel_format == PixelFormat.U8
    pi = iio.probe(str(tmp_path / "nonexistent.uyvy"), file_exists=False)
    assert pi.pixel_format == PixelFormat.P422_U8_P1020


def test_pil_png_bmp_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    pi = ImageParameters(width=4, height=5)
    for ext in ("png", "bmp", "tga"):
        p = str(tmp_path / f"x.{ext}")
        iio.save(p, pi, arr)
        back, pi2 = iio.load(p)
        np.testing.assert_array_equal(arr, back)


def test_cli_subsampling_parse():
    from gpujpeg_tpu.cli import parse_subsampling
    assert parse_subsampling("4:4:4") == ((1, 1), (1, 1), (1, 1))
    assert parse_subsampling("4:2:2") == ((2, 1), (1, 1), (1, 1))
    assert parse_subsampling("4:2:0") == ((2, 2), (1, 1), (1, 1))
    with pytest.raises(ValueError):
        parse_subsampling("4")


def test_cli_encode_decode_roundtrip(tmp_path):
    """Full CLI: tst -> jpg -> ppm."""
    from gpujpeg_tpu import cli

    jpg = str(tmp_path / "out.jpg")
    ppm = str(tmp_path / "out.ppm")
    assert cli.main(["-e", "64x48.tst", jpg, "-q", "90"]) == 0
    assert os.path.getsize(jpg) > 100
    assert cli.main(["-d", jpg, ppm]) == 0
    arr, pi = iio.load(ppm)
    assert arr.shape == (48, 64, 3)
    # gradient roundtrip sanity: rows should be monotonically brighter
    col = arr[:, :, 0].mean(axis=1)
    assert col[-1] > col[0] + 100


def test_y4m_multiframe_roundtrip():
    """load_y4m_frames yields every FRAME; save_y4m_frames round-trips."""
    from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat

    rng = np.random.default_rng(3)
    pi = ImageParameters(width=8, height=4,
                         color_space=ColorSpace.YCBCR_BT601_256LVLS,
                         pixel_format=PixelFormat.P420_U8_P0P1P2)
    frames = [rng.integers(0, 256, 8 * 4 * 3 // 2, endpoint=False)
              .astype(np.uint8) for _ in range(5)]
    data = y4m.save_y4m_frames(pi, frames)
    pi2, it = y4m.load_y4m_frames(data)
    got = list(it)
    assert (pi2.width, pi2.height) == (8, 4)
    assert len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)
    # single-frame API still reads the first frame
    first, _ = y4m.load_y4m(data)
    assert np.array_equal(first, frames[0])


def test_cli_y4m_batch_encode(tmp_path):
    """CLI -B: a 16-frame Y4M sequence encodes through the mesh-'data'
    BatchEncoder (BASELINE config 4: video batch, BT.709 limited via -c,
    SPIFF header auto-selected for limited range), and every output
    matches the single-frame Encoder byte-for-byte."""
    from gpujpeg_tpu import cli, Encoder, Parameters
    from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat

    rng = np.random.default_rng(11)
    w, h, n = 64, 48, 16
    pi = ImageParameters(width=w, height=h,
                         color_space=ColorSpace.YCBCR_BT709,
                         pixel_format=PixelFormat.P420_U8_P0P1P2)
    size = w * h * 3 // 2
    # smooth-ish frames: low-frequency base + small noise
    base = rng.integers(64, 192, size).astype(np.uint8)
    frames = [(base + i) % 255 for i in range(n)]
    seq = str(tmp_path / "seq.y4m")
    with open(seq, "wb") as f:
        f.write(y4m.save_y4m_frames(pi.with_(
            color_space=ColorSpace.YCBCR_BT601), frames))

    out_pat = str(tmp_path / "f_%03d.jpg")
    assert cli.main(["-e", "-B", "8", "-c", "ycbcr-bt709", "-q", "85",
                     seq, out_pat]) == 0
    enc = Encoder()
    for i in range(n):
        p = str(tmp_path / ("f_%03d.jpg" % i))
        assert os.path.getsize(p) > 100, p
        with open(p, "rb") as f:
            got = f.read()
        want = bytes(enc.encode(frames[i], Parameters(quality=85), pi))
        assert got == want, f"frame {i} differs from single-frame encode"


def test_cli_info(tmp_path, capsys):
    from gpujpeg_tpu import cli

    jpg = str(tmp_path / "i.jpg")
    assert cli.main(["-e", "32x16.tst", jpg]) == 0
    assert cli.main(["-I", jpg]) == 0
    out = capsys.readouterr().out
    assert "width: 32" in out and "height: 16" in out
