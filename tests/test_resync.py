"""Corrupt-stream recovery: RST resync, segment shortfalls, truncation,
bit flips.  The decoder must decode-or-degrade, never throw uncontrolled
(reference behavior: gpujpeg_reader.c:1071-1155).
"""

import numpy as np
import pytest

from gpujpeg_tpu import Decoder, Encoder, Parameters
from gpujpeg_tpu.types import (ColorSpace, CorruptStreamError,
                               ImageParameters, PixelFormat)

W, H = 128, 96


def make_stream(rng, quality=85):
    g = rng.normal(size=(H // 8 + 2, W // 8 + 2, 3))
    up = np.kron(g, np.ones((8, 8, 1)))[:H, :W]
    up = (up - up.min()) / (np.ptp(up) + 1e-9)
    img = (up * 255).astype(np.uint8)
    pi = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    out = Encoder().encode(img, Parameters(quality=quality,
                                           restart_interval=4), pi)
    return img, out


def find_rst_positions(data: bytes):
    pos = []
    i = 2
    n = len(data)
    scan = False
    while i < n - 1:
        if data[i] == 0xFF:
            m = data[i + 1]
            if m == 0x00:
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                if scan:
                    pos.append(i)
                i += 2
                continue
            if m == 0xDA:
                ln = int.from_bytes(data[i + 2:i + 4], "big")
                i += 2 + ln
                scan = True
                continue
            if m == 0xD9:
                break
            ln = int.from_bytes(data[i + 2:i + 4], "big")
            i += 2 + ln
            scan = False
            continue
        i += 1
    return pos


def test_wrong_rst_index_resyncs(rng):
    """Replacing an RST marker's index must trigger resync, not a crash."""
    img, data = make_stream(rng)
    pos = find_rst_positions(data)
    assert len(pos) > 10
    b = bytearray(data)
    p = pos[len(pos) // 2]
    b[p + 1] = 0xD0 + ((b[p + 1] - 0xD0 + 3) % 8)   # wrong index
    arr = Decoder().decode(bytes(b))
    assert arr.shape == (H, W, 3)
    # most of the image still decodes correctly
    ok = np.mean(np.abs(arr.astype(int) - img.astype(int)) < 48)
    assert ok > 0.5, ok


def test_dropped_segment_shortfall(rng):
    """Splicing out a whole segment leaves the scan short; the decoder
    pads with empty segments instead of raising."""
    img, data = make_stream(rng)
    pos = find_rst_positions(data)
    a, bpos = pos[4], pos[5]
    b = bytes(data[:a]) + bytes(data[bpos:])   # drop segment + one marker
    arr = Decoder().decode(b)
    assert arr.shape == (H, W, 3)


def test_truncated_stream_contained(rng):
    """A truncated stream either raises CorruptStreamError or decodes
    degraded — no uncontrolled exception."""
    img, data = make_stream(rng)
    for frac in (0.9, 0.6, 0.3):
        cut = data[: int(len(data) * frac)]
        try:
            arr = Decoder().decode(cut)
            assert arr.shape == (H, W, 3)
        except CorruptStreamError:
            pass


def test_bitflip_fuzz_contained(rng):
    """Random byte corruption inside entropy data must never escape as
    anything but CorruptStreamError (usually decodes degraded)."""
    img, data = make_stream(rng)
    pos = find_rst_positions(data)
    start, end = pos[0] + 2, pos[-1]
    for trial in range(8):
        b = bytearray(data)
        for _ in range(6):
            i = int(rng.integers(start, end))
            # avoid creating 0xFF bytes (marker-space mutation is a
            # different test) — flip low bits only
            b[i] ^= int(rng.integers(1, 64))
            if b[i] == 0xFF:
                b[i] = 0xFE
        try:
            arr = Decoder().decode(bytes(b))
            assert arr.shape == (H, W, 3)
        except CorruptStreamError:
            pass


def test_marker_space_mutation_contained(rng):
    """Inject raw 0xFF-marker garbage into entropy data; parser must
    resync or raise the typed error."""
    img, data = make_stream(rng)
    pos = find_rst_positions(data)
    b = bytearray(data)
    p = pos[2] + 8
    b[p:p + 2] = b"\xff\xc8"   # a non-RST marker inside scan data
    try:
        arr = Decoder().decode(bytes(b))
        assert arr.shape == (H, W, 3)
    except CorruptStreamError:
        pass
