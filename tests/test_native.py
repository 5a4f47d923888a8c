"""Native C++ host-runtime tests (ctypes module vs numpy fallbacks)."""

import numpy as np
import pytest

from gpujpeg_tpu import native
from gpujpeg_tpu.io import tst


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable")


@needs_native
def test_native_version():
    assert native.lib().gj_native_version() == 4


@needs_native
def test_pack_tokens_matches_fallback(monkeypatch):
    rng = np.random.default_rng(2)
    n = 4096
    lens = rng.integers(0, 27, size=n).astype(np.int32)
    lens[rng.random(n) < 0.2] = 0          # padding slots are skipped
    bits = (rng.integers(0, 1 << 27, size=n).astype(np.uint32)
            & ((np.uint32(1) << np.maximum(lens, 1).astype(np.uint32)) - 1))
    got = native.pack_tokens(bits, lens)
    # pure-Python fallback as oracle
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    want = native.pack_tokens(bits, lens)
    assert got == want
    # stuffing: every 0xFF byte is followed by 0x00
    b = np.frombuffer(got, np.uint8)
    ff = np.nonzero(b[:-1] == 0xFF)[0]
    assert (b[ff + 1] == 0).all()


@needs_native
def test_assemble_rows_matches_numpy():
    rng = np.random.default_rng(0)
    nseg, stride = 37, 64
    rows = rng.integers(0, 256, size=(nseg, stride), dtype=np.uint8)
    rb = rng.integers(1, stride, size=nseg).astype(np.int32)
    got = native.assemble_rows(rows, rb)
    mask = (np.arange(stride)[None, :] < rb[:, None])
    assert got == rows[mask].tobytes()


@needs_native
def test_scan_split_and_unstuff():
    # two segments with stuffing, RST0 between, EOI after
    seg0 = bytes([0x12, 0xFF, 0x00, 0x34])
    seg1 = bytes([0x56, 0x78])
    data = np.frombuffer(seg0 + b"\xff\xd0" + seg1 + b"\xff\xd9", np.uint8)
    segs, end, bad = native.scan_split(data, 0, 16)
    assert bad == 0
    assert np.array_equal(segs, [(0, 4), (6, 8)])
    assert data[end] == 0xFF and data[end + 1] == 0xD9

    words, nbits = native.unstuff_rows(data, segs, row_words=2)
    assert nbits.tolist() == [3 * 8, 2 * 8]
    # host-order contract: stream byte k IS byte k of the row
    b0 = words[0].tobytes()
    assert b0[:3] == bytes([0x12, 0xFF, 0x34])
    b1 = words[1].tobytes()
    assert b1[:2] == bytes([0x56, 0x78])


@needs_native
def test_scan_split_out_of_sequence_warns():
    data = np.frombuffer(
        bytes([0x11]) + b"\xff\xd5" + bytes([0x22]) + b"\xff\xd9", np.uint8)
    segs, end, bad = native.scan_split(data, 0, 8)
    assert len(segs) == 2
    assert bad == 1  # expected RST0, found RST5


@needs_native
def test_lcg_matches_python():
    np.testing.assert_array_equal(native.lcg_fill(999, 12345),
                                  tst.lcg_bytes(999, 12345))
    np.testing.assert_array_equal(native.lcg_fill(100, 7),
                                  tst.lcg_bytes(100, 7))
