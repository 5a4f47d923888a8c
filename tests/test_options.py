"""Option system, reformat tool, and stream-hardening tests."""

import io

import numpy as np
import pytest

import gpujpeg_tpu as gj
from gpujpeg_tpu.stream import reformat
from gpujpeg_tpu.types import RestartChangeError


@pytest.fixture
def frame():
    h, w = 64, 80
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 // w), (yy * 255 // h),
                     np.full((h, w), 128)], -1).astype(np.uint8)


def _pil(data):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def test_flipped_option(frame):
    p = gj.Parameters(quality=90, restart_interval=4)
    base = _pil(gj.Encoder().encode(frame, p))
    enc = gj.Encoder()
    enc.set_option("enc_opt_flipped", "true")
    flip = _pil(enc.encode(frame, p))
    assert np.abs(base[::-1].astype(int) - flip.astype(int)).mean() < 3


def test_channel_remap_option(frame):
    p = gj.Parameters(quality=90, restart_interval=4)
    base = _pil(gj.Encoder().encode(frame, p))
    enc = gj.Encoder()
    enc.set_option("enc_opt_channel_remap", "210")
    rem = _pil(enc.encode(frame, p))
    assert np.abs(base[..., ::-1].astype(int) - rem.astype(int)).mean() < 3


def test_header_overrides(frame):
    p = gj.Parameters(quality=80, restart_interval=4)
    enc = gj.Encoder()
    enc.set_option("enc_hdr", "SPIFF")
    assert b"SPIFF\x00" in enc.encode(frame, p)
    enc2 = gj.Encoder()
    enc2.set_option("enc_exif_tag", "0x013B:ASCII=tpujpeg")
    out = enc2.encode(frame, p)
    assert b"Exif\x00\x00" in out
    # streams still decode
    _pil(out)


def test_decoder_flip_and_remap(frame):
    p = gj.Parameters(quality=90, restart_interval=4)
    data = gj.Encoder().encode(frame, p)
    base = _pil(data)
    dec = gj.Decoder()
    dec.set_option("dec_opt_flipped", "true")
    out = np.asarray(dec.decode(data))
    assert np.abs(base[::-1].astype(int) - out.astype(int)).mean() < 3
    dec2 = gj.Decoder()
    dec2.set_option("dec_opt_channel_remap", "210")
    out2 = np.asarray(dec2.decode(data))
    assert np.abs(base[..., ::-1].astype(int) - out2.astype(int)).mean() < 3


def test_invalid_options():
    enc = gj.Encoder()
    with pytest.raises(ValueError):
        enc.set_option("enc_bogus", "1")
    dec = gj.Decoder()
    with pytest.raises(ValueError):
        dec.set_option("dec_bogus", "1")


def test_reformat_injects_segment_info(frame):
    p = gj.Parameters(quality=80, restart_interval=4)
    plain = gj.Encoder().encode(frame, p)
    assert b"\xff\xed" not in plain
    ref = reformat.add_segment_info(plain)
    assert b"\xff\xed" in ref
    assert (_pil(plain) == _pil(ref)).all()
    dec = gj.Decoder()
    assert (np.asarray(dec.decode(plain))
            == np.asarray(dec.decode(ref))).all()


def test_dri_change_detected(frame):
    p = gj.Parameters(quality=80, restart_interval=4)
    data = bytearray(gj.Encoder().encode(frame, p))
    # append a second DRI with a different interval + fake tiny scan
    # after the first scan: simplest is DRI right before EOI
    insert = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x63])
    data[-2:-2] = insert
    with pytest.raises(RestartChangeError):
        gj.Decoder().decode(bytes(data))


def test_corrupt_segment_contained(frame):
    """Garbage in one segment must not crash; other segments decode."""
    p = gj.Parameters(quality=85, restart_interval=4)
    data = bytearray(gj.Encoder().encode(frame, p))
    # find first RST marker and trash the bytes before it
    idx = bytes(data).find(b"\xff\xd0")
    assert idx > 0
    for k in range(max(idx - 6, 0), idx - 1):
        if data[k] != 0xFF and data[k - 1] != 0xFF:
            data[k] = 0x55
    out = np.asarray(gj.Decoder().decode(bytes(data)))
    assert out.shape == (64, 80, 3)  # survived with the right shape
