"""Legacy LUT decoder fallback for streams with >2 Huffman table sets."""

import numpy as np

import gpujpeg_tpu as gj


def test_legacy_multi_table_fallback():
    # craft a stream that uses >2 table sets: encode normally, then rewrite
    # SOS table selectors? simplest: duplicate a DHT with new ids and point one
    # component's AC at it (identical content => same pixels).
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.stack([(xx*255//w), (yy*255//h), np.full((h,w),77)], -1).astype(np.uint8)
    data = bytearray(gj.Encoder().encode(frame, gj.Parameters(quality=85, restart_interval=4)))
    # find chroma AC DHT (class 1, id 1) and append a copy with id 2
    i = 2
    inserted = False
    while i < len(data) - 4:
        if data[i] == 0xFF and data[i+1] == 0xC4:
            ln = (data[i+2] << 8) | data[i+3]
            tc_th = data[i+4]
            if tc_th == 0x11:  # AC table 1
                seg = bytes(data[i:i+2+ln])
                new = bytearray(seg); new[4] = 0x12   # AC table id 2
                data[i+2+ln:i+2+ln] = bytes(new)
                inserted = True
                break
            i += 2 + ln
        else:
            i += 1
    assert inserted
    # point component 3 (index 2) AC selector at table 2 in every SOS
    j = 0
    count = 0
    while j < len(data) - 2:
        if data[j] == 0xFF and data[j+1] == 0xDA:
            ln = (data[j+2] << 8) | data[j+3]
            ns = data[j+4]
            for k in range(ns):
                cid = data[j+5+2*k]; tabs = data[j+6+2*k]
                if cid == 3:
                    data[j+6+2*k] = (tabs & 0xF0) | 0x02
                    count += 1
            j += 2 + ln
        else:
            j += 1
    assert count >= 1, "no SOS selector patched"
    dec = gj.Decoder()
    out = np.asarray(dec.decode(bytes(data)))
    base = np.asarray(dec.decode(gj.Encoder().encode(frame, gj.Parameters(quality=85, restart_interval=4))))
    assert (out == base).all(), "legacy path output differs"
    print("legacy >2-table-set decode OK")
