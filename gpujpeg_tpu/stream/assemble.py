"""Host-side codestream assembly: stuffing, restart markers, scan stitching.

Mirrors the reference's CPU stream formatter (gpujpeg_encoder.c:566-624) but
fully vectorized in numpy: output positions for every byte are computed with
one cumulative sum over the 0xFF-stuffing mask plus per-segment RST marker
shifts, then a single scatter writes the scan body (stuffed 0x00 bytes appear
for free as the zero-initialized gaps).

Will be backed by the C++ native module for large frames (native/).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..utils.geometry import Geometry
from . import markers, writer as jwriter


def assemble_scan_body(data: np.ndarray, seg_bytes: np.ndarray,
                       use_rst: bool):
    """Stuff + add restart markers for one scan.

    data:      (N,) uint8 concatenated unstuffed byte-aligned segments
    seg_bytes: (nseg,) int per-segment byte counts (sum == N)

    Returns (body, seg_out_offsets): body is the stuffed scan entropy data
    with RST(i%8) after segment i (the final RST is dropped, matching
    gpujpeg_encoder.c:587,619); seg_out_offsets has nseg+1 entries: the
    output offset of each segment start plus the total body length
    (the APP13 segment-info payload, gpujpeg_writer.c:520-600).
    """
    nseg = len(seg_bytes)
    n = int(data.shape[0])
    is_ff = data == 0xFF
    # number of stuffed zeros before each byte
    nff_before = np.zeros(n, dtype=np.int64)
    np.cumsum(is_ff[:-1], out=nff_before[1:])
    seg_starts_in = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(np.asarray(seg_bytes, dtype=np.int64), out=seg_starts_in[1:])
    rst_shift = 0
    if use_rst and nseg > 1:
        seg_idx = np.repeat(np.arange(nseg, dtype=np.int64),
                            np.asarray(seg_bytes, dtype=np.int64))
        rst_shift = 2 * seg_idx
    out_pos = np.arange(n, dtype=np.int64) + nff_before + rst_shift
    total_ff = int(is_ff.sum())
    out_len = n + total_ff + (2 * (nseg - 1) if use_rst and nseg > 1 else 0)
    body = np.zeros(out_len, dtype=np.uint8)
    body[out_pos] = data

    # segment output offsets
    nff_at = np.zeros(nseg + 1, dtype=np.int64)
    csum_ff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(is_ff, out=csum_ff[1:])
    nff_at = csum_ff[seg_starts_in]
    seg_out = seg_starts_in + nff_at
    if use_rst and nseg > 1:
        seg_out = seg_out + 2 * np.minimum(np.arange(nseg + 1), nseg - 1)
    # restart markers: after segment i (i < nseg-1) comes RST(i % 8)
    if use_rst and nseg > 1:
        rst_pos = seg_out[1:nseg] - 2
        body[rst_pos] = 0xFF
        body[rst_pos + 1] = (markers.RST0
                             + (np.arange(nseg - 1) % 8)).astype(np.uint8)
    return body, seg_out


def assemble(geo: Geometry, header: bytes, compact: np.ndarray,
             seg_bytes: np.ndarray,
             orientation=None) -> bytes:
    """Full codestream: header + per-scan [APP13*] SOS body + EOI.

    compact: (>= total,) uint8 device-packed unstuffed segment bytes in
             global segment order (per-scan contiguous)
    seg_bytes: (segment_count,) per-segment byte counts
    """
    param = geo.param
    use_rst = param.restart_interval > 0
    out = bytearray(header)
    seg_bytes = np.asarray(seg_bytes, dtype=np.int64)
    seg_base = 0
    byte_base = 0
    for scan_index, scan_nseg in enumerate(geo.scan_segment_counts):
        sb = seg_bytes[seg_base:seg_base + scan_nseg]
        n = int(sb.sum())
        body, seg_out = assemble_scan_body(
            compact[byte_base:byte_base + n], sb, use_rst)
        if param.segment_info and use_rst:
            out += jwriter.write_segment_info_headers(scan_index, seg_out)
        out += jwriter.write_scan_header(geo, scan_index)
        out += body.tobytes()
        seg_base += scan_nseg
        byte_base += n
    out += bytes((0xFF, markers.EOI))
    return bytes(out)
