"""Native C++ host runtime (ctypes-bound; numpy fallbacks when unavailable).

The reference's host layer is C (stream assembly, scan splitting,
unstuffing, test-pattern generation); this package provides the same
routines as a small C++ library built on demand with g++/OpenMP, loaded
through ctypes (no pybind11 dependency).  Every entry point has a numpy
fallback so the pure-Python install keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("GPUJPEG_TPU_NATIVE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "gpujpeg_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _ensure_built() -> Optional[str]:
    src = os.path.join(os.path.dirname(__file__), "stream.cpp")
    if not os.path.exists(src):
        return None
    out = os.path.join(_build_dir(), "libgpujpeg_tpu_native.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out]
    try:
        subprocess.run(cmd + ["-fopenmp", "-march=native"],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            return None
    return out


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (numpy fallbacks engage)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GPUJPEG_TPU_NO_NATIVE"):
        return None
    path = _ensure_built()
    if path is None:
        return None
    try:
        L = ctypes.CDLL(path)
        L.gj_assemble_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        L.gj_scan_split.restype = ctypes.c_int64
        L.gj_scan_split.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        L.gj_unstuff_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        L.gj_lcg_fill.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_uint32]
        L.gj_parse_offsets.restype = ctypes.c_int64
        L.gj_parse_offsets.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        L.gj_pack_tokens.restype = ctypes.c_int64
        L.gj_pack_tokens.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        L.gj_native_version.restype = ctypes.c_int
        _LIB = L
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def assemble_rows(rows_bytes: np.ndarray, row_bytes: np.ndarray) -> bytes:
    """Compact (nseg, stride) uint8 rows into one contiguous byte string."""
    nseg, stride = rows_bytes.shape
    row_bytes = np.ascontiguousarray(row_bytes, np.int32)
    offsets = np.zeros(nseg, np.int64)
    np.cumsum(row_bytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + row_bytes[-1]) if nseg else 0
    L = lib()
    if L is None:
        mask = (np.arange(stride)[None, :] < row_bytes[:, None])
        return rows_bytes[mask].tobytes()
    out = np.empty(total, np.uint8)
    rows_bytes = np.ascontiguousarray(rows_bytes)
    L.gj_assemble_rows(_ptr(rows_bytes), nseg, stride, _ptr(row_bytes),
                       _ptr(offsets), _ptr(out))
    return out.tobytes()


def scan_split(data: np.ndarray, start: int, max_segments: int):
    """Split scan entropy data at RST markers (native memchr loop).

    Returns (segments (n, 2) int64 [abs_start, abs_end) rows, end_pos,
    bad_markers) or None when the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data)
    sub = data[start:]
    starts = np.zeros(max_segments, np.int64)
    ends = np.zeros(max_segments, np.int64)
    end_pos = ctypes.c_int64(0)
    bad = ctypes.c_int64(0)
    n = L.gj_scan_split(_ptr(sub), len(sub), _ptr(starts), _ptr(ends),
                        max_segments, ctypes.byref(end_pos),
                        ctypes.byref(bad))
    segs = np.stack([starts[:n], ends[:n]], axis=1) + start
    return segs, int(end_pos.value) + start, int(bad.value)


def unstuff_rows(data: np.ndarray, ranges, row_words: int, out=None,
                 zero_tail: bool = False):
    """Unstuff segments into a (nseg, row_words) big-endian u32 matrix.

    ranges: (nseg, 2) int64 [start, end) rows (or a list of pairs), OR a
    (starts, ends) tuple of contiguous int64 1-D arrays — the copy-free
    form ScanInfo.segment_bounds produces (the (n, 2) column extraction
    cost ~6 ms per 8K Q100 frame at 1.55 M segments).
    out: optional caller-provided (nseg, row_words * 4) uint8 buffer —
    a fresh np.empty page-faults its ~100 MB inside the parallel fill
    at restart_interval 1 (measured +40-90 ms per 8K Q100 frame);
    session buffers keep the pages warm.
    zero_tail: zero row bytes past the payload.  Off by default: the
    decode kernels gate every bit-commit by the per-segment bit count
    (phase-A/C cursor+consumed checks), so tail garbage is never
    decoded into results for valid streams — and skipping the memset
    cuts ~40% of the matrix writes at restart_interval 1.  (Corrupt
    streams remain contained either way; only WHICH poisoned value a
    corrupt lane reports may vary run to run.)
    Returns (words, nbits) or None when the native library is missing."""
    L = lib()
    if L is None:
        return None
    if isinstance(ranges, tuple):
        starts, ends = ranges
        starts = np.ascontiguousarray(starts, np.int64)
        ends = np.ascontiguousarray(ends, np.int64)
        nseg = len(starts)
    else:
        r = np.asarray(ranges, np.int64).reshape(-1, 2)
        nseg = len(r)
        starts = np.ascontiguousarray(r[:, 0])
        ends = np.ascontiguousarray(r[:, 1])
    if out is not None and out.shape == (nseg, row_words * 4) \
            and out.dtype == np.uint8 and out.flags.c_contiguous:
        mat = out
    else:
        mat = np.empty((nseg, row_words * 4), np.uint8)
    out_bytes = np.zeros(nseg, np.int32)
    data = np.ascontiguousarray(data)
    L.gj_unstuff_rows(_ptr(data), nseg, _ptr(starts), _ptr(ends),
                      _ptr(mat), row_words, _ptr(out_bytes),
                      1 if zero_tail else 0)
    # host-order view (zero-copy): stream byte k = byte k of the word;
    # device pipelines byteswap on ingestion (a numpy ">u4" astype here
    # cost ~4 ms per 8K frame on the host)
    words = mat.view(np.uint32)
    return words, (out_bytes * 8).astype(np.int32)


def parse_offsets(data: np.ndarray, chunks, base: int):
    """Decode APP13 segment-info chunks (list of (offset, byte_len)
    into `data`) to absolute int64 positions + monotonicity flag:
    (offsets, bad) or None when the native library is unavailable or a
    chunk is malformed."""
    L = lib()
    if L is None or not chunks:
        return None
    offs = np.ascontiguousarray([c[0] for c in chunks], np.int64)
    lens = np.ascontiguousarray([c[1] for c in chunks], np.int64)
    if (lens % 4).any():
        return None
    total = int(lens.sum()) // 4
    out = np.empty(total, np.int64)
    bad = ctypes.c_int64(0)
    data = np.ascontiguousarray(data)
    n = L.gj_parse_offsets(_ptr(data), len(offs), _ptr(offs), _ptr(lens),
                           base, _ptr(out), ctypes.byref(bad))
    if n < 0:
        return None
    return out, int(bad.value)


def pack_tokens(bits: np.ndarray, lens: np.ndarray) -> bytes:
    """Sequentially pack (right-aligned codeword, bit length) token arrays
    into a stuffed, F.1.2.3-padded byte string — the restart_interval == 0
    entropy coder (counterpart of gpujpeg_huffman_cpu_encoder.c:72-107).
    Zero-length slots are padding and are skipped."""
    bits = np.ascontiguousarray(bits.reshape(-1), np.uint32)
    lens = np.ascontiguousarray(lens.reshape(-1), np.int32)
    L = lib()
    if L is not None:
        cap = int(lens[lens > 0].sum()) // 8 * 2 + 16
        out = np.empty(cap, np.uint8)
        n = L.gj_pack_tokens(_ptr(bits), _ptr(lens), len(bits),
                             _ptr(out), cap)
        if n < 0:
            raise RuntimeError("pack_tokens capacity overflow")
        return out[:n].tobytes()
    # pure-Python fallback (correct, slow; small images only)
    acc = 0
    nb = 0
    out = bytearray()
    for b, l in zip(bits.tolist(), lens.tolist()):
        if l <= 0:
            continue
        acc = (acc << l) | (b & ((1 << l) - 1))
        nb += l
        while nb >= 8:
            byte = (acc >> (nb - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0)
            nb -= 8
        acc &= (1 << nb) - 1
    if nb:
        byte = ((acc << (8 - nb)) | ((1 << (8 - nb)) - 1)) & 0xFF
        out.append(byte)
        if byte == 0xFF:
            out.append(0)
    return bytes(out)


_ORACLE: Optional[ctypes.CDLL] = None
_ORACLE_TRIED = False


def jpeg_oracle() -> Optional[ctypes.CDLL]:
    """libjpeg coefficient-oracle library (tests/parity only), or None
    when libjpeg headers/libs are unavailable on this machine."""
    global _ORACLE, _ORACLE_TRIED
    if _ORACLE_TRIED:
        return _ORACLE
    _ORACLE_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "jpeg_oracle.c")
    if not os.path.exists(src):
        return None
    out = os.path.join(_build_dir(), "libgpujpeg_tpu_oracle.so")
    if not (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        cmd = ["gcc", "-O2", "-shared", "-fPIC", src, "-o", out, "-ljpeg"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            return None
    try:
        L = ctypes.CDLL(out)
        L.gj_oracle_info.restype = ctypes.c_long
        L.gj_oracle_info.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        L.gj_oracle_coefs.restype = ctypes.c_long
        L.gj_oracle_coefs.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p]
        _ORACLE = L
    except OSError:
        _ORACLE = None
    return _ORACLE


def libjpeg_coefficients(data: bytes):
    """Quantized DCT coefficients exactly as LIBJPEG decodes them:
    (per-component (bh, bw, 64) int16 natural-order arrays,
    per-component (64,) uint16 natural-order quant tables), or None when
    the oracle library cannot be built.  The decoder's coefficient-level
    bit-exactness oracle for foreign streams."""
    L = jpeg_oracle()
    if L is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    ncomp = ctypes.c_int(0)
    bw = np.zeros(4, np.int32)
    bh = np.zeros(4, np.int32)
    if L.gj_oracle_info(_ptr(buf), len(buf), ctypes.byref(ncomp),
                        _ptr(bw), _ptr(bh)) != 0:
        raise ValueError("libjpeg could not decode the stream")
    nc = int(ncomp.value)
    outs = [np.zeros((int(bh[c]), int(bw[c]), 64), np.int16)
            for c in range(nc)]
    qts = [np.zeros(64, np.uint16) for c in range(nc)]
    PtrArr = ctypes.c_void_p * nc
    optrs = PtrArr(*[o.ctypes.data_as(ctypes.c_void_p).value
                     for o in outs])
    qptrs = PtrArr(*[q.ctypes.data_as(ctypes.c_void_p).value
                     for q in qts])
    if L.gj_oracle_coefs(_ptr(buf), len(buf), optrs, qptrs) != 0:
        raise ValueError("libjpeg could not decode the stream")
    return outs, qts


def lcg_fill(n: int, seed: int) -> np.ndarray:
    L = lib()
    out = np.empty(n, np.uint8)
    if L is None:
        from ..io.tst import lcg_bytes

        return lcg_bytes(n, seed)
    L.gj_lcg_fill(_ptr(out), n, seed & 0xFFFFFFFF)
    return out
