"""Encoder session: the TPU-native equivalent of gpujpeg_encoder.

Orchestrates the jit-compiled device pipeline
    preprocess -> fused DCT+quant (MXU) -> tokenize -> pack (segment-parallel)
and the host-side codestream assembly, with per-geometry jit caches playing
the role of the reference's persistent coder buffers
(gpujpeg_encoder.c:351-643; session-reuse semantics of
gpujpeg_coder_init_image, gpujpeg_common.c:632-637).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct, pack, sample, tokens
from ..stream import writer as jwriter
from ..types import (ColorSpace, ImageParameters, Parameters, PixelFormat,
                     RESTART_AUTO, pixel_format_comp_count,
                     pixel_format_sampling)
from ..utils import tables
from ..utils.geometry import Geometry, get_geometry, suggest_restart_interval

#: pull-window size: floor(32 / min_code_len) + 2 (see ops.pack); the default
#: Annex-K tables all have min code length 2.
K_WINDOW = 18


def _bucket(n: int, lo: int = 4096) -> int:
    """Round up to a power-of-two bucket to bound jit recompiles."""
    b = lo
    while b < n:
        b *= 2
    return b


def adjust_params(param: Parameters, pi: ImageParameters) -> Parameters:
    """Resolve auto values (comp count, sampling, restart interval)
    (gpujpeg_encoder.c:319-348)."""
    if param.comp_count == 0:
        n = min(pixel_format_comp_count(pi.pixel_format), 3) \
            if pi.pixel_format != PixelFormat.P4444_U8_P0123 else 4
        samp = pixel_format_sampling(pi.pixel_format)
        param = param.chroma_subsampled(samp[:n])
    if param.restart_interval == RESTART_AUTO:
        sf = param.sampling_factor[: param.comp_count]
        subsampled = any(s.horizontal != sf[0].horizontal
                         or s.vertical != sf[0].vertical for s in sf)
        param = param.with_(restart_interval=suggest_restart_interval(
            pi, param.comp_count, subsampled, param.interleaved))
    if param.comp_count == 1:
        # grayscale always luminance; internal color space irrelevant
        param = param.with_(interleaved=False)
    return param


@dataclasses.dataclass
class DurationStats:
    """Per-phase timings (gpujpeg_duration_stats, gpujpeg_common.h:365-375)."""

    duration_memory_to: float = 0.0
    duration_memory_from: float = 0.0
    duration_preprocessor: float = 0.0
    duration_dct_quantization: float = 0.0
    duration_huffman_coder: float = 0.0
    duration_stream: float = 0.0
    duration_in_gpu: float = 0.0


@functools.lru_cache(maxsize=32)
def _encode_luts(quality: int, table_indices: Tuple[bool, ...]):
    """Quant tables + Huffman encode LUTs for luma/chroma slots."""
    qtabs = [tables.quant_table_zz(True, quality),
             tables.quant_table_zz(False, quality)]
    dc_lut = np.stack([
        tables.huffman_encode_lut(*tables.huffman_spec_for("dc", True), 16),
        tables.huffman_encode_lut(*tables.huffman_spec_for("dc", False), 16),
    ])
    ac_lut = np.stack([
        tables.huffman_encode_lut(*tables.huffman_spec_for("ac", True), 256),
        tables.huffman_encode_lut(*tables.huffman_spec_for("ac", False), 256),
    ])
    return qtabs, dc_lut, ac_lut


def make_tokens_impl(geo: Geometry):
    """Build the (unjitted) raw->tokens device function for one geometry."""
    qtabs, dc_lut, ac_lut = _encode_luts(geo.param.quality, ())
    stream_perm = geo.stream_to_storage
    identity_perm = bool(np.array_equal(stream_perm,
                                        np.arange(len(stream_perm))))
    rows = geo.seg_rows
    valid = rows >= 0
    rows_clipped = np.maximum(rows, 0)
    rows_identity = bool(
        valid.all() and np.array_equal(rows.reshape(-1),
                                       np.arange(rows.size)))
    nseg, max_bps = rows.shape

    def fn(raw):
        planes = sample.preprocess(raw, geo, geo.param_image)
        coefs = jnp.concatenate([
            dct.fdct_quantize(planes[c.index], qtabs[c.table_index])
            for c in geo.components
        ], axis=0)
        if not identity_perm:
            coefs = coefs[jnp.asarray(stream_perm)]
        bits, lens = tokens.tokenize(
            coefs, geo.stream_dc_prev, geo.stream_table_idx, dc_lut, ac_lut)
        if rows_identity:
            bits_rows = bits.reshape(nseg, max_bps * 64)
            lens_rows = lens.reshape(nseg, max_bps * 64)
        else:
            bits_rows = bits[jnp.asarray(rows_clipped)].reshape(nseg, -1)
            lens_rows = lens[jnp.asarray(rows_clipped)].reshape(nseg, -1)
            lens_rows = jnp.where(
                jnp.asarray(valid).reshape(nseg, max_bps, 1)
                   .repeat(64, axis=2).reshape(nseg, -1),
                lens_rows, 0)
        seg_bits = jnp.sum(lens_rows, axis=1, dtype=jnp.int32)
        seg_bytes = (seg_bits + ((-seg_bits) % 8)) >> 3
        ntok = jnp.sum((lens_rows > 0).astype(jnp.int32)) + nseg  # + pad tokens
        return bits_rows, lens_rows, seg_bytes, ntok

    return fn


def make_tokens_fn(geo: Geometry):
    """Jitted raw->tokens function for one geometry."""
    return jax.jit(make_tokens_impl(geo))


def make_device_encode_fn(geo: Geometry, cap_tokens: int, cap_words: int):
    """One jittable function for the FULL device-side encode:
    raw image -> (packed words, per-segment byte counts).

    Capacities are static; the session Encoder picks them adaptively, while
    fixed-capacity callers (benchmarks, sharded batch encoding) pin them.
    """
    tokens_impl = make_tokens_impl(geo)

    def fn(raw):
        bits_rows, lens_rows, seg_bytes, _ = tokens_impl(raw)
        words, _, _ = pack.pack_segments(
            bits_rows, lens_rows, cap_tokens=cap_tokens,
            cap_words=cap_words, k_window=K_WINDOW)
        return words, seg_bytes

    return fn


def make_full_encode_fn(geo: Geometry, cap_tokens: int, cap_words: int,
                        cap_body: int):
    """The complete device-side encode as ONE jittable program:

        raw -> preprocess -> DCT+quant (MXU) -> tokenize -> segment-parallel
        pack -> byte stuffing + restart markers (finalize)

    Only the JPEG headers are produced on host; the scan bodies leave the
    device fully formed (the reference's CPU stream formatter,
    gpujpeg_encoder.c:566-624, runs on-device here because host<->device
    bandwidth, not compute, is the scarce resource on TPU).

    Returns fn(raw) -> dict with:
      body:    (cap_body,) uint8 stuffed scan bodies (concatenated)
      meta:    (3 + 2*scan_count,) int32
               [live_tokens, unstuffed_bytes, body_bytes,
                scan starts..., scan ends...] — a single vector so the
               per-frame host readback is ONE small fetch
      seg_out: (nseg,) int32 per-segment body offsets (APP13 segment info;
               only fetched when requested)
    """
    tokens_impl = make_tokens_impl(geo)
    scan_first = geo.scan_seg_bounds[:-1].astype(np.int32)
    scan_last = (geo.scan_seg_bounds[1:] - 1).astype(np.int32)

    def fn(raw):
        bits_rows, lens_rows, seg_bytes, _ = tokens_impl(raw)
        words, _, count = pack.pack_segments(
            bits_rows, lens_rows, cap_tokens=cap_tokens,
            cap_words=cap_words, k_window=K_WINDOW)
        body, seg_out, seg_end_out, total_out = pack.finalize_scan_bodies(
            words, seg_bytes, geo.rst_marker, geo.rst_shift, cap_body)
        total_in = jnp.sum(seg_bytes)
        meta = jnp.concatenate([
            jnp.stack([count, total_in, total_out]),
            seg_out[jnp.asarray(scan_first)],
            seg_end_out[jnp.asarray(scan_last)],
        ])
        return {"body": body, "meta": meta, "seg_out": seg_out}

    return fn


@dataclasses.dataclass
class _Caps:
    """Sticky jit capacities per geometry (grown on overflow, then reused)."""

    tokens: int
    words: int
    body: int


def _initial_caps(geo: Geometry) -> _Caps:
    """Content-independent initial guess; exact needs replace it on the
    first overflow (the program recompiles at most twice per geometry)."""
    blocks = geo.total_blocks
    cap_tokens = _bucket(blocks * 20 + geo.segment_count)
    cap_body = _bucket(max(blocks * 40, 1 << 16))
    return _Caps(tokens=cap_tokens, words=cap_body // 4, body=cap_body)


class Encoder:
    """Persistent encoder session (create once, encode many frames)."""

    def __init__(self) -> None:
        self._fns: Dict[Tuple, object] = {}
        self._caps: Dict[Geometry, _Caps] = {}
        self.stats = DurationStats()
        self._frames = 0
        self.segment_info = False

    # -- options (gpujpeg_encoder_set_option, gpujpeg_encoder.c:736-795) -----
    def set_option(self, key: str, value: str) -> None:
        raise NotImplementedError(f"option {key!r} not supported yet")

    def _get_fn(self, geo: Geometry, caps: _Caps):
        key = (geo, caps.tokens, caps.words, caps.body)
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(make_full_encode_fn(
                geo, caps.tokens, caps.words, caps.body))
            self._fns[key] = fn
        return fn

    def encode_to_device(self, image, param: Optional[Parameters] = None,
                         param_image: Optional[ImageParameters] = None,
                         check: bool = True):
        """Device-side encode: returns (geo, result-dict, meta) with the
        stuffed scan bodies still on device (see make_full_encode_fn).
        Capacities are sticky per geometry and grown on overflow.

        check=False skips the capacity-overflow readback (meta is None);
        use only when the caps were already validated for comparable
        content (e.g. a fixed-camera frame pipeline or a benchmark loop).
        """
        if param_image is None:
            if image.ndim < 2:
                raise ValueError("param_image required for flat buffers")
            h, w = image.shape[:2]
            ncomp = image.shape[2] if image.ndim == 3 else 1
            pf = {1: PixelFormat.U8, 3: PixelFormat.P444_U8_P012,
                  4: PixelFormat.P4444_U8_P0123}[ncomp]
            cs = ColorSpace.RGB if ncomp >= 3 else ColorSpace.NONE
            param_image = ImageParameters(width=w, height=h, color_space=cs,
                                          pixel_format=pf)
        param = adjust_params(param or Parameters(), param_image)
        geo = get_geometry(param, param_image)

        caps = self._caps.get(geo)
        if caps is None:
            caps = _initial_caps(geo)
            self._caps[geo] = caps
        x = jnp.asarray(image)

        if not check:
            return geo, self._get_fn(geo, caps)(x), None

        for _ in range(3):
            res = self._get_fn(geo, caps)(x)
            # NOTE: fetching a result before it is ready takes a pathological
            # slow path on some host links — always block first.
            jax.block_until_ready(res["meta"])
            meta = np.asarray(res["meta"])
            ntok, total_in, total_out = (int(v) for v in meta[:3])
            need_words = (total_in + 3) // 4
            if (ntok < caps.tokens and need_words <= caps.words
                    and total_out <= caps.body):
                return geo, res, meta
            caps = _Caps(tokens=_bucket(max(2 * ntok + 2, caps.tokens)),
                         words=_bucket(max(need_words * 2, caps.words),
                                       lo=1024),
                         body=_bucket(max(total_out * 2, caps.body),
                                      lo=4096))
            self._caps[geo] = caps
        raise RuntimeError("encode capacity did not converge")

    def encode(self, image, param: Optional[Parameters] = None,
               param_image: Optional[ImageParameters] = None) -> bytes:
        """Encode one raw image to a JPEG codestream.

        image: numpy/JAX uint8 array — (H, W, C) / (H, W) for interleaved
        formats, flat (N,) for planar formats.
        """
        t0 = time.perf_counter()
        image = np.asarray(image) if not isinstance(image, jax.Array) else image
        geo, res, meta = self.encode_to_device(image, param, param_image)
        ns = geo.scan_count
        scan_start = meta[3:3 + ns]
        scan_end = meta[3 + ns:3 + 2 * ns]
        total_out = int(meta[2])
        t1 = time.perf_counter()

        body_dev = res["body"][:total_out]
        jax.block_until_ready(body_dev)
        body = np.asarray(body_dev)
        t2 = time.perf_counter()

        out = bytearray(jwriter.write_header(geo))
        want_seginfo = geo.param.segment_info or self.segment_info
        seg_out = np.asarray(res["seg_out"]) if want_seginfo else None
        for k in range(geo.scan_count):
            if want_seginfo and geo.param.restart_interval > 0:
                b0, b1 = geo.scan_seg_bounds[k], geo.scan_seg_bounds[k + 1]
                offs = np.concatenate([seg_out[b0:b1], [scan_end[k]]])
                out += jwriter.write_segment_info_headers(
                    k, offs - int(scan_start[k]))
            out += jwriter.write_scan_header(geo, k)
            out += body[int(scan_start[k]):int(scan_end[k])].tobytes()
        out += b"\xff\xd9"
        t3 = time.perf_counter()

        self.stats.duration_in_gpu = (t1 - t0) * 1000.0
        self.stats.duration_memory_from = (t2 - t1) * 1000.0
        self.stats.duration_stream = (t3 - t2) * 1000.0
        self._frames += 1
        return bytes(out)

    def get_stats(self) -> DurationStats:
        return self.stats
