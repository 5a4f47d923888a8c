"""Encoder session: the TPU-native equivalent of gpujpeg_encoder.

Orchestrates the jit-compiled device pipeline

    preprocess -> fused MXU DCT+quant -> gather-free tokenizer
    -> hierarchical bit-merge pack -> byte-stuffing merge tree (+RST)

and the host-side codestream assembly (headers + per-scan row compaction).
Mirrors gpujpeg_encoder.c:351-643 with per-geometry jit caches and sticky,
content-adaptive per-level buffer capacities playing the role of the
reference's persistent coder buffers (gpujpeg_common.c:632-637, worst-case
segment allocations :812-871).

The device never performs a gather or scatter (each costs ~10 ns/element on
TPU through XLA): block order becomes reshape/transpose, the DC predictor
becomes a shift, Huffman code lookup uses <=16-entry tables (free vector
selects), and variable-length serialization is a pairwise merge tree
(ops.bitmerge).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bitmerge, dct, sample, tokens
from ..stream import writer as jwriter
from ..types import (ColorSpace, ImageParameters, Parameters, PixelFormat,
                     RESTART_AUTO, pixel_format_comp_count,
                     pixel_format_sampling)
from ..utils import tables
from ..utils.geometry import Geometry, get_geometry, suggest_restart_interval


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
        bpm = sum(s.horizontal * s.vertical for s in sf)
        param = param.with_(restart_interval=suggest_restart_interval(
            pi, param.comp_count, subsampled, param.interleaved, bpm,
            param.quality))
    if param.comp_count == 1:
        # grayscale always luminance; internal color space irrelevant
        param = param.with_(interleaved=False)
    return param


@dataclasses.dataclass
class DurationStats:
    """Per-phase timings (gpujpeg_duration_stats, gpujpeg_common.h:365-375).

    On TPU the device pipeline is ONE fused program, so the per-kernel
    splits of the reference collapse into duration_in_gpu; host phases are
    reported separately.  Aggregates mirror coder_process_stats
    (gpujpeg_common.c:2169-2254: running average, and the average without
    the first frame, which carries compilation)."""

    duration_memory_to: float = 0.0
    duration_memory_from: float = 0.0
    duration_preprocessor: float = 0.0
    duration_dct_quantization: float = 0.0
    duration_huffman_coder: float = 0.0
    duration_stream: float = 0.0
    duration_in_gpu: float = 0.0
    #: capacity-convergence re-dispatches of the LAST frame (0 in steady
    #: state; duration_in_gpu covers only the final successful dispatch,
    #: so -v output is clean even on a regrow frame)
    retries: int = 0

    def print(self, file=None) -> None:
        import sys

        f = file or sys.stderr
        if self.duration_preprocessor or self.duration_dct_quantization \
                or self.duration_huffman_coder:
            print(f" -Preprocessing:     "
                  f"{self.duration_preprocessor:10.4f} ms", file=f)
            print(f" -DCT & Quantization:"
                  f"{self.duration_dct_quantization:10.4f} ms", file=f)
            print(f" -Huffman Encoder:   "
                  f"{self.duration_huffman_coder:10.4f} ms", file=f)
        print(f" -Device pipeline:   {self.duration_in_gpu:10.4f} ms",
              file=f)
        print(f" -Stream Formatter:  {self.duration_stream:10.4f} ms",
              file=f)
        if self.duration_memory_from:
            print(f" -Copy From Device:  "
                  f"{self.duration_memory_from:10.4f} ms", file=f)
        if self.retries:
            print(f" -Capacity regrows:  {self.retries:10d}", file=f)


@dataclasses.dataclass
class AggregateStats:
    """Running averages (gpujpeg_common.c:2238-2254)."""

    frames: int = 0
    total_ms: float = 0.0
    total_ms_wo_first: float = 0.0

    def add(self, ms: float) -> None:
        self.frames += 1
        self.total_ms += ms
        if self.frames > 1:
            self.total_ms_wo_first += ms

    def summary(self) -> str:
        if not self.frames:
            return "no frames"
        avg = self.total_ms / self.frames
        s = f"avg {avg:.2f} ms / frame ({self.frames} frames)"
        if self.frames > 1:
            s += (f"; {self.total_ms_wo_first / (self.frames - 1):.2f} ms"
                  " without first")
        return s


@functools.lru_cache(maxsize=32)
def _component_luts(quality: int, family: str = "tuned"):
    """Quant tables + per-class Huffman code tables in tokenizer layout.

    Returns (qtabs, dc_luts, ac_luts, ac_affine): ac_affine is the per
    -class tables.affine_ac_runtime() constants for the tuned computable
    family (None entries for annexk — tokenizer falls back to the dense
    256-entry select chain)."""
    qtabs = [tables.quant_table_zz(True, quality),
             tables.quant_table_zz(False, quality)]
    dc, ac, aff = [], [], []
    for luma in (True, False):
        dc.append(tables.huffman_encode_lut(
            *tables.huffman_spec_for("dc", luma), 16)[:12])
        ac.append(tables.huffman_encode_lut(
            *tables.ac_spec(luma, quality, family), 256).reshape(16, 16))
        if family == "tuned":
            aff.append(tables.affine_ac_runtime(
                *tables.affine_params_for_quality(quality, luma)))
        else:
            aff.append(None)
    return qtabs, dc, ac, aff


def apply_pre_transform(raw, pre):
    """Optional vertical flip + channel remap before preprocessing
    (reference preprocessor options: flip gpujpeg_preprocessor.cu:456-486,
    remap :488-559).  `pre` = (flipped, remap) with remap like '210F'
    (digit = source channel, F = all-ones, Z = all-zeros)."""
    if pre is None:
        return raw
    flipped, remap = pre
    if flipped:
        raw = raw[::-1] if raw.ndim >= 2 else raw
    if remap and raw.ndim == 3:
        chans = []
        for ch in remap:
            if ch in "Ff":
                chans.append(jnp.full(raw.shape[:2], 255, raw.dtype))
            elif ch in "Zz":
                chans.append(jnp.zeros(raw.shape[:2], raw.dtype))
            else:
                chans.append(raw[:, :, int(ch)])
        raw = jnp.stack(chans, axis=-1)
    return raw


def make_rows_tokens_impl(geo: Geometry, pre=None, pairs: bool = False,
                          as_list: bool = False):
    """Build the raw -> (bits_rows, lens_rows) device function: per-segment
    token rows (nseg, T) in stream order, assembled purely with
    reshape/transpose/concat (the reference's device block list,
    gpujpeg_common.c:1031-1088, becomes layout math).

    pairs=True emits level-1 pre-merged (nseg, T/2) left-aligned words
    (tokens.tokenize_rows pairs mode) for the fused Pallas packer.

    as_list=True returns per-scan LISTS (bits_list, lens_list) instead of
    concatenated arrays — required for restart_interval == 0, where each
    scan is one segment whose token count differs per component (the host
    sequential packer consumes them scan by scan)."""
    qtabs, dc_luts, ac_luts, ac_affine = _component_luts(
        geo.param.quality, getattr(geo.param, "huffman_tables", "tuned"))
    tpb = 32 if pairs else 64   # emitted slots per block

    if not geo.interleaved:
        valids = []
        for c in geo.components:
            rst = c.segment_mcu_count
            S = c.segment_count
            vm = (np.arange(S * rst).reshape(S, rst) < c.mcu_count)
            valids.append(vm)

        def fn(raw):
            raw = apply_pre_transform(raw, pre)
            planes = sample.preprocess(raw, geo, geo.param_image)
            bits_list, lens_list = [], []
            for c in geo.components:
                ti = c.table_index
                blocks = dct.fdct_quantize(planes[c.index], qtabs[ti])
                rst = c.segment_mcu_count
                S = c.segment_count
                padB = S * rst - c.mcu_count
                if padB:
                    blocks = jnp.pad(blocks, ((0, padB), (0, 0)))
                rows = blocks.reshape(S, rst, 64)
                b, l = tokens.tokenize_rows(rows, dc_luts[ti], ac_luts[ti],
                                            valids[c.index], pairs=pairs,
                                            ac_affine=ac_affine[ti])
                bits_list.append(b)
                lens_list.append(l)
            if as_list:
                return bits_list, lens_list
            return (jnp.concatenate(bits_list, axis=0),
                    jnp.concatenate(lens_list, axis=0))
    else:
        S = geo.segment_count
        rst = geo.segment_mcu_count
        nmcu = geo.mcu_count
        mcu_valid = (np.arange(S * rst).reshape(S, rst) < nmcu)

        def fn(raw):
            raw = apply_pre_transform(raw, pre)
            planes = sample.preprocess(raw, geo, geo.param_image)
            per_comp = []
            for c in geo.components:
                ti = c.table_index
                blocks = dct.fdct_quantize(planes[c.index], qtabs[ti])
                # raster blocks -> (mcu, v, h) stream order: pure transpose
                x = blocks.reshape(c.mcu_count_y, c.samp_v,
                                   c.mcu_count_x, c.samp_h, 64)
                x = x.transpose(0, 2, 1, 3, 4)
                bpm_c = c.samp_v * c.samp_h
                x = x.reshape(nmcu, bpm_c, 64)
                padM = S * rst - nmcu
                if padM:
                    x = jnp.pad(x, ((0, padM), (0, 0), (0, 0)))
                rows = x.reshape(S, rst * bpm_c, 64)
                vm = np.repeat(mcu_valid, bpm_c, axis=1)
                b, l = tokens.tokenize_rows(rows, dc_luts[ti], ac_luts[ti],
                                            vm, pairs=pairs,
                                            ac_affine=ac_affine[ti])
                # (S, rst*bpm_c*tpb) -> (S, rst, bpm_c*tpb) to interleave
                per_comp.append((b.reshape(S, rst, bpm_c * tpb),
                                 l.reshape(S, rst, bpm_c * tpb)))
            bits = jnp.concatenate([b for b, _ in per_comp], axis=2)
            lens = jnp.concatenate([l for _, l in per_comp], axis=2)
            if as_list:
                return [bits.reshape(S, -1)], [lens.reshape(S, -1)]
            return bits.reshape(S, -1), lens.reshape(S, -1)
    return fn


def token_slots(geo: Geometry) -> int:
    """Tokens per segment row (T)."""
    if geo.interleaved:
        return geo.segment_mcu_count * geo.blocks_per_mcu * 64
    return geo.components[0].segment_mcu_count * 64


@dataclasses.dataclass(frozen=True)
class Caps:
    """Sticky per-geometry capacities: merge-tree words per level + the
    max per-row stuffed-zero count handled by the roll-chain stuffer."""

    pack: Tuple[int, ...]
    z_cap: int = 8

    @property
    def row_words(self) -> int:
        return self.pack[-1]

    @property
    def n_needs(self) -> int:
        return len(self.pack) + 1


@dataclasses.dataclass(frozen=True)
class FusedCaps:
    """Sticky capacities for the fused Pallas entropy kernel
    (ops/fusedpack): l0 = density knob (32/2^l0 bits-per-token ceiling
    for every 2^l-token group), z_cap = stuffed zeros per row, w_out =
    output words per row including stuffing slack."""

    l0: int
    z_cap: int
    w_out: int
    n_levels: int   # l0 + D: total merge levels for this geometry's T

    @property
    def n_needs(self) -> int:
        return self.n_levels + 2


@dataclasses.dataclass(frozen=True)
class MegaCaps:
    """Sticky capacities for the tokenizing entropy megakernel
    (ops/fusedpack.entropy_fused): the merge tree starts from one leaf
    per coefficient slot (capacity = worst case, so token-density
    overflows are impossible); `compact` lists levels after which buffer
    capacity halves (density-adaptive, derived from realized needs —
    needs are exact regardless of schedule since bit-lengths are pure
    arithmetic)."""

    z_cap: int
    w_out: int
    compact: Tuple[int, ...]
    n_levels: int    # D = log2(padded coefficient slots per row)

    @property
    def n_needs(self) -> int:
        return self.n_levels + 2


def mega_geometry(geo: Geometry) -> Tuple[int, int]:
    """(C2, D): padded coefficient slots per segment row and tree depth."""
    from ..ops import fusedpack

    C2 = fusedpack.pow2_ge(max(token_slots(geo), 64))
    return C2, C2.bit_length() - 1


def derive_mega_schedule(needs, C2: int, w_words: int,
                         margin: float = 1.25) -> Tuple[int, ...]:
    """Most aggressive legal compaction schedule for the realized
    per-level maxima: compact after level d (k prior compactions) iff the
    content fits half the current span with margin, and the final
    capacity stays >= the realized row size."""
    D = C2.bit_length() - 1
    sched = []
    k = 0
    for d in range(1, D + 1):
        if (C2 >> (k + 1)) < w_words:
            break
        if int(needs[d - 1]) * margin <= float(32 << (d - k - 1)):
            sched.append(d)
            k += 1
    return tuple(sched)


def initial_mega_caps(geo: Geometry,
                      bits_per_token: float = 6.0) -> MegaCaps:
    C2, D = mega_geometry(geo)
    T = token_slots(geo)
    z_cap = 16
    w_est = -(-int(T * max(bits_per_token + 3.0, 9.0)) // 32)
    # conservative start (pairs-fit density, like the fused path's l0=1);
    # the first legal frame's needs derive a tighter schedule
    sched = (1,) if D >= 1 else ()
    w_out = min(C2 >> len(sched), w_est) + (z_cap + 2 + 3) // 4 + 1
    return MegaCaps(z_cap=z_cap, w_out=w_out, compact=sched, n_levels=D)


def mega_caps_ok(geo: Geometry, caps: MegaCaps, needs: np.ndarray) -> bool:
    C2, D = mega_geometry(geo)
    k = 0
    for d in sorted(caps.compact):
        if int(needs[d - 1]) > 32 << (d - k - 1):
            return False
        k += 1
    if int(needs[D - 1]) > 32 * (C2 >> k):
        return False
    return (int(needs[-2]) <= caps.z_cap
            and int(needs[-1]) <= 4 * caps.w_out)


def grown_mega_caps(geo: Geometry, caps: MegaCaps,
                    needs: np.ndarray) -> MegaCaps:
    """Re-derive schedule + grow z/w caps from realized needs.  Level
    needs are exact even on overflowing runs (bit-lengths are arithmetic,
    never storage-dependent), so the schedule converges in one step;
    z/bytes needs may take another iteration if words were garbage."""
    C2, D = mega_geometry(geo)
    z_cap = max(caps.z_cap, int(needs[-2]) + 4)
    w_need = -(-int(needs[-1]) // 4) + 2
    w_words = max(-(-int(needs[D - 1]) // 32), w_need)
    sched = derive_mega_schedule(needs[:D], C2, w_words)
    w_out = max(caps.w_out, min(int(w_need * 1.15),
                                (C2 >> len(sched))
                                + (z_cap + 2 + 3) // 4 + 1))
    w_out = max(w_out, w_need)
    return MegaCaps(z_cap=z_cap, w_out=w_out, compact=sched, n_levels=D)


def mega_supported(geo: Geometry) -> bool:
    """The megakernel handles non-interleaved scans with <= 2 table
    classes, uniform restart geometry, and the tuned (computable) code
    family; everything else uses the pairs tokenizer + deep kernel."""
    return (not geo.interleaved
            and getattr(geo.param, "huffman_tables", "tuned") == "tuned"
            and all(c.table_index <= 1 for c in geo.components)
            and len({c.segment_mcu_count for c in geo.components}) == 1)


def mega_mode() -> bool:
    import os

    return os.environ.get("GPUJPEG_TPU_MEGA", "1") != "0"


def mega_lane_bounds(geo: Geometry) -> np.ndarray:
    """Per-scan segment-row bounds with every component's row count
    padded up to a 128-lane multiple.  The concat of per-component
    coefficient columns then lands every dynamic-update-slice on a tile
    boundary — misaligned lane offsets made XLA take a straddled-tile
    slow path worth ~9 ms at 8K.  Padding rows have valid=0 and emit 0
    bytes, so assembly just skips them."""
    bounds = [0]
    for c in geo.components:
        bounds.append(bounds[-1] + (-(-c.segment_count // 128) * 128))
    return np.asarray(bounds, np.int64)


def mega_rst_marker(geo: Geometry) -> np.ndarray:
    """geo.rst_marker re-laid into the lane-padded row space."""
    lb = mega_lane_bounds(geo)
    real = np.diff(geo.scan_seg_bounds)
    out = np.zeros(int(lb[-1]), geo.rst_marker.dtype)
    for k in range(len(real)):
        b0 = int(geo.scan_seg_bounds[k])
        out[int(lb[k]):int(lb[k]) + int(real[k])] = \
            geo.rst_marker[b0:b0 + int(real[k])]
    return out


def make_rows_coefs_impl(geo: Geometry, pre=None):
    """raw -> (coefs_t (C0, R) int16, valid_t (B, R) i32, luma_t (1, R)
    i32): TRANSPOSED per-segment-row coefficient planes for the entropy
    megakernel (non-interleaved scans; sublanes = blocks-in-stream-order
    x zig-zag, lanes = segment rows across all scans; every component's
    lane range padded to a 128-lane multiple — see mega_lane_bounds)."""
    assert not geo.interleaved
    quality = geo.param.quality
    qtabs = [tables.quant_table_zz(True, quality),
             tables.quant_table_zz(False, quality)]
    valids, lumas = [], []
    for c in geo.components:
        rst = c.segment_mcu_count
        S = c.segment_count
        Sp = -(-S // 128) * 128
        vm = np.zeros((rst, Sp), np.int32)
        vm[:, :S] = (np.arange(S * rst).reshape(S, rst)
                     < c.mcu_count).T
        valids.append(vm)
        lu = np.zeros((1, Sp), np.int32)
        lu[:, :S] = 1 if c.table_index == 0 else 0
        lumas.append(lu)
    valid_t = np.concatenate(valids, axis=1)
    luma_t = np.concatenate(lumas, axis=1)

    def fn(raw):
        raw = apply_pre_transform(raw, pre)
        planes = sample.preprocess(raw, geo, geo.param_image)
        cols = []
        for c in geo.components:
            rst = c.segment_mcu_count
            S = c.segment_count
            Sp = -(-S // 128) * 128
            bpr = c.data_width // 8
            if bpr % rst == 0 and S * rst == c.mcu_count:
                # block-diagonal DCT emits (rst*64, S) directly — no
                # post-matmul regroup at all
                col = dct.fdct_quantize_bd(
                    planes[c.index], qtabs[c.table_index], rst)
            else:
                # general case (segments wrap block rows): transposed
                # DCT (64, nblocks), then a leading-dims-only regroup
                blocks_t = dct.fdct_quantize_t(planes[c.index],
                                               qtabs[c.table_index])
                padB = S * rst - c.mcu_count
                if padB:
                    blocks_t = jnp.pad(blocks_t, ((0, 0), (0, padB)))
                col = blocks_t.reshape(64, S, rst) \
                    .transpose(2, 0, 1).reshape(rst * 64, S)
            if Sp != S:
                col = jnp.pad(col, ((0, 0), (0, Sp - S)))
            cols.append(col)
        return jnp.concatenate(cols, axis=1), valid_t, luma_t

    return fn


def make_rows_xbd_impl(geo: Geometry, pre=None):
    """raw -> list of per-component (C0/4, Sp) uint32 PACKED block-diagonal
    sample patches for the DCT-fused entropy megakernel (entropy_fused_u8),
    plus static per-component metadata.

    Samples are packed 4-per-word (sample b*64+r*8+c = byte c%4 of word
    b*16+r*2+c//4) BEFORE the block-diagonal transpose: the pack is
    elementwise (it fuses into the preprocessor) and the relayout then
    moves 4x fewer elements — XLA's u8 transpose cost is per-ELEMENT
    shuffle-bound, so this cut the 8K xbd feed from ~14 ms to ~1/4 of
    that.  The kernel unpacks in VMEM (sublane repeat + shift).

    Returns (fn, infos): fn(raw) -> [xbd32_c ...]; infos[c] = dict with
    valid (B, S) i32, luma (bool), rst (S,) marker array, S real rows,
    dct_key.  Lane counts are EXACT per component — the entropy kernel
    masks its ragged last tile in-kernel (an XLA lane pad cost ~2.3 ms
    at 8K)."""
    assert not geo.interleaved
    use_bf16 = dct._use_split_bf16()
    quality = geo.param.quality
    infos = []
    for k, c in enumerate(geo.components):
        rstn = c.segment_mcu_count
        S = c.segment_count
        b0 = int(geo.scan_seg_bounds[k])
        vm = (np.arange(S * rstn).reshape(S, rstn)
              < c.mcu_count).T.astype(np.int32)
        bpr = c.data_width // 8
        # xq layout eligibility: segments tile block rows exactly AND a
        # segment row is exactly 128 packed words (rst == 8) — then the
        # feed is the 16-word-contiguous (S, 128) relayout (2.2x cheaper
        # than the xbd transpose; the kernel transposes in VMEM)
        xq = (bpr % rstn == 0 and S * rstn == c.mcu_count
              and rstn * 16 == 128)
        infos.append(dict(
            valid=vm, luma=(c.table_index == 0),
            rst=np.asarray(geo.rst_marker[b0:b0 + S]), S=S, xq=xq,
            dct_key=(quality, c.table_index == 0, rstn, use_bf16)))

    def pack_lanes(p):
        # (H, W) u8 -> (H, W/4) u32, word = 4 horizontal samples.  The
        # byte order is little-endian on TPU and CPU alike, matching the
        # kernel's (w >> 8k) & 255 unpack; bitcast of the contiguous
        # minor dim is a layout NO-OP (the arithmetic shift/or
        # formulation cost ~3.4 ms at 8K from strided u8 reads)
        return jax.lax.bitcast_convert_type(
            p.reshape(p.shape[0], -1, 4), jnp.uint32)

    def pack_subs(x):
        # (C0, S) u8 -> (C0/4, S) u32, word = 4 consecutive sublanes:
        # bitcast packs the contiguous minor dim, so transpose first
        # ((S, C0/4, 4) is the same data minor-major), bitcast, and
        # transpose back — rare fallback path, perf uncritical
        b = jax.lax.bitcast_convert_type(
            x.T.reshape(x.shape[1], -1, 4), jnp.uint32)
        return b.transpose(1, 0)

    interp = fused_mode() == "interpret"

    def fn(raw):
        from ..ops import prepost_kernel

        raw = apply_pre_transform(raw, pre)
        # fast path: Pallas preprocessor emits packed-u32 planes directly
        # (XLA's interleaved-channel reads cost ~4.5 ms at 8K; the kernel
        # does transpose + byte math + bitcast packing in VMEM)
        packed = prepost_kernel.preprocess_packed(
            raw, geo, geo.param_image, interpret=interp) \
            if raw.ndim == 3 else None
        planes = None if packed is not None \
            else sample.preprocess(raw, geo, geo.param_image)
        out = []
        for c, info in zip(geo.components, infos):
            rstn = c.segment_mcu_count
            S = c.segment_count
            bpr = c.data_width // 8
            if info["xq"]:
                # 16-word-contiguous relayout: each (row, segment) run of
                # 16 packed words moves as one 64 B chunk (the per-2-word
                # xbd transpose cost 0.68 ms/comp at 8K, this is 0.30)
                nbh, nsr = c.data_height // 8, bpr // rstn
                p32 = (packed[c.index] if packed is not None
                       else pack_lanes(planes[c.index]))
                x = p32.reshape(nbh, 8, nsr, 16) \
                    .transpose(0, 2, 1, 3).reshape(nbh * nsr, 128)
            elif bpr % rstn == 0 and S * rstn == c.mcu_count:
                nbh, nsr = c.data_height // 8, bpr // rstn
                p32 = (packed[c.index] if packed is not None
                       else pack_lanes(planes[c.index]))
                x = p32.reshape(nbh, 8, nsr, rstn, 2)
                x = x.transpose(3, 1, 4, 0, 2).reshape(rstn * 16,
                                                       nbh * nsr)
            else:
                if planes is None:
                    planes = sample.preprocess(raw, geo, geo.param_image)
                xt = dct.plane_to_blocks_t(planes[c.index])  # (64, nblk)
                padB = S * rstn - c.mcu_count
                if padB:
                    xt = jnp.pad(xt, ((0, 0), (0, padB)))
                x = xt.reshape(64, S, rstn).transpose(2, 0, 1) \
                    .reshape(rstn * 64, S)
                x = pack_subs(x)
            out.append(x)
        return out

    return fn, infos


def mega_il_supported(geo: Geometry) -> bool:
    """Interleaved megakernel eligibility: one scan, all components at
    1x1 sampling (MCU raster == block raster, so the per-component
    packed-plane relayout of the non-interleaved feed applies
    unchanged), tuned tables, <= 2 table classes, segments tiling MCU
    rows exactly."""
    if not geo.interleaved:
        return False
    if getattr(geo.param, "huffman_tables", "tuned") != "tuned":
        return False
    if any(c.samp_h != geo.max_h or c.samp_v != geo.max_v
           for c in geo.components):
        return False
    if any(c.table_index > 1 for c in geo.components):
        return False
    rst = geo.segment_mcu_count
    S = geo.segment_count
    if S * rst != -(-geo.mcu_count // rst) * rst:
        return False
    for c in geo.components:
        bpr = c.data_width // 8
        if bpr % rst or S * rst != c.mcu_count:
            return False
    return True


def make_rows_xbd_il_impl(geo: Geometry, pre=None):
    """Interleaved feed for the entropy megakernel: ONE (C0/4, S) packed
    u32 array whose sublane order interleaves components at MCU
    granularity — sublane (m*bpm + slot)*16 + (r*2 + h) holds word h of
    row r of MCU m's slot-th block (the device block list of
    gpujpeg_common.c:1031-1088 as layout math, interleaved flavor).

    Returns (fn, info): info carries valid (B0, S) i32, the per-slot
    dc/ac/quant class patterns, rst markers, and the dct key."""
    assert mega_il_supported(geo)
    rst = geo.segment_mcu_count
    S = geo.segment_count
    bpm = geo.blocks_per_mcu
    use_bf16 = dct._use_split_bf16()
    vm = (np.arange(S * rst).reshape(S, rst) < geo.mcu_count)
    valid = np.repeat(vm[:, :, None], bpm, axis=2) \
        .reshape(S, rst * bpm).T.astype(np.int32)
    q_pat = tuple(int(c.table_index) for c in geo.components)
    dc_pat = tuple(c.table_index == 0 for c in geo.components)
    ac_pat = dc_pat
    info = dict(valid=valid, q_pat=q_pat, dc_pat=dc_pat, ac_pat=ac_pat,
                rst=np.asarray(geo.rst_marker), S=S,
                quality=geo.param.quality, use_bf16=use_bf16)
    interp = fused_mode() == "interpret"

    def pack_lanes(p):
        return jax.lax.bitcast_convert_type(
            p.reshape(p.shape[0], -1, 4), jnp.uint32)

    def fn(raw):
        from ..ops import prepost_kernel

        raw = apply_pre_transform(raw, pre)
        packed = prepost_kernel.preprocess_packed(
            raw, geo, geo.param_image, interpret=interp) \
            if raw.ndim == 3 else None
        planes = None if packed is not None \
            else sample.preprocess(raw, geo, geo.param_image)
        per_comp = []
        for c in geo.components:
            bpr = c.data_width // 8
            nbh, nsr = c.data_height // 8, bpr // rst
            p32 = (packed[c.index] if packed is not None
                   else pack_lanes(planes[c.index]))
            x = p32.reshape(nbh, 8, nsr, rst, 2) \
                .transpose(3, 1, 4, 0, 2).reshape(rst, 16, nbh * nsr)
            per_comp.append(x)
        # interleave components at MCU granularity on the sublane axis
        return jnp.stack(per_comp, axis=1).reshape(rst * bpm * 16, S)

    return fn, info


def initial_fused_caps(geo: Geometry,
                       bits_per_token: float = 6.0) -> FusedCaps:
    from ..ops import fusedpack

    T = token_slots(geo)
    T2 = fusedpack.pow2_ge(T)
    levels = T2.bit_length() - 1
    l0 = 1 if geo.param.quality <= 95 else 0
    l0 = min(l0, levels)
    z_cap = 16
    w_est = -(-int(T * max(bits_per_token + 3.0, 9.0)) // 32)
    w_out = min(T2 >> l0, w_est) + (z_cap + 2 + 3) // 4 + 1
    return FusedCaps(l0=l0, z_cap=z_cap, w_out=w_out, n_levels=levels)


def grown_fused_caps(geo: Geometry, caps: FusedCaps,
                     needs: np.ndarray) -> FusedCaps:
    """Shrink l0 / grow z_cap, w_out so the realized needs fit."""
    from ..ops import fusedpack

    T2 = fusedpack.pow2_ge(token_slots(geo))
    levels = caps.n_levels
    l0 = caps.l0
    for lvl in range(1, levels + 1):
        g = int(needs[lvl - 1])          # max merged bits of 2^lvl tokens
        if g <= 32:
            continue
        # need 32*2^(lvl-l0') >= g  =>  l0' <= lvl - ceil(log2(g/32))
        import math
        l0 = min(l0, lvl - math.ceil(math.log2(g / 32.0)))
    l0 = max(0, l0)
    z_cap = max(caps.z_cap, int(needs[-2]) + 4)
    w_need = -(-int(needs[-1]) // 4) + 2
    w_out = max(caps.w_out, min(int(w_need * 1.15),
                                (T2 >> l0) + (z_cap + 2 + 3) // 4 + 1))
    w_out = max(w_out, w_need)
    return FusedCaps(l0=l0, z_cap=z_cap, w_out=w_out, n_levels=levels)


def initial_caps(geo: Geometry, bits_per_token: float = 6.0) -> Caps:
    """Content-independent initial guess (~Q75 photographic density);
    overflow-driven growth replaces it with measured needs."""
    T = token_slots(geo)
    worst = bitmerge.worst_caps(T, 27)
    pack = tuple(
        min(w, max(1, -(-int((1 << (lv + 1)) * bits_per_token) // 32)))
        for lv, w in enumerate(worst))
    return Caps(pack=pack, z_cap=max(16, pack[-1] // 32))


def grown_caps(geo: Geometry, caps: Caps, need_pack: np.ndarray,
               need_z: int, headroom: float = 1.3) -> Caps:
    """Grow any level whose realized need exceeded its capacity."""
    T = token_slots(geo)
    worst = bitmerge.worst_caps(T, 27)
    pack = tuple(
        min(worst[i], max(caps.pack[i],
                          -(-int(need_pack[i] * headroom) // 32)))
        for i in range(len(caps.pack)))
    z_cap = max(caps.z_cap, int(need_z * headroom) + 2)
    return Caps(pack=pack, z_cap=z_cap)


def _log_allocation(geo: Geometry, caps) -> None:
    """Allocation report at INFO (the reference's VERBOSE allocation
    summary, gpujpeg_common.c:874-897): per-component geometry and the
    device buffer sizes the compiled pipeline will hold."""
    import logging

    log = logging.getLogger("gpujpeg_tpu")
    if not log.isEnabledFor(logging.INFO):
        return
    pi = geo.param_image
    raw = pi.height * pi.width * geo.comp_count
    planes = sum(c.data_height * c.data_width for c in geo.components)
    w_out = getattr(caps, "w_out", None)
    if w_out is None:
        pack = getattr(caps, "pack", ())
        w_out = pack[-1] if pack else 0
    rows = geo.segment_count * int(w_out) * 4
    log.info(
        "allocation %dx%d: raw %.1f MB, packed planes %.1f MB, "
        "entropy rows %.1f MB (%d segments x %d words), caps=%s",
        pi.width, pi.height, raw / 1e6, planes / 1e6, rows / 1e6,
        geo.segment_count, int(w_out), caps)
    for c in geo.components:
        log.info("  comp %d: %dx%d data %dx%d, %d segments x %d MCUs",
                 c.index, c.width, c.height, c.data_width, c.data_height,
                 c.segment_count, c.segment_mcu_count)


def tightened_mega_caps(geo: Geometry, caps, needs):
    """One-time shrink-to-fit for MegaCaps after a legal frame: the exact
    level maxima may admit a deeper compaction schedule, and the initial
    worst-case-ish w_out is usually far above the realized row size
    (every extra word costs HBM on the rows transpose + host fetch, and
    shallow schedules cost merge-tree time — measured 16.1 vs 12.1 ms at
    8K between compact=(1,) w_out=150 and compact=(1,3,5,6) w_out=26).
    Returns new caps, or None if no tightening applies.  x1.3 content
    margin, x1.6 hysteresis; the growth protocol still covers denser
    future frames."""
    if not isinstance(caps, MegaCaps):
        return None
    w_need = -(-int(needs[-1]) // 4) + 2
    C2, D = mega_geometry(geo)
    best = derive_mega_schedule(needs[:D], C2, w_need)
    w_fit = max(-(-int(needs[D - 1]) // 32), w_need)
    w_tgt = int(w_fit * 1.3) + (caps.z_cap + 2 + 3) // 4 + 1
    shrink = caps.w_out > int(w_tgt * 1.6)
    if len(best) > len(caps.compact) or shrink:
        return dataclasses.replace(
            caps,
            compact=(best if len(best) > len(caps.compact)
                     else caps.compact),
            w_out=min(caps.w_out, w_tgt))
    return None


def grown_caps_for(geo: Geometry, caps, needs):
    """Grow any caps flavor so the realized needs fit — the shared
    overflow step of the convergence loop (encode_to_device) and the
    mesh BatchEncoder's growth protocol."""
    if isinstance(caps, MegaCaps):
        if int(needs[-2]) > 250:
            return initial_caps(geo)
        return grown_mega_caps(geo, caps, needs)
    if isinstance(caps, FusedCaps):
        if int(needs[-2]) > 250:
            return initial_caps(geo)
        return grown_fused_caps(geo, caps, needs)
    return grown_caps(geo, caps, needs[:-1], int(needs[-1]))


def fused_mode() -> str:
    """Fused Pallas entropy kernel (ops/fusedpack) mode:
    'on' (default on TPU), 'off' (XLA merge tree; default on CPU), or
    'interpret' (Pallas interpreter — tests only; very slow).
    Override with GPUJPEG_TPU_FUSED=0/1/interpret."""
    import os

    v = os.environ.get("GPUJPEG_TPU_FUSED", "")
    if v == "0":
        return "off"
    if v == "interpret":
        return "interpret"
    if v == "1":
        return "on"
    try:
        return "on" if jax.default_backend() not in ("cpu",) else "off"
    except Exception:
        return "off"


def make_full_encode_fn(geo: Geometry, caps: Caps, pre=None):
    """The complete device-side encode as ONE jittable program.

    Returns fn(raw) -> dict:
      rows:      (nseg, K) uint32 stuffed per-segment streams (RST markers
                 appended to non-scan-final segments)
      row_bytes: (nseg,) int32 bytes used per row
      meta:      int32 vector [pack needs..., stuff needs..., total_bytes]
                 — one small fetch per frame covers overflow detection;
                 host assembly derives per-scan offsets from row_bytes
    """
    mega = isinstance(caps, MegaCaps)
    fused = isinstance(caps, FusedCaps)
    pairs = bool(fused and caps.l0 == 1)
    if mega and geo.interleaved:
        from ..ops import fusedpack

        interp = fused_mode() == "interpret"
        xbd_il, il_info = make_rows_xbd_il_impl(geo, pre)
        consts = tables.entropy_kernel_consts(geo.param.quality)

        def fn(raw):
            # ONE megakernel call covers the whole interleaved scan
            # (per-slot class/quant patterns are static sublane masks)
            xbd = xbd_il(raw)
            r, ob, nd = fusedpack.entropy_fused_u8_il(
                xbd, jnp.asarray(il_info["valid"]), il_info["rst"],
                z_cap=caps.z_cap, w_out=caps.w_out, consts=consts,
                quality=il_info["quality"], q_pat=il_info["q_pat"],
                dc_pat=il_info["dc_pat"], ac_pat=il_info["ac_pat"],
                use_bf16=il_info["use_bf16"], interpret=interp,
                compact_after=caps.compact)
            meta = jnp.concatenate([nd, jnp.sum(ob)[None]]) \
                .astype(jnp.int32)
            return {"rows": (r,), "row_bytes": ob, "meta": meta}

        fn._n_needs = caps.n_needs
        return fn
    if mega:
        from ..ops import fusedpack

        interp = fused_mode() == "interpret"
        xbd_impl, xbd_infos = make_rows_xbd_impl(geo, pre)
        consts = tables.entropy_kernel_consts(geo.param.quality)
    else:
        tokens_impl = make_rows_tokens_impl(geo, pre, pairs=pairs)
    if fused:
        from ..ops import fusedpack

        interp = fused_mode() == "interpret"

    def fn(raw):
        if mega:
            # one DCT-fused kernel call per component (128-lane-padded
            # bounds make every tile single-component); the coefficient
            # plane never exists in HBM, and per-scan row buffers go
            # straight to assembly without a cross-component concat
            xbds = xbd_impl(raw)
            rows_l, ob_l, needs_l = [], [], []
            for xbd, info in zip(xbds, xbd_infos):
                luma_t = np.full((1, info["S"]),
                                 1 if info["luma"] else 0, np.int32)
                r, ob, nd = fusedpack.entropy_fused_u8(
                    xbd, jnp.asarray(info["valid"]),
                    jnp.asarray(luma_t), info["rst"],
                    z_cap=caps.z_cap, w_out=caps.w_out, consts=consts,
                    dct_key=info["dct_key"], interpret=interp,
                    compact_after=caps.compact,
                    xq=info.get("xq", False))
                rows_l.append(r)
                ob_l.append(ob)
                needs_l.append(nd)
            out_bytes = jnp.concatenate(ob_l)
            needs = functools.reduce(jnp.maximum, needs_l)
            meta = jnp.concatenate([
                needs, jnp.sum(out_bytes)[None],
            ]).astype(jnp.int32)
            return {"rows": tuple(rows_l), "row_bytes": out_bytes,
                    "meta": meta}
        bits, lens = tokens_impl(raw)
        if fused:
            if pairs:
                rows, out_bytes, needs = fusedpack.pack_stuff_fused_pre(
                    bits, lens, geo.rst_marker, z_cap=caps.z_cap,
                    w_out=caps.w_out, interpret=interp)
            else:
                rows, out_bytes, needs = fusedpack.pack_stuff_fused(
                    bits, lens, geo.rst_marker, l0=caps.l0,
                    z_cap=caps.z_cap, w_out=caps.w_out, interpret=interp)
        else:
            words, row_bits, need1 = bitmerge.pack_rows_merge(
                bits, lens, caps=caps.pack)
            seg_bytes = (row_bits + 7) >> 3
            padded = bitmerge.or_pad_bits(words, row_bits)
            rows, out_bytes, max_z = bitmerge.stuff_rows_roll(
                padded, seg_bytes, geo.rst_marker, z_cap=caps.z_cap)
            needs = jnp.concatenate([need1, max_z[None]])
        meta = jnp.concatenate([
            needs, jnp.sum(out_bytes)[None],
        ]).astype(jnp.int32)
        return {"rows": rows, "row_bytes": out_bytes, "meta": meta}

    fn._n_needs = caps.n_needs
    return fn


def make_phase_fn(geo: Geometry, caps, pre=None, phase: str = "pre"):
    """Truncated device programs for per-phase perf stats (the TPU
    analogue of the reference's per-kernel CUDA event pairs,
    gpujpeg_common.c:2169-2254): phase='pre' runs the preprocessor (+
    feed relayout on the mega path), 'dct' additionally runs forward
    DCT+quantization (the megakernel's stop_after='dct' stub).  The
    encoder times these as separate dispatches when perf_stats is on and
    reports the deltas as phase durations."""
    mega = isinstance(caps, MegaCaps)
    if mega and geo.interleaved:
        from ..ops import fusedpack

        interp = fused_mode() == "interpret"
        xbd_il, il_info = make_rows_xbd_il_impl(geo, pre)
        consts = tables.entropy_kernel_consts(geo.param.quality)

        def fn(raw):
            xbd = xbd_il(raw)
            if phase == "pre":
                return xbd
            _r, ob, _nd = fusedpack.entropy_fused_u8_il(
                xbd, jnp.asarray(il_info["valid"]), il_info["rst"],
                z_cap=caps.z_cap, w_out=caps.w_out, consts=consts,
                quality=il_info["quality"], q_pat=il_info["q_pat"],
                dc_pat=il_info["dc_pat"], ac_pat=il_info["ac_pat"],
                use_bf16=il_info["use_bf16"], interpret=interp,
                compact_after=caps.compact, stop_after="dct")
            return ob

        return fn
    if mega:
        from ..ops import fusedpack

        interp = fused_mode() == "interpret"
        xbd_impl, xbd_infos = make_rows_xbd_impl(geo, pre)
        consts = tables.entropy_kernel_consts(geo.param.quality)

        def fn(raw):
            xbds = xbd_impl(raw)
            if phase == "pre":
                return xbds
            outs = []
            for xbd, info in zip(xbds, xbd_infos):
                luma_t = np.full((1, info["S"]),
                                 1 if info["luma"] else 0, np.int32)
                r, ob, nd = fusedpack.entropy_fused_u8(
                    xbd, jnp.asarray(info["valid"]),
                    jnp.asarray(luma_t), info["rst"],
                    z_cap=caps.z_cap, w_out=caps.w_out, consts=consts,
                    dct_key=info["dct_key"], interpret=interp,
                    compact_after=caps.compact,
                    xq=info.get("xq", False), stop_after="dct")
                outs.append(ob)
            return outs

        return fn

    quality = geo.param.quality
    qtabs = [tables.quant_table_zz(True, quality),
             tables.quant_table_zz(False, quality)]

    def fn(raw):
        raw2 = apply_pre_transform(raw, pre)
        planes = sample.preprocess(raw2, geo, geo.param_image)
        if phase == "pre":
            return planes
        return [dct.fdct_quantize(planes[c.index], qtabs[c.table_index])
                for c in geo.components]

    return fn


def caps_ok_for(geo: Geometry, caps, needs) -> bool:
    """True when a run's realized needs fit the capacities (any caps
    flavor) — the single validation used by encode_to_device's
    convergence loop and encode_pipelined's deferred check."""
    if isinstance(caps, MegaCaps):
        return mega_caps_ok(geo, caps, needs)
    if isinstance(caps, FusedCaps):
        from ..ops import fusedpack

        return fusedpack.needs_ok(needs, caps.l0, caps.z_cap, caps.w_out)
    need1, need_z = needs[:-1], int(needs[-1])
    return (all(int(need1[i]) <= caps.pack[i] * 32
                for i in range(len(caps.pack)))
            and need_z <= caps.z_cap)


def _initial_caps_for(geo: Geometry):
    mode = fused_mode()
    if mode == "off":
        return initial_caps(geo)
    if mega_mode() and (mega_supported(geo) or mega_il_supported(geo)):
        return initial_mega_caps(geo)
    return initial_fused_caps(geo)


class Encoder:
    """Persistent encoder session (create once, encode many frames)."""

    def __init__(self) -> None:
        self._fns: Dict[Tuple, object] = {}
        self._caps: Dict[Geometry, Caps] = {}
        self.stats = DurationStats()
        self.aggregate = AggregateStats()
        self._frames = 0
        self.segment_info = False
        #: opt-in per-phase stats (reference: param.perf_stats) — adds
        #: two truncated-program dispatches per frame, see _measure_phases
        self.perf_stats = False
        self.flipped = False
        self.channel_remap: Optional[str] = None
        self.header_type_override = None
        self.exif_tags: List[str] = []
        self.orientation = None

    # -- options (gpujpeg_encoder_set_option, gpujpeg_encoder.c:736-795) -----
    def set_option(self, key: str, value: str) -> None:
        """Stringly options, reference-compatible keys
        (libgpujpeg/gpujpeg_encoder.h:211-242)."""
        from ..types import HeaderType, Orientation

        if key in ("enc_opt_out", "enc_out_pinned"):
            # pinned host buffers have no TPU analogue; accepted for
            # compatibility (device arrays are the zero-copy path)
            return
        if key == "enc_hdr":
            m = {"JFIF": HeaderType.JFIF, "Exif": HeaderType.EXIF,
                 "Adobe": HeaderType.ADOBE, "SPIFF": HeaderType.SPIFF}
            if value not in m:
                raise ValueError(f"unknown header type {value!r}")
            self.header_type_override = m[value]
            return
        if key == "enc_opt_flipped":
            self.flipped = value == "true"
            return
        if key == "enc_opt_channel_remap":
            if not all(c in "0123FfZz" for c in value) or not value:
                raise ValueError(f"bad channel remap {value!r}")
            self.channel_remap = value
            return
        if key == "enc_exif_tag":
            self.header_type_override = HeaderType.EXIF
            self.exif_tags.append(value)
            return
        if key == "enc_metadata":
            if value.startswith("orientation="):
                # "orientation=<rot>[,flip]"
                parts = value.split("=", 1)[1].split(",")
                self.orientation = Orientation(
                    rotation=int(parts[0]) & 3,
                    flip=len(parts) > 1 and parts[1] == "flip")
                return
            raise ValueError(f"unknown metadata {value!r}")
        raise ValueError(f"invalid encoder option {key!r}")

    @staticmethod
    def print_options() -> str:
        """gpujpeg_encoder_print_options equivalent."""
        return (
            "\tenc_opt_out=[enc_out_val_pageable|enc_out_val_pinned] - "
            "accepted for compatibility (no TPU analogue)\n"
            "\tenc_hdr=[JFIF|Adobe|Exif|SPIFF] - output JPEG header\n"
            "\tenc_opt_flipped=[false|true] - vertically flip input\n"
            "\tenc_opt_channel_remap=XYZ[W] - input channel mapping, eg. "
            "'210F' for GBRX; 'F'/'Z' = all-ones/all-zeros\n"
            "\tenc_exif_tag=<key>:TYPE=<value> - custom EXIF tag\n"
            "\tenc_metadata=orientation=<rot>[,flip] - image metadata\n")

    def _pre(self):
        if not self.flipped and not self.channel_remap:
            return None
        return (self.flipped, self.channel_remap)

    def _get_fn(self, geo: Geometry, caps):
        pre = self._pre()
        key = (geo, caps, pre)
        fn = self._fns.get(key)
        if fn is None:
            inner = make_full_encode_fn(geo, caps, pre)
            fn = jax.jit(inner)
            fn._n_needs = inner._n_needs
            self._fns[key] = fn
        return fn

    # -- pre-allocation / compile-ahead (gpujpeg_encoder_allocate,
    # src/gpujpeg_encoder.c:258-288; planners gpujpeg_encoder.h:132-146) --
    def allocate(self, param: Parameters,
                 param_image: ImageParameters) -> None:
        """Compile the full device pipeline for (param, param_image) ahead
        of the first frame — the TPU analogue of the reference's
        pre-allocation: instead of cudaMalloc'ing worst-case buffers it
        traces + compiles the jit program and sizes the sticky capacities,
        so frame 1 runs at steady-state speed (modulo one possible
        capacity regrow on unusually dense content).  Uses a zeros frame
        on device; the result is discarded."""
        param = adjust_params(param or Parameters(), param_image)
        geo = get_geometry(param, param_image)
        caps = self._caps.get(geo)
        if caps is None:
            caps = _initial_caps_for(geo)
            self._caps[geo] = caps
        fn = self._get_fn(geo, caps)
        pf, h, w = param_image.pixel_format, param_image.height, \
            param_image.width
        if pf == PixelFormat.U8:
            shape = (h, w)
        elif pf == PixelFormat.P444_U8_P012:
            shape = (h, w, 3)
        elif pf == PixelFormat.P4444_U8_P0123:
            shape = (h, w, 4)
        else:
            from ..types import image_size_bytes

            shape = (image_size_bytes(w, h, pf),)
        res = fn(jnp.zeros(shape, jnp.uint8))
        jax.block_until_ready(res["meta"])

    @staticmethod
    def estimate_memory(param: Parameters,
                        param_image: ImageParameters) -> int:
        """Approximate peak device bytes for one frame's encode pipeline
        (raw + planes + int16 coefficients + token arrays + pack/stuff
        buffers).  Counterpart of the reference's ~20 B/pixel/component
        rule of thumb (FAQ.md:169-173); the token arrays make the TPU
        pipeline hungrier: ~16 B/pixel/component."""
        param = adjust_params(param or Parameters(), param_image)
        npix = param_image.width * param_image.height
        return int(npix * 16 * max(1, param.comp_count))

    @staticmethod
    def max_pixels(param: Parameters, memory_bytes: int) -> int:
        """Largest pixel count whose encode fits in memory_bytes
        (gpujpeg_encoder_max_pixels, gpujpeg_encoder.h:132-138)."""
        param = adjust_params(
            param or Parameters(),
            ImageParameters(width=1, height=1,
                            color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.P444_U8_P012))
        return int(memory_bytes // (16 * max(1, param.comp_count)))

    @staticmethod
    def max_memory(param: Parameters, pixels: int) -> int:
        """Device bytes needed to encode `pixels` pixels
        (gpujpeg_encoder_max_memory, gpujpeg_encoder.h:140-146)."""
        param = adjust_params(
            param or Parameters(),
            ImageParameters(width=1, height=1,
                            color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.P444_U8_P012))
        return int(pixels * 16 * max(1, param.comp_count))

    def resolve(self, image, param, param_image):
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
        return get_geometry(param, param_image)

    def encode_to_device(self, image, param: Optional[Parameters] = None,
                         param_image: Optional[ImageParameters] = None,
                         check: bool = True):
        """Device-side encode: returns (geo, result-dict, meta) with the
        stuffed segment rows still on device.  Capacities are sticky per
        geometry and grown on overflow.

        check=False skips the overflow readback (meta is None); use only
        when capacities were already validated for comparable content.
        """
        geo = self.resolve(image, param, param_image)
        caps = self._caps.get(geo)
        if caps is None:
            caps = _initial_caps_for(geo)
            self._caps[geo] = caps
            _log_allocation(geo, caps)
        x = jnp.asarray(image)

        if not check:
            return geo, self._get_fn(geo, caps)(x), None

        self.stats.retries = -1
        for _ in range(6):
            self.stats.retries += 1
            fn = self._get_fn(geo, caps)
            t_disp = time.perf_counter()
            res = fn(x)
            # NOTE: fetching a result before it is ready takes a pathological
            # slow path on some host links — always block first.
            jax.block_until_ready(res["meta"])
            # only the final (successful) dispatch counts as the frame's
            # device time — regrow iterations are recompiles, not steady
            # state (they are counted in stats.retries instead)
            self.stats.duration_in_gpu = \
                (time.perf_counter() - t_disp) * 1000.0
            meta = np.asarray(res["meta"])
            nn = fn._n_needs
            needs = meta[:nn]
            if isinstance(caps, MegaCaps):
                from ..ops import fusedpack

                if caps_ok_for(geo, caps, needs):
                    # one-time shrink-to-fit (see tightened_mega_caps)
                    if not getattr(self, "_mega_tight", {}).get(geo):
                        self._mega_tight = getattr(self, "_mega_tight", {})
                        self._mega_tight[geo] = True
                        tight = tightened_mega_caps(geo, caps, needs)
                        if tight is not None:
                            caps = tight
                            self._caps[geo] = caps
                            continue
                    return geo, res, meta
                if int(needs[-2]) > 250:
                    caps = initial_caps(geo)
                else:
                    caps = grown_mega_caps(geo, caps, needs)
            elif isinstance(caps, FusedCaps):
                if caps_ok_for(geo, caps, needs):
                    return geo, res, meta
                if int(needs[-2]) > 250:
                    # beyond the SWAR stuffing chain's exact range
                    # (fusedpack c_packed clamp): this geometry/content
                    # needs the worst-case XLA merge tree
                    caps = initial_caps(geo)
                else:
                    caps = grown_fused_caps(geo, caps, needs)
            else:
                if caps_ok_for(geo, caps, needs):
                    return geo, res, meta
                caps = grown_caps(geo, caps, needs[:-1], int(needs[-1]))
            self._caps[geo] = caps
        raise RuntimeError("encode capacity did not converge")

    def assemble(self, geo: Geometry, res, meta=None) -> bytes:
        """Host codestream assembly from device rows (headers + per-scan
        row compaction; RST markers and stuffing arrive from the device).

        meta is accepted for API symmetry with encode_to_device but not
        needed: assembly reads row_bytes directly (the per-scan offsets in
        meta exist for device-side consumers)."""
        ns = geo.scan_count
        row_bytes = np.asarray(res["row_bytes"])

        def rowbytes_u8(rows):
            by = np.ascontiguousarray(rows.astype(">u4")).view(np.uint8)
            return by.reshape(rows.shape[0], -1)

        per_scan = isinstance(res["rows"], (tuple, list))
        if not per_scan:
            by_all = rowbytes_u8(np.asarray(res["rows"]))
            padded = by_all.shape[0] > geo.segment_count
        else:
            # per-scan row counts are exact in the ragged-lane layout;
            # older padded layouts carried 128-multiple rows per scan
            padded = (sum(r.shape[0] for r in res["rows"])
                      > geo.segment_count)

        from .. import native

        out = bytearray(jwriter.write_header(
            geo, orientation=self.orientation,
            exif_tags=self.exif_tags or None,
            header_type=self.header_type_override))
        want_seginfo = geo.param.segment_info or self.segment_info
        # padded layouts: padding rows emit 0 bytes, so slicing the real
        # count suffices
        lb = mega_lane_bounds(geo) if padded else geo.scan_seg_bounds
        for k in range(ns):
            b0 = int(lb[k])
            nrow = int(geo.scan_seg_bounds[k + 1]
                       - geo.scan_seg_bounds[k])
            if per_scan:
                by = rowbytes_u8(np.asarray(res["rows"][k]))[:nrow]
                rb = row_bytes[b0:b0 + nrow]
            else:
                by = by_all[b0:b0 + nrow]
                rb = row_bytes[b0:b0 + nrow]
            if want_seginfo and geo.param.restart_interval > 0:
                offs = np.concatenate(
                    [[0], np.cumsum(rb)]).astype(np.int64)
                out += jwriter.write_segment_info_headers(k, offs)
            out += jwriter.write_scan_header(geo, k)
            out += native.assemble_rows(by, rb)
        out += b"\xff\xd9"
        return bytes(out)

    def _host_tokens_fn(self, geo: Geometry):
        pre = self._pre()
        key = ("hosttok", geo, pre)
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(make_rows_tokens_impl(geo, pre, as_list=True))
            self._fns[key] = fn
        return fn

    def _encode_host_entropy(self, image, geo: Geometry, t0: float) -> bytes:
        """restart_interval == 0 path: device preprocess + DCT + tokenize,
        HOST sequential bit-pack.  The reference splits at the same
        boundary (CPU Huffman when restart is disabled,
        gpujpeg_encoder.c:512-534): one segment per scan is inherently
        sequential, so serializing it on device would mean a degenerate
        whole-scan merge tree (minutes of compile, huge buffers); the
        native packer does it in one pass."""
        from .. import native

        fn = self._host_tokens_fn(geo)
        outs = fn(jnp.asarray(image))
        jax.block_until_ready(outs)
        bits_l = [np.asarray(b) for b in outs[0]]
        lens_l = [np.asarray(l) for l in outs[1]]
        t1 = time.perf_counter()
        out = bytearray(jwriter.write_header(
            geo, orientation=self.orientation,
            exif_tags=self.exif_tags or None,
            header_type=self.header_type_override))
        for k in range(geo.scan_count):
            out += jwriter.write_scan_header(geo, k)
            out += native.pack_tokens(bits_l[k], lens_l[k])
        out += b"\xff\xd9"
        t2 = time.perf_counter()
        self.stats.duration_in_gpu = (t1 - t0) * 1000.0
        self.stats.duration_stream = (t2 - t1) * 1000.0
        self.aggregate.add((t2 - t0) * 1000.0)
        self._frames += 1
        return bytes(out)

    def encode(self, image, param: Optional[Parameters] = None,
               param_image: Optional[ImageParameters] = None) -> bytes:
        """Encode one raw image to a JPEG codestream.

        image: numpy/JAX uint8 array — (H, W, C) / (H, W) for interleaved
        formats, flat (N,) for planar formats.
        """
        t0 = time.perf_counter()
        image = np.asarray(image) if not isinstance(image, jax.Array) else image
        geo = self.resolve(image, param, param_image)
        if geo.param.restart_interval == 0:
            return self._encode_host_entropy(image, geo, t0)
        geo, res, meta = self.encode_to_device(image, param, param_image)
        t1 = time.perf_counter()
        out = self.assemble(geo, res, meta)
        t2 = time.perf_counter()
        # duration_in_gpu was recorded by encode_to_device (final
        # dispatch only — convergence retries excluded)
        self.stats.duration_stream = (t2 - t1) * 1000.0
        self.aggregate.add((t2 - t0) * 1000.0)
        self._frames += 1
        if self.perf_stats:
            self._measure_phases(geo, image)
        return out

    def _measure_phases(self, geo: Geometry, image) -> None:
        """Per-phase breakdown via truncated-program dispatches
        (make_phase_fn); fills duration_preprocessor /
        duration_dct_quantization / duration_huffman_coder like the
        reference's per-kernel event pairs (gpujpeg_common.c:2169-2254).
        Costs two extra device dispatches per frame — only under the
        perf_stats flag, mirroring the reference's opt-in."""
        caps = self._caps.get(geo)
        if caps is None:
            return
        x = jnp.asarray(image)
        t0 = time.perf_counter()
        jax.block_until_ready(self._phase_fn(geo, caps, "pre")(x))
        t1 = time.perf_counter()
        jax.block_until_ready(self._phase_fn(geo, caps, "dct")(x))
        t2 = time.perf_counter()
        tp1 = (t1 - t0) * 1000.0
        tp2 = (t2 - t1) * 1000.0
        self.stats.duration_preprocessor = tp1
        self.stats.duration_dct_quantization = max(tp2 - tp1, 0.0)
        self.stats.duration_huffman_coder = \
            max(self.stats.duration_in_gpu - tp2, 0.0)

    def _phase_fn(self, geo: Geometry, caps, phase: str):
        key = ("phase", phase, geo, caps, self._pre())
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(make_phase_fn(geo, caps, self._pre(), phase))
            self._fns[key] = fn
        return fn

    def encode_pipelined(self, frames, param: Optional[Parameters] = None,
                         param_image: Optional[ImageParameters] = None):
        """Double-buffered steady-state encode: yields one JPEG codestream
        per input frame, overlapping host assembly with device compute.

        Frame i+1's device program is dispatched (asynchronously) BEFORE
        frame i's rows are fetched and assembled, so the host-side header
        write + row compaction of frame i runs while the device crunches
        frame i+1 — the TPU analogue of the reference's copy/compute
        overlap on CUDA streams (gpujpeg_encoder.c:423-424,550-563).

        The first frame runs the capacity-convergence path; later frames
        dispatch immediately and validate their needs vector only when
        their result is consumed.  On overflow (unusually dense content)
        the frame is transparently re-encoded with grown capacities —
        output bytes are always identical to sequential encode().

        All frames must share the first frame's shape and dtype (one
        geometry per pipeline — use separate calls for mixed sizes); a
        mismatching frame raises ValueError."""
        it = iter(frames)
        first = next(it, None)
        if first is None:
            return
        x0 = first if isinstance(first, jax.Array) else np.asarray(first)
        geo = self.resolve(x0, param, param_image)
        if geo.param.restart_interval == 0:
            # host-entropy path: no device pipeline to overlap
            yield self.encode(first, param, param_image)
            for f in it:
                yield self.encode(f, param, param_image)
            return

        def finish(res, raw, caps):
            # validate against the caps the frame was DISPATCHED with (a
            # later frame's overflow may have grown self._caps[geo] in
            # the meantime — checking against the grown caps would pass
            # a frame whose rows were truncated by the smaller packer)
            jax.block_until_ready(res["meta"])
            meta = np.asarray(res["meta"])
            if not caps_ok_for(geo, caps, meta[:caps.n_needs]):
                _, res, meta = self.encode_to_device(raw, param, param_image)
            out = self.assemble(geo, res, meta)
            self._frames += 1
            return out

        _, res_prev, _ = self.encode_to_device(x0, param, param_image)
        prev = (res_prev, x0, self._caps[geo])
        for f in it:
            x = jnp.asarray(f)
            if x.shape != x0.shape or x.dtype != x0.dtype:
                raise ValueError(
                    f"encode_pipelined frames must all match the first "
                    f"frame's shape/dtype {x0.shape}/{x0.dtype}; got "
                    f"{x.shape}/{x.dtype} (use separate calls for mixed "
                    "geometries)")
            caps = self._caps[geo]
            res_next = self._get_fn(geo, caps)(x)  # async dispatch
            yield finish(*prev)
            prev = (res_next, x, caps)
        yield finish(*prev)

    def get_stats(self) -> DurationStats:
        return self.stats
