"""Mesh-sharded batch encoding: frames x restart-segments.

New capability relative to the reference (which is single-GPU, one image at
a time; host-thread scaling only, test/misc/mt_encode.c).  Two axes:

  'data' — frames of a batch; zero communication (embarrassingly parallel,
           SURVEY §2.2 "data parallelism" row)
  'seg'  — horizontal stripes of each frame whose restart segments are
           *bit-identical* to the corresponding segments of the full-frame
           encode: DC prediction resets at every restart marker, so a
           stripe aligned to whole segment rows is an independent coding
           unit (the TPU analogue of sequence/context parallelism,
           SURVEY §2.3)

Each shard encodes its stripe fully on device (tokens, bit-merge pack,
stuffing, restart markers); restart-marker indices are computed from
`jax.lax.axis_index('seg')` so the concatenated scan carries the correct
global RST(n mod 8) sequence.  Per-segment byte counts come back with the
rows; global codestream offsets are an exclusive scan on the host during
stitching — the deterministic replacement for the reference's atomicAdd
compaction (gpujpeg_huffman_gpu_encoder.cu:585-592), structurally identical
to its pre-atomic prefix-sum kernel (:505-554).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import encoder as enc_mod
from ..stream import writer as jwriter
from ..types import ImageParameters, Parameters
from ..utils.geometry import Geometry, get_geometry


def stripe_alignment(geo: Geometry) -> int:
    """Smallest stripe height (in pixels) such that stripes coincide with
    whole restart segments for every scan; 0 if the geometry cannot be
    segment-sharded by rows."""
    rst = geo.param.restart_interval
    if rst <= 0:
        return 0
    lcm_px = 1
    for c in geo.components:
        # smallest number of MCU rows whose MCU count is a segment multiple
        k = rst // np.gcd(rst, c.mcu_count_x)
        stripe_px = k * c.mcu_size_y * (geo.max_v // c.samp_v)
        lcm_px = np.lcm(lcm_px, stripe_px)
    return int(lcm_px)


def shardable(geo: Geometry, n_seg_shards: int) -> bool:
    a = stripe_alignment(geo)
    H = geo.param_image.height
    return a > 0 and H % (a * n_seg_shards) == 0


def feasible_seg_shards(geo: Geometry, n_max: int) -> int:
    """Largest seg-shard count <= n_max the geometry supports (graceful
    fallback instead of shardable() hard-failing: 1 = no segment
    sharding, frames-only parallelism)."""
    for s in range(n_max, 0, -1):
        if s == 1 or shardable(geo, s):
            return s
    return 1


def make_batch_encode_fn(mesh: Mesh, param: Parameters,
                         pi: ImageParameters, caps):
    """Sharded batched encode: raw (B, H, W, C) -> (rows, row_bytes).

    The frame batch is sharded over 'data'; each frame's rows over 'seg'.
    Every shard emits RST markers for ALL its segments (scan-final markers
    of the whole frame are dropped during host stitching) with globally
    correct RST(n mod 8) indices.

    caps selects the entropy back-end exactly like the single-chip
    encoder: MegaCaps -> the DCT-fused entropy megakernel per component
    (the same pipeline that produces the single-chip numbers, under
    shard_map); Caps -> the XLA merge tree (CPU-mesh tests).  FusedCaps
    is not supported under the mesh — callers get it promoted to Caps.
    """
    n_seg = mesh.shape["seg"]
    H = pi.height
    assert H % n_seg == 0
    pi_local = pi.with_(height=H // n_seg)
    geo_local = get_geometry(param, pi_local)
    if n_seg > 1 and not shardable(get_geometry(param, pi), n_seg):
        raise ValueError("geometry not row-shardable into whole segments")

    mega = isinstance(caps, enc_mod.MegaCaps)
    if mega:
        from ..ops import fusedpack
        from ..utils import tables as _tables

        interp = enc_mod.fused_mode() == "interpret"
        xbd_impl, xbd_infos = enc_mod.make_rows_xbd_impl(geo_local)
        consts = _tables.entropy_kernel_consts(param.quality)

        def frame_fn(raw, shard_idx):
            # same megakernel pipeline as make_full_encode_fn, with the
            # per-component RST indices offset by the shard's global
            # segment base (shard stripes are scan-major contiguous, so
            # scan k's base is shard_idx * S_k); every segment gets a
            # marker — the host stitch drops frame-final ones
            xbds = xbd_impl(raw)
            rows_l, ob_l, needs_l = [], [], []
            for xbd, info in zip(xbds, xbd_infos):
                S = info["S"]
                luma_t = np.full((1, S), 1 if info["luma"] else 0,
                                 np.int32)
                rstm = (0xD0 + ((jnp.arange(S, dtype=jnp.int32)
                                 + shard_idx * S) % 8)).astype(jnp.uint32)
                r, ob, nd = fusedpack.entropy_fused_u8(
                    xbd, jnp.asarray(info["valid"]),
                    jnp.asarray(luma_t), rstm,
                    z_cap=caps.z_cap, w_out=caps.w_out, consts=consts,
                    dct_key=info["dct_key"], interpret=interp,
                    compact_after=caps.compact,
                    xq=info.get("xq", False))
                rows_l.append(r)
                ob_l.append(ob)
                needs_l.append(nd)
            rows = jnp.concatenate(rows_l)
            out_bytes = jnp.concatenate(ob_l)
            needs = functools.reduce(jnp.maximum, needs_l)
            return rows, out_bytes, needs
    else:
        tokens_impl = enc_mod.make_rows_tokens_impl(geo_local)
        from ..ops import bitmerge

        # per-scan local segment counts for global RST numbering
        scan_bounds = geo_local.scan_seg_bounds
        seg_scan = np.zeros(geo_local.segment_count, np.int32)
        seg_local_idx = np.zeros(geo_local.segment_count, np.int32)
        for k in range(geo_local.scan_count):
            b0, b1 = scan_bounds[k], scan_bounds[k + 1]
            seg_scan[b0:b1] = k
            seg_local_idx[b0:b1] = np.arange(b1 - b0)
        scan_counts = np.asarray([b1 - b0 for b0, b1 in
                                  zip(scan_bounds[:-1], scan_bounds[1:])],
                                 np.int64)

        def frame_fn(raw, shard_idx):
            bits, lens = tokens_impl(raw)
            words, row_bits, need1 = bitmerge.pack_rows_merge(
                bits, lens, caps=caps.pack)
            seg_bytes = (row_bits + 7) >> 3
            padded = bitmerge.or_pad_bits(words, row_bits)
            # global RST index: shard stripes are scan-major contiguous
            gidx = (shard_idx * jnp.asarray(scan_counts.astype(np.int32))[
                jnp.asarray(seg_scan)] + jnp.asarray(seg_local_idx))
            rst_marker = (0xD0 + (gidx % 8)).astype(jnp.uint32)
            rows, out_bytes, max_z = bitmerge.stuff_rows_roll(
                padded, seg_bytes, rst_marker, z_cap=caps.z_cap)
            return rows, out_bytes, jnp.concatenate([need1, max_z[None]])

    def shard_fn(raws):  # (B_local, H_local, W, C)
        my = jax.lax.axis_index("seg")
        outs = [frame_fn(raws[b], my) for b in range(raws.shape[0])]
        rows = jnp.stack([o[0] for o in outs])
        out_bytes = jnp.stack([o[1] for o in outs])
        needs = jnp.stack([o[2] for o in outs])
        return rows[:, None], out_bytes[:, None], needs[:, None]

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", "seg"),),
        out_specs=(P("data", "seg"), P("data", "seg"), P("data", "seg")),
        check_vma=False,
    )
    return mapped, geo_local


class BatchEncoder:
    """Encode batches of equally-sized frames across a device mesh."""

    def __init__(self, mesh: Mesh, param: Parameters, pi: ImageParameters,
                 caps=None):
        self.mesh = mesh
        self.param = enc_mod.adjust_params(param, pi)
        self.pi = pi
        self.geo = get_geometry(self.param, pi)
        n_seg = mesh.shape["seg"]
        geo_l = get_geometry(self.param, pi.with_(height=pi.height // n_seg))
        self.geo_local = geo_l
        if caps is None:
            # same back-end selection as the single-chip encoder: the
            # megakernel on TPU, the XLA merge tree on CPU meshes; the
            # deep-stuff FusedCaps flavor is promoted to the XLA tree
            # (its kernel is not plumbed through shard_map)
            caps = enc_mod._initial_caps_for(geo_l)
            if isinstance(caps, enc_mod.FusedCaps):
                caps = enc_mod.initial_caps(geo_l)
        self.caps = caps
        self._tightened = not isinstance(caps, enc_mod.MegaCaps)
        self._build()
        self.n_seg = n_seg

    def _build(self):
        fn, self.geo_local = make_batch_encode_fn(
            self.mesh, self.param, self.pi, self.caps)
        self.fn = jax.jit(fn)

    def encode_batch(self, raws) -> list:
        """raws: (B, H, W, C) uint8 -> list of JPEG byte strings.

        Capacity overflows (content denser than any seen) grow the caps
        and transparently re-encode — the mesh version of the
        single-chip sticky-caps convergence (no RuntimeError)."""
        raws = jnp.asarray(raws)
        for _attempt in range(12):
            res = self.fn(raws)
            jax.block_until_ready(res)
            rows, row_bytes, needs = (np.asarray(r) for r in res)
            need_vec = needs.reshape(-1, needs.shape[-1]).max(axis=0)
            if enc_mod.caps_ok_for(self.geo_local, self.caps, need_vec):
                if not self._tightened:
                    # one-time shrink-to-fit, like the single-chip
                    # session (grown caps with a shallow compaction
                    # schedule cost ~4 ms/frame at 8K); the loop
                    # re-validates the tightened run
                    self._tightened = True
                    tight = enc_mod.tightened_mega_caps(
                        self.geo_local, self.caps, need_vec)
                    if tight is not None:
                        self.caps = tight
                        self._build()
                        continue
                break
            self.caps = enc_mod.grown_caps_for(self.geo_local, self.caps,
                                               need_vec)
            self._build()
        else:
            raise RuntimeError("capacity growth did not converge")
        header = jwriter.write_header(self.geo)
        out = []
        for b in range(rows.shape[0]):
            out.append(self._stitch(header, rows[b], row_bytes[b]))
        return out

    def encode_batch_local(self, local_frames):
        """MULTI-HOST batch encode: each process passes only ITS OWN
        frames (the global batch rows local_frame_indices selects, in
        that order) and gets back (streams, global_indices) for exactly
        those frames.

        Frame routing is process-local by mesh construction (dist.
        make_global_mesh keeps every frame's 'seg' shards intra-host),
        so no pixel or codestream bytes ever cross hosts — only the
        tiny sticky-caps needs vector is allgathered so every process
        grows capacities identically (deterministic SPMD recompiles).
        Degrades to encode_batch on a single process.  This is
        BASELINE's >= 80 % frames/s multi-host scaling axis; the
        reference has no counterpart (single-GPU select,
        gpujpeg_common.c:220-288)."""
        import jax
        from . import dist

        local_frames = np.stack([np.asarray(f) for f in local_frames])
        if jax.process_count() == 1:
            return (self.encode_batch(local_frames),
                    list(range(len(local_frames))))
        rows_mine = dist.data_rows_of_process(self.mesh)
        if not rows_mine:
            raise ValueError("this process owns no mesh 'data' rows")
        if len(local_frames) % len(rows_mine):
            raise ValueError(
                f"{len(local_frames)} local frames do not split evenly "
                f"over this process's {len(rows_mine)} 'data' rows")
        B = (len(local_frames) // len(rows_mine)) * self.mesh.shape["data"]
        idx = dist.local_frame_indices(self.mesh, B)
        garr = dist.make_global_batch(self.mesh, P("data", "seg"),
                                      local_frames, B)
        for _attempt in range(12):
            res = self.fn(garr)
            jax.block_until_ready(res)
            rows_a, rb_a, needs_a = res
            nd = [np.asarray(s.data) for s in needs_a.addressable_shards]
            need_vec = np.max([x.reshape(-1, x.shape[-1]).max(axis=0)
                               for x in nd], axis=0)
            need_vec = dist.allgather_max(need_vec)
            if enc_mod.caps_ok_for(self.geo_local, self.caps, need_vec):
                if not self._tightened:
                    self._tightened = True
                    tight = enc_mod.tightened_mega_caps(
                        self.geo_local, self.caps, need_vec)
                    if tight is not None:
                        self.caps = tight
                        self._build()
                        continue
                break
            self.caps = enc_mod.grown_caps_for(self.geo_local, self.caps,
                                               need_vec)
            self._build()
        else:
            raise RuntimeError("capacity growth did not converge")
        rows_map = dist.local_rows(rows_a, self.mesh, B)
        rb_map = dist.local_rows(rb_a, self.mesh, B)
        header = jwriter.write_header(self.geo)
        return [self._stitch(header, rows_map[b], rb_map[b])
                for b in idx], idx

    def _stitch(self, header: bytes, rows_s: np.ndarray,
                rb_s: np.ndarray) -> bytes:
        """Reorder shard-local segments into global scan order and emit.

        Shard s holds (for non-interleaved) [comp0 segs, comp1 segs, ...]
        of its stripe; the global stream wants comp-major order across
        shards.  Scan-final RST markers (present because shards cannot know
        they are frame-final) are stripped here."""
        geo, geo_l = self.geo, self.geo_local
        n_seg = self.n_seg
        out = bytearray(header)
        K4 = rows_s.shape[-1] * 4
        by = np.ascontiguousarray(rows_s.astype(">u4")).view(np.uint8)
        by = by.reshape(n_seg, -1, K4)
        for scan_idx in range(geo.scan_count):
            out += jwriter.write_scan_header(geo, scan_idx)
            b0 = geo_l.scan_seg_bounds[scan_idx]
            b1 = geo_l.scan_seg_bounds[scan_idx + 1]
            for s in range(n_seg):
                sb = rb_s[s, b0:b1]
                chunk = by[s, b0:b1]
                mask = (np.arange(K4)[None, :] < sb[:, None])
                body = chunk[mask]
                if s == n_seg - 1:
                    body = body[:-2]  # drop frame-final RST of this scan
                out += body.tobytes()
        out += b"\xff\xd9"
        return bytes(out)


class ShardedDecoder:
    """Decode ONE frame with its restart-segment rows striped over the
    mesh 'seg' axis — the decode-side counterpart of BatchEncoder's
    'seg' sharding, for frames too big (or too slow) for one chip (the
    16K case).  Restart segments are independent coding units
    (the reference decodes one per thread,
    gpujpeg_huffman_gpu_decoder.cu:390-407), so a stripe aligned to
    whole segment rows decodes independently; each shard runs the FULL
    fused pipeline on a stripe-local geometry and the output image is
    simply the row-sharded result — no stitch pass at all.

    Non-interleaved scans only (stripe rows of an interleaved scan are
    also contiguous segment runs, but the per-component slot slicing in
    the interleaved tail has not been wired for stripe locality yet).
    Same-geometry/table streams decode through the compiled program;
    denser-than-example streams raise CapacityError (decode them on a
    plain Decoder)."""

    def __init__(self, mesh: Mesh, example_stream: bytes):
        from ..models.decoder import (Decoder, _bucket, _comp_scan_width,
                                      resolve_output)
        from ..stream import reader

        self.mesh = mesh
        n = mesh.shape["seg"]
        self.n_seg = n
        self.dec = Decoder()
        # converge the FULL-frame plan's split caps once (full-frame
        # needs are maxima over all segments, so they dominate any
        # stripe's needs)
        first = self.dec.decode_to_device(example_stream)
        jax.block_until_ready(first)
        del first
        ps = reader.parse(example_stream)
        param = reader.parsed_to_parameters(ps)
        out_pi = resolve_output(ps, None, 0)
        geo = get_geometry(param, out_pi.with_(width_padding=0))
        if geo.interleaved:
            raise ValueError("seg-sharded decode supports non-interleaved "
                             "scans only")
        H = geo.param_image.height
        a = stripe_alignment(geo)
        if not (a > 0 and H % (a * n) == 0):
            raise ValueError(
                f"height {H} not stripeable into {n} whole-segment "
                f"shards (alignment {a})")
        geo_l = get_geometry(param, out_pi.with_(width_padding=0,
                                                 height=H // n))
        plan_full = self.dec._plan_for(geo, ps)
        if plan_full is None:
            raise ValueError("legacy-path streams cannot be seg-sharded")
        plan_l = self.dec._plan_for(geo_l, ps)
        plan_l.split_caps = plan_full.split_caps
        self.geo, self.geo_l = geo, geo_l
        from ..models.decoder import _table_signature

        self.table_sig = _table_signature(ps)

        # shard-major row permutation: global segment rows are
        # comp-major (comp0 segs, comp1 segs, ...); shard s needs
        # [comp_c rows s*Sl_c:(s+1)*Sl_c for every c] contiguously
        comp_bases, base = [], 0
        for c in geo.components:
            comp_bases.append(base)
            base += c.segment_count
        perm = []
        for s in range(n):
            for c, cb in zip(geo.components, comp_bases):
                Sl = c.segment_count // n
                perm.extend(range(cb + s * Sl, cb + (s + 1) * Sl))
        self.perm = np.asarray(perm, np.int64)

        bounds = self.dec._segment_bounds(ps, geo)
        seg_lens = bounds[1] - bounds[0]
        self.max_words = _bucket((int(seg_lens.max()) + 3) // 4)
        W = self.max_words + 1
        # per-component scan widths from GLOBAL maxima so one compiled
        # program serves every stripe
        self.comp_widths = []
        wcs = []
        for c, cb in zip(geo.components, comp_bases):
            S = c.segment_count
            wc = _comp_scan_width(W, seg_lens, cb, cb + S)
            wcs.append(wc)
            self.comp_widths.append((cb, cb + S, wc))
        fn_l, _cw = self.dec._build_pipeline_fn(
            ps, geo_l, plan_l, plan_l.split_caps, W, wcs=wcs)
        self.split_caps = plan_l.split_caps

        def shard_fn(words_s, nbits_s):
            img, needs = fn_l(words_s, nbits_s)
            return img, needs[None]

        self.fn = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("seg"), P("seg")),
            out_specs=(P("seg"), P("seg")), check_vma=False))

    def pack(self, data: bytes):
        """Host prep: permuted (words, nbits) for the sharded program.
        Raises CapacityError when the stream is denser than the
        example (decode it on a plain Decoder instead)."""
        from ..models.decoder import CapacityError, _table_signature, \
            resolve_output
        from ..stream import reader, segments as segprep
        from ..utils.geometry import get_geometry as _gg

        ps = reader.parse(data)
        param = reader.parsed_to_parameters(ps)
        out_pi = resolve_output(ps, None, 0)
        g = _gg(param, out_pi.with_(width_padding=0))
        if g != self.geo:
            raise ValueError("stream geometry differs from the example")
        if _table_signature(ps) != self.table_sig:
            raise ValueError("stream tables differ from the example")
        st, en = self.dec._segment_bounds(ps, self.geo)
        lens = en - st
        if (int(lens.max()) + 3) // 4 > self.max_words:
            raise CapacityError("segment wider than the compiled row")
        for lo, hi, wc in self.comp_widths:
            if (int(lens[lo:hi].max()) + 3) // 4 > wc - 1:
                raise CapacityError(
                    f"segments {lo}:{hi} exceed the compiled "
                    f"per-component width {wc - 1}")
        st = np.ascontiguousarray(st[self.perm])
        en = np.ascontiguousarray(en[self.perm])
        return segprep.pack_segments_matrix(ps.data, (st, en),
                                            self.max_words)

    def decode_to_device(self, data: bytes):
        words, nbits = self.pack(data)
        out, needs = self.fn(jnp.asarray(words), jnp.asarray(nbits))
        caps = self.split_caps
        if caps:
            nv = np.asarray(needs).reshape(-1, np.asarray(needs).shape[-1]) \
                .max(axis=0)
            if any(int(nv[j]) > caps[j] for j in range(len(caps))):
                # denser than the example converged: validating fallback
                return self.dec.decode_to_device(data)
        return out

    def decode(self, data: bytes) -> np.ndarray:
        out = self.decode_to_device(data)
        jax.block_until_ready(out)
        return np.asarray(out)


def bitmerge_worst(geo_l: Geometry):
    from ..ops import bitmerge as bm

    return bm.worst_caps(enc_mod.token_slots(geo_l), 27)


class BatchDecoder:
    """Decode batches of same-geometry streams across the mesh 'data'
    axis — the decode-side counterpart of BatchEncoder (new capability
    vs the single-GPU reference; its multi-stream story is host threads,
    test/misc/mt_encode.c).

    Tables, split capacities and the output format converge on the
    example stream (the compile_stream_pipeline steady-state contract);
    each shard runs the full fused decode pipeline on its frames.  Use a
    mesh with seg=1 — decode has no segment axis (every frame's segments
    already run lane-parallel within its device)."""

    def __init__(self, mesh: Mesh, example_stream: bytes,
                 batch_size: int):
        from ..models.decoder import Decoder

        self.mesh = mesh
        self.dec = Decoder()
        (fn, _w, _n, geo, max_words, comp_widths, table_sig,
         split_caps) = self.dec._stream_pipeline_parts(example_stream)
        self.comp_widths = comp_widths
        self.table_sig = table_sig
        self.split_caps = split_caps
        data = mesh.shape["data"]
        if batch_size % data:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"the mesh 'data' extent {data}")
        b_local = batch_size // data
        self.geo, self.max_words = geo, max_words
        self.batch_size = batch_size

        def shard_fn(words_b, nbits_b):     # (B_local, nseg, W)
            outs = [fn(words_b[i], nbits_b[i]) for i in range(b_local)]
            imgs = jnp.stack([o[0] for o in outs])
            needs = jnp.stack([o[1] for o in outs])
            return imgs, needs

        self.fn = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False))

    def decode_batch(self, streams) -> np.ndarray:
        """streams: list of JPEG byte strings (len == batch_size, same
        geometry/tables as the example) -> (B, ...) decoded images.

        Streams denser than the example overflow the compiled split
        capacities; the returned needs vectors detect that and the
        affected frames are re-decoded on the validating path (their
        caps feed future pipelines via the shared Decoder session)."""
        if len(streams) != self.batch_size:
            raise ValueError(f"expected {self.batch_size} streams, got "
                             f"{len(streams)}")
        from ..models.decoder import CapacityError

        ws, nb, fallback = [], [], []
        blank = None
        for i, s in enumerate(streams):
            try:
                w, n = self.dec.pack_stream(s, self.geo, self.max_words,
                                            self.comp_widths,
                                            self.table_sig)
            except CapacityError:
                # denser than the compiled pipeline admits: decode this
                # frame on the validating single-stream path (a bubble,
                # not an error — mirrors decode_pipelined's policy)
                fallback.append(i)
                if blank is None:
                    blank = (np.zeros((self.geo.segment_count,
                                       self.max_words + 1), np.uint32),
                             np.zeros(self.geo.segment_count, np.int32))
                w, n = blank
            ws.append(w)
            nb.append(n)
        out, needs = self.fn(jnp.asarray(np.stack(ws)),
                             jnp.asarray(np.stack(nb)))
        res = np.asarray(out)
        needs = np.asarray(needs)
        caps = self.split_caps
        repair = [i for i in range(len(streams))
                  if i in fallback or (caps is not None and any(
                      int(needs[i][j]) > caps[j]
                      for j in range(len(caps))))]
        if repair:
            res = np.array(res)     # np.asarray can be a read-only view
            for i in repair:
                res[i] = self.dec.decode(streams[i])
        return res

    def decode_batch_local(self, local_streams):
        """MULTI-HOST batch decode: each process passes only ITS OWN
        streams (the global batch rows local_frame_indices selects) and
        gets back (images, global_indices) for exactly those frames —
        the decode counterpart of BatchEncoder.encode_batch_local.
        Host prep (parse/unstuff) and output fetch stay process-local;
        nothing crosses hosts.  Degrades to decode_batch on one
        process."""
        import jax
        from . import dist

        if jax.process_count() == 1:
            if len(local_streams) != self.batch_size:
                raise ValueError(
                    f"expected {self.batch_size} streams, got "
                    f"{len(local_streams)}")
            res = self.decode_batch(local_streams)
            return list(res), list(range(len(local_streams)))
        rows_mine = dist.data_rows_of_process(self.mesh)
        if not rows_mine:
            raise ValueError("this process owns no mesh 'data' rows")
        B = (len(local_streams) // len(rows_mine)) \
            * self.mesh.shape["data"]
        if B != self.batch_size:
            raise ValueError(
                f"global batch {B} != configured {self.batch_size}")
        idx = dist.local_frame_indices(self.mesh, B)
        ws, nb = [], []
        for s in local_streams:
            w, n = self.dec.pack_stream(s, self.geo, self.max_words,
                                        self.comp_widths, self.table_sig)
            ws.append(w)
            nb.append(n)
        gw = dist.make_global_batch(self.mesh, P("data"),
                                    np.stack(ws), B)
        gn = dist.make_global_batch(self.mesh, P("data"),
                                    np.stack(nb), B)
        out, needs_a = self.fn(gw, gn)
        jax.block_until_ready(out)
        imgs = dist.local_batch(out, B)
        needs = dist.local_batch(needs_a, B)
        caps = self.split_caps
        res = []
        for k, b in enumerate(idx):
            img = imgs[b]
            nv = needs[b]
            if caps is not None and any(
                    int(nv[j]) > caps[j] for j in range(len(caps))):
                img = self.dec.decode(local_streams[k])
            res.append(img)
        return res, idx



