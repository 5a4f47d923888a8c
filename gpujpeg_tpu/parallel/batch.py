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

Per-segment byte counts are all-gathered over 'seg' and exclusively scanned
to produce global codestream offsets — the deterministic replacement for the
reference's atomicAdd compaction (gpujpeg_huffman_gpu_encoder.cu:585-592),
structurally identical to its pre-atomic prefix-sum kernel (:505-554).
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
from ..stream import assemble, writer as jwriter
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


def make_batch_encode_fn(mesh: Mesh, param: Parameters,
                         pi: ImageParameters,
                         cap_tokens: int, cap_words: int):
    """Sharded batched encode: raw (B, ...) -> (words, seg_bytes, seg_base).

    The frame batch is sharded over 'data'; each frame's rows over 'seg'.
    Returns per-(frame, seg-shard) packed words and segment byte counts,
    plus each shard's global byte base (from the all-gather + scan).
    """
    n_seg = mesh.shape["seg"]
    H = pi.height
    assert H % n_seg == 0
    pi_local = pi.with_(height=H // n_seg)
    geo_local = get_geometry(param, pi_local)
    if n_seg > 1 and not shardable(get_geometry(param, pi), n_seg):
        raise ValueError("geometry not row-shardable into whole segments")
    frame_fn = enc_mod.make_device_encode_fn(geo_local, cap_tokens, cap_words)

    def shard_fn(raws):  # (B_local, H_local, W, C)
        words, seg_bytes = jax.vmap(frame_fn)(raws)
        # global byte offsets across the 'seg' axis (per frame):
        # all-gather shard totals, exclusive-scan to this shard's base
        totals = jnp.sum(seg_bytes, axis=1)  # (B_local,)
        all_totals = jax.lax.all_gather(totals, "seg")  # (n_seg, B_local)
        my = jax.lax.axis_index("seg")
        base = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n_seg, 1), 0).reshape(-1)
            < my, 1, 0
        )[:, None] * all_totals
        seg_base = jnp.sum(base, axis=0)  # (B_local,)
        return (words[:, None], seg_bytes[:, None], seg_base[:, None])

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
                 cap_tokens: int = 1 << 16, cap_words: int = 1 << 14):
        self.mesh = mesh
        self.param = enc_mod.adjust_params(param, pi)
        self.pi = pi
        self.geo = get_geometry(self.param, pi)
        self.cap_tokens = cap_tokens
        self.cap_words = cap_words
        fn, self.geo_local = make_batch_encode_fn(
            mesh, self.param, pi, cap_tokens, cap_words)
        self.fn = jax.jit(fn)
        self.n_seg = mesh.shape["seg"]

    def encode_batch(self, raws) -> list:
        """raws: (B, H, W, C) uint8 -> list of JPEG byte strings."""
        words, seg_bytes, _ = self.fn(jnp.asarray(raws))
        words = np.asarray(words)      # (B, n_seg, cap_words)
        seg_bytes = np.asarray(seg_bytes)  # (B, n_seg, nseg_local)
        header = jwriter.write_header(self.geo)
        out = []
        for b in range(words.shape[0]):
            out.append(self._stitch(header, words[b], seg_bytes[b]))
        return out

    def _stitch(self, header: bytes, words_s: np.ndarray,
                seg_bytes_s: np.ndarray) -> bytes:
        """Reorder shard-local segments into global scan order and assemble.

        Shard s holds (for non-interleaved) [comp0 segs, comp1 segs, ...] of
        its stripe; the global stream wants comp-major order across shards.
        """
        geo, geo_l = self.geo, self.geo_local
        n_seg = self.n_seg
        # byte buffers per shard
        bufs = [words_s[s].astype(">u4").view(np.uint8) for s in range(n_seg)]
        # per-shard, per-scan segment slices
        chunks = []
        glob_seg_bytes = []
        for scan_idx in range(geo.scan_count):
            for s in range(n_seg):
                sb = seg_bytes_s[s]
                scan_counts = geo_l.scan_segment_counts
                seg_lo = sum(scan_counts[:scan_idx])
                seg_hi = seg_lo + scan_counts[scan_idx]
                byte_lo = int(sb[:seg_lo].sum())
                byte_hi = byte_lo + int(sb[seg_lo:seg_hi].sum())
                chunks.append(bufs[s][byte_lo:byte_hi])
                glob_seg_bytes.append(sb[seg_lo:seg_hi])
        compact = np.concatenate(chunks)
        seg_bytes = np.concatenate(glob_seg_bytes)
        return assemble.assemble(geo, header, compact, seg_bytes)
