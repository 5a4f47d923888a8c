"""Deterministic bitstream packing: tokens -> segment-parallel byte stream.

Replaces the reference's three-kernel encode/serialize/compact design
(src/gpujpeg_huffman_gpu_encoder.cu:299-615).  Where the CUDA code reserves
output space with atomicAdd (:585-592), we use the prefix-sum formulation the
reference itself uses on pre-atomic hardware (:505-554) — which is also the
only deterministic option and exactly what scales across a device mesh:

  1. per-segment exclusive bit-offset scan over token lengths
     (+1 padding token per segment to byte-align with 1-bits, F.1.2.3)
  2. global byte offsets = exclusive scan over segment byte sizes
  3. compaction of nonzero-length tokens (sorted unique scatter)
  4. "pull" assembly: every 32-bit output word binary-searches the first
     contributing token and ORs in the <=K straddling tokens

Everything is static-shape; the output buffer capacity `cap_words` is a
bucketed jit argument chosen by the caller from the measured segment sizes.

Byte stuffing (0xFF -> 0xFF 0x00) and restart markers are inserted during
host-side stream assembly (stream/assemble.py), mirroring the reference's
CPU stream formatter (gpujpeg_encoder.c:566-624).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def searchsorted_right(sorted_vals: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized binary search: count of sorted_vals <= query.

    log2(N) rounds of gathers — faster on TPU than jnp.searchsorted's
    scan/sort methods for our sizes.
    """
    n = sorted_vals.shape[0]
    n_iter = max(1, int(np.ceil(np.log2(n + 1))))
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(n_iter):
        mid = (lo + hi) >> 1
        amid = sorted_vals[jnp.minimum(mid, n - 1)]
        go_right = (amid <= queries) & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def segment_offsets(lens_rows: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-segment token offsets and byte-aligned global layout.

    lens_rows: (nseg, ntok) int32 token bit lengths (0 = no token)

    Returns (off_rows, pad_bits, seg_bytes, seg_start_byte):
      off_rows:  (nseg, ntok) exclusive bit offset of each token in its segment
      pad_bits:  (nseg,) 1-bit padding to the next byte boundary
      seg_bytes: (nseg,) byte length of each segment (incl. padding)
      seg_start_byte: (nseg,) exclusive scan of seg_bytes
    """
    csum = jnp.cumsum(lens_rows, axis=1, dtype=jnp.int32)
    off_rows = csum - lens_rows
    seg_bits = csum[:, -1]
    pad_bits = (-seg_bits) % 8
    seg_bytes = (seg_bits + pad_bits) >> 3
    seg_start = jnp.cumsum(seg_bytes) - seg_bytes
    return off_rows, pad_bits, seg_bytes, seg_start


def compact_tokens(bits, lens, goff, cap_tokens: int):
    """Keep only emitting tokens (len > 0), preserving stream order.

    Sorted-unique scatter — the XLA-friendly compaction.  Returns
    (cbits, clen, coff, count); slots beyond `count` hold off = +inf sentinel
    so searchsorted stays well-defined.
    """
    flat_bits = bits.reshape(-1)
    flat_lens = lens.reshape(-1)
    flat_off = goff.reshape(-1)
    keep = flat_lens > 0
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    count = dest[-1] + 1
    dest = jnp.where(keep, dest, cap_tokens)

    big = jnp.int32(2**30)
    cbits = jnp.zeros(cap_tokens, jnp.uint32).at[dest].set(
        flat_bits, mode="drop", indices_are_sorted=True, unique_indices=True)
    clen = jnp.zeros(cap_tokens, jnp.int32).at[dest].set(
        flat_lens, mode="drop", indices_are_sorted=True, unique_indices=True)
    coff = jnp.full(cap_tokens, big, jnp.int32).at[dest].set(
        flat_off, mode="drop", indices_are_sorted=True, unique_indices=True)
    return cbits, clen, coff, count


def pull_pack_words(cbits, clen, coff, count, cap_words: int, k_window: int):
    """Assemble output words by gathering straddling tokens (MSB-first).

    Every output word finds its first contributing token via binary search on
    token end offsets, then ORs in up to `k_window` consecutive tokens.
    k_window = floor(32 / min_code_len) + 2 is a static property of the
    Huffman tables.
    """
    cend = coff + clen  # strictly increasing over live tokens
    wb = jax.lax.broadcasted_iota(jnp.int32, (cap_words, 1), 0).reshape(-1) * 32
    j0 = searchsorted_right(cend, wb)  # first token with end > wb

    acc = jnp.zeros(cap_words, jnp.uint32)
    n = cbits.shape[0]
    for t in range(k_window):
        j = jnp.minimum(j0 + t, n - 1)
        o = coff[j]
        l = clen[j]
        b = cbits[j]
        rel = o - wb
        sh = 32 - rel - l
        lsh = jnp.clip(sh, 0, 31).astype(jnp.uint32)
        rsh = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
        contrib = jnp.where(sh >= 0, b << lsh, b >> rsh)
        valid = (rel < 32) & (j0 + t < count) & (o + l > wb)
        acc = acc | jnp.where(valid, contrib, 0)
    return acc


@functools.partial(jax.jit, static_argnames=("cap_tokens", "cap_words",
                                             "k_window"))
def pack_segments(bits_rows, lens_rows, cap_tokens: int, cap_words: int,
                  k_window: int):
    """Full packing pipeline for (nseg, ntok) token arrays.

    Appends the per-segment byte-alignment pad token (1-bits, F.1.2.3),
    computes global offsets, compacts, and pulls words.

    Returns (words, seg_bytes, token_count):
      words:     (cap_words,) uint32, big-endian byte order within each word
      seg_bytes: (nseg,) int32 segment byte lengths
      token_count: () int32 number of live tokens (overflow check)
    """
    nseg = lens_rows.shape[0]
    off_rows, pad_bits, seg_bytes, seg_start = segment_offsets(lens_rows)

    pad_tok_bits = ((jnp.uint32(1) << pad_bits.astype(jnp.uint32)) - 1)
    bits_all = jnp.concatenate([bits_rows, pad_tok_bits[:, None]], axis=1)
    lens_all = jnp.concatenate([lens_rows, pad_bits[:, None]], axis=1)
    pad_off = off_rows[:, -1] + lens_rows[:, -1]
    off_all = jnp.concatenate([off_rows, pad_off[:, None]], axis=1)

    goff = (seg_start[:, None] << 3) + off_all
    cbits, clen, coff, count = compact_tokens(bits_all, lens_all, goff,
                                              cap_tokens)
    words = pull_pack_words(cbits, clen, coff, count, cap_words, k_window)
    return words, seg_bytes, count


def token_bit_lengths(lens_rows: jnp.ndarray):
    """(nseg,) total coded bits per segment (pre-padding), for sizing."""
    return jnp.sum(lens_rows, axis=1, dtype=jnp.int32)


def bytes_from_words(words: jnp.ndarray) -> jnp.ndarray:
    """(W,) uint32 big-endian packed -> (4W,) uint8, pure elementwise."""
    b = jnp.stack([(words >> 24) & 0xFF, (words >> 16) & 0xFF,
                   (words >> 8) & 0xFF, words & 0xFF], axis=-1)
    return b.reshape(-1).astype(jnp.uint8)


def finalize_scan_bodies(words, seg_bytes, rst_marker, rst_shift,
                         cap_body: int):
    """Device-side stream formatter: 0xFF byte stuffing + restart markers.

    Replaces the reference's CPU stream assembly loop
    (gpujpeg_encoder.c:566-624) with one vectorized scatter: every unstuffed
    byte's output position is its index plus the count of stuffed zeros
    before it (cumsum) plus the static RST-marker shift of its segment;
    stuffed 0x00 bytes appear for free as zero-initialized gaps.

    words:      (cap_words,) uint32 BE-packed unstuffed segment bytes
                (byte-aligned, concatenated in global segment order)
    seg_bytes:  (nseg,) int32 per-segment byte counts
    rst_marker: (nseg,) uint8 static: second byte of the RST marker written
                after segment i (0 = no marker: scan-final or rst disabled)
    rst_shift:  (nseg,) int32 static: 2 * markers before segment i
    cap_body:   static output capacity

    Returns (body, seg_out, seg_end_out, total_out):
      body:        (cap_body,) uint8 stuffed scan bodies, concatenated in
                   scan order (RST markers included, scan-final RST absent)
      seg_out:     (nseg,) int32 output offset of each segment's first byte
      seg_end_out: (nseg,) int32 output offset just past each segment's
                   stuffed data (before its RST marker)
      total_out:   () int32 total bytes used in body
    """
    nseg = seg_bytes.shape[0]
    cap_bytes = words.shape[0] * 4
    seg_start = jnp.cumsum(seg_bytes) - seg_bytes
    total_in = seg_start[-1] + seg_bytes[-1]

    b = bytes_from_words(words)
    i = jax.lax.broadcasted_iota(jnp.int32, (cap_bytes, 1), 0).reshape(-1)
    valid = i < total_in
    is_ff = ((b == 0xFF) & valid).astype(jnp.int32)
    csum_ff = jnp.cumsum(is_ff)             # inclusive
    nff_before = csum_ff - is_ff            # exclusive

    # segment id of each byte: scatter-add segment-start marks, cumsum
    mark = jnp.zeros(cap_bytes + 1, jnp.int32).at[seg_start].add(
        1, mode="drop", indices_are_sorted=True)
    seg_of = jnp.cumsum(mark[:cap_bytes]) - 1
    seg_of = jnp.clip(seg_of, 0, nseg - 1)

    shift_tab = jnp.asarray(rst_shift)
    out_pos = i + nff_before + shift_tab[seg_of]
    body = jnp.zeros(cap_body, jnp.uint8).at[
        jnp.where(valid, out_pos, cap_body)].set(
        b, mode="drop", indices_are_sorted=True, unique_indices=True)

    # per-segment stuffed output offsets
    csum_ff_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), csum_ff])
    seg_end_in = seg_start + seg_bytes
    seg_out = seg_start + csum_ff_ext[seg_start] + shift_tab
    seg_end_out = seg_end_in + csum_ff_ext[seg_end_in] + shift_tab

    # restart markers (0xFF, 0xD0+i%8) after non-final segments
    has_rst = jnp.asarray(rst_marker) != 0
    rpos = jnp.where(has_rst, seg_end_out, cap_body)
    body = body.at[rpos].set(jnp.uint8(0xFF), mode="drop",
                             indices_are_sorted=True, unique_indices=True)
    body = body.at[jnp.where(has_rst, rpos + 1, cap_body + 1)].set(
        jnp.asarray(rst_marker), mode="drop",
        indices_are_sorted=True, unique_indices=True)

    n_rst = jnp.sum(has_rst.astype(jnp.int32))
    total_out = total_in + csum_ff[-1] + 2 * n_rst
    return body, seg_out, seg_end_out, total_out
