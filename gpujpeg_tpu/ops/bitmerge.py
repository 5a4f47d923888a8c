"""Gather-free segment bit-packing: hierarchical bitstream merge.

The reference serializes each restart segment's Huffman tokens with one CUDA
thread writing variable-length codewords sequentially
(src/gpujpeg_huffman_gpu_encoder.cu:406-502).  XLA gathers/scatters cost
~10 ns/element on TPU, so the packer is instead a **pairwise merge tree**:
tokens are (bits, len) bitstrings; concatenation is associative, so level L
merges adjacent pairs of bitstring buffers into buffers of roughly twice the
capacity:

    level 0:  T tokens/row, <=32 bits each, 1 word buffers
    level L:  ceil(T/2^L) buffers/row, cap_L words each
    level ceil(log2 T):  one buffer per row == the packed segment

Appending B (len lb) to A (len la) is A | (B >> la), where ">>" is a
bitstream shift of B's whole word buffer by la bits: a sub-word part
(variable elementwise shifts — native VPU ops) plus a whole-word part
(log2 conditional static rolls — pad+slice).  No gathers, no scatters, no
sorts anywhere.

Two throughput levers:
  * per-level word capacities `caps` are CONTENT-ADAPTIVE: the worst case
    (every token 27 bits) never happens at useful qualities, so sticky
    per-geometry capacities shrink intermediate buffers ~5x; each level's
    realized maximum is returned in `level_need` for overflow-driven
    regrowth (the same protocol as the reference's worst-case per-segment
    allocations, gpujpeg_common.c:812-871, but measured instead of bounded).
  * buffers keep their LARGER axis minor (TPU pads the minor dimension to
    128 lanes), switching from buffer-minor to word-minor layout mid-tree.

Byte stuffing + restart markers are a SECOND, shallower merge tree over the
packed bytes (each byte re-emitted as an 8- or 16-bit token, 0xFF -> 0xFF00,
with the RST marker as a trailing 16-bit token), replacing both the
reference's inline stuffing (huffman_gpu_encoder.cu:114-125) and its RST
append (:491-493).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def n_levels_for(T: int) -> int:
    """Number of merge levels to reduce T buffers to one."""
    n, lv = T, 0
    while n > 1:
        n = (n + 1) // 2
        lv += 1
    return lv


def worst_caps(T: int, max_token_bits: int = 27) -> Tuple[int, ...]:
    """Content-independent per-level word capacities (true worst case)."""
    caps = []
    total = T * max_token_bits
    for lv in range(1, n_levels_for(T) + 1):
        caps.append(-(-min((1 << lv) * max_token_bits, total) // 32))
    return tuple(caps)


def _shift_axis(buf: jnp.ndarray, w: int, axis: int) -> jnp.ndarray:
    """Shift `buf` along `axis` by a STATIC w positions (zero fill at 0)."""
    if w == 0:
        return buf
    pad_shape = list(buf.shape)
    pad_shape[axis] = w
    pad = jnp.zeros(pad_shape, buf.dtype)
    kept = jax.lax.slice_in_dim(buf, 0, buf.shape[axis] - w, axis=axis)
    return jnp.concatenate([pad, kept], axis=axis)


def _bitstream_shift(buf: jnp.ndarray, shift: jnp.ndarray, word_axis: int,
                     max_words: int) -> jnp.ndarray:
    """Shift each bitstream right by a dynamic per-buffer bit count.

    buf:   uint32 with words along `word_axis`, MSB-first
    shift: int32 broadcastable to buf minus word_axis
    """
    sh = jnp.expand_dims(shift, word_axis)
    r = (sh & 31).astype(jnp.uint32)
    hi = buf >> r
    prev = _shift_axis(buf, 1, word_axis)
    carry = jnp.where(r == 0, jnp.uint32(0), prev << (jnp.uint32(32) - r))
    buf = hi | carry
    w = (sh >> 5).astype(jnp.int32)
    K = buf.shape[word_axis]
    step = 1
    while step <= min(max_words, K - 1):
        moved = _shift_axis(buf, step, word_axis)
        buf = jnp.where((w & step) != 0, moved, buf)
        step *= 2
    return buf


def _pad_axis_to(buf: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    cur = buf.shape[axis]
    if cur >= size:
        return buf
    pad_shape = list(buf.shape)
    pad_shape[axis] = size - cur
    return jnp.concatenate([buf, jnp.zeros(pad_shape, buf.dtype)], axis=axis)


def _planes_shift(planes, shift, max_words: int):
    """Bitstream right-shift of buffers stored as a LIST of (R, N) word
    planes (word w of every buffer lives in planes[w]).  TPU-friendly: no
    small sublane/minor dims to pad; the word axis is the Python list."""
    K = len(planes)
    r = (shift & 31).astype(jnp.uint32)
    rz = r == 0
    carry_sh = jnp.uint32(32) - jnp.where(rz, jnp.uint32(1), r)
    out = []
    for i in range(K):
        hi = planes[i] >> r
        if i > 0:
            c = jnp.where(rz, jnp.uint32(0), planes[i - 1] << carry_sh)
            hi = hi | c
        out.append(hi)
    w = (shift >> 5).astype(jnp.int32)
    step = 1
    while step <= min(max_words, K - 1):
        moved = ([jnp.zeros_like(out[0])] * step) + out[:-step]
        sel = (w & step) != 0
        out = [jnp.where(sel, m, o) for m, o in zip(moved, out)]
        step *= 2
    return out


def pack_rows_merge(bits: jnp.ndarray, lens: jnp.ndarray,
                    caps: Optional[Sequence[int]] = None,
                    max_token_bits: int = 27):
    """Pack each row of (bits, len) tokens into one MSB-first bitstream.

    bits: (R, T) uint32 right-aligned codewords; lens: (R, T) int32.
    caps: per-level word capacities (see worst_caps); levels whose realized
    need exceeds cap*32 produce truncated garbage that the caller detects
    via level_need and retries with grown capacities.

    Buffers live as LISTS of (R, N) word planes while the buffer count N is
    large (no padding waste on small word counts — TPU pads the minor dim
    to 128 lanes and the sublane dim to 8), switching to a packed
    (R, N, K) array once N is small and K large.

    Returns (words, row_bits, level_need):
      words:     (R, K_final) uint32 packed rows
      row_bits:  (R,) int32 true bit length per row
      level_need: (n_levels,) int32 max buffer bits realized at each level
    """
    R, T = bits.shape
    levels = n_levels_for(T)
    if caps is None:
        caps = worst_caps(T, max_token_bits)
    assert len(caps) >= levels, (len(caps), levels)

    row_bits = jnp.sum(lens, axis=1, dtype=jnp.int32)

    # level-0: one word plane
    lvl0 = (bits << jnp.clip(32 - lens, 0, 31).astype(jnp.uint32))
    planes = [jnp.where(lens >= 32, bits, lvl0)]
    blen = lens
    N = T
    packed = None           # (R, N, K) once switched
    needs: List[jnp.ndarray] = []

    for lv in range(1, levels + 1):
        K_new = int(caps[lv - 1])
        M = (N + 1) // 2
        theory_w = ((1 << (lv - 1)) * max_token_bits) >> 5
        if N % 2:
            blen = jnp.pad(blen, ((0, 0), (0, 1)))
        la = blen[:, 0::2]
        lb = blen[:, 1::2]

        if packed is None:
            if N % 2:
                planes = [jnp.pad(p, ((0, 0), (0, 1))) for p in planes]
            a = [p[:, 0::2] for p in planes]
            b = [p[:, 1::2] for p in planes]
            z = jnp.zeros_like(a[0])
            a = a + [z] * (K_new - len(a)) if len(a) < K_new else a[:K_new]
            b = b + [z] * (K_new - len(b)) if len(b) < K_new else b[:K_new]
            b = _planes_shift(b, la, min(theory_w, K_new - 1))
            planes = [x | y for x, y in zip(a, b)]
        else:
            if N % 2:
                packed = _pad_axis_to(packed, N + 1, 1)
            a = _pad_axis_to(packed[:, 0::2, :], K_new, 2)
            b = _pad_axis_to(packed[:, 1::2, :], K_new, 2)
            b = _bitstream_shift(b, la, 2, min(theory_w, K_new - 1))
            packed = a | b
        blen = la + lb
        needs.append(jnp.max(blen).astype(jnp.int32))
        N = M
        # switch to packed (R, N, K) once buffers outnumber... i.e. when the
        # word count exceeds the remaining buffer count
        if packed is None and K_new > max(N, 32):
            packed = jnp.stack(planes, axis=2)
            planes = None

    if packed is not None:
        words = packed[:, 0, :]
    else:
        words = jnp.stack([p[:, 0] for p in planes], axis=1)
    return words, row_bits, jnp.stack(needs)


def level_needs(lens: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Per-level max merged-buffer bits, directly from token lengths:
    level L's buffers are consecutive groups of 2^L tokens, so the need is
    max over groups of the group sum (identical for any pairing order —
    used by the fused Pallas packer, which doesn't track needs itself)."""
    R, T = lens.shape
    T2 = 1 << max(1, (T - 1).bit_length())
    s = jnp.pad(lens, ((0, 0), (0, T2 - T))).astype(jnp.int32)
    needs = []
    for _ in range(levels):
        s = s.reshape(R, s.shape[1] // 2, 2).sum(axis=2)
        needs.append(jnp.max(s).astype(jnp.int32))
    return jnp.stack(needs)


def or_pad_bits(words: jnp.ndarray, row_bits: jnp.ndarray) -> jnp.ndarray:
    """OR 1-bits from each row's true end to its next byte boundary
    (F.1.2.3 pad), without a scatter: build the per-row pad pattern from an
    iota comparison."""
    R, K = words.shape
    pad = ((-row_bits) % 8).astype(jnp.uint32)
    wi = (row_bits >> 5)[:, None]
    bo = (row_bits & 31).astype(jnp.uint32)[:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    # mask of `pad` 1-bits starting at bit offset bo (MSB-first) in word wi;
    # the run never crosses a word boundary (bo+pad <= 32: pad>0 only when
    # bo%8 != 0, and pad fills to the next byte)
    ones = jnp.where(pad[:, None] == 0, jnp.uint32(0),
                     ((jnp.uint32(1) << pad[:, None]) - 1)
                     << (jnp.uint32(32) - bo - pad[:, None]))
    return words | jnp.where(col == wi, ones, 0)


def stuff_rows(words: jnp.ndarray, row_bytes: jnp.ndarray,
               rst_marker: np.ndarray,
               caps: Optional[Sequence[int]] = None):
    """Byte-stuff packed rows and append restart markers, as a second merge
    tree over byte tokens (0xFF emits 16 bits 0xFF00; the RST marker is a
    trailing 16-bit token; invalid tail bytes emit nothing).

    words:      (R, K) uint32 packed+padded rows
    row_bytes:  (R,) int32 valid byte count per row
    rst_marker: (R,) uint8 static: 0xD0+n after this row, 0 = none

    Returns (stuffed_words, stuffed_bytes, level_need).
    """
    R, K = words.shape
    by = jnp.stack([(words >> 24) & 0xFF, (words >> 16) & 0xFF,
                    (words >> 8) & 0xFF, words & 0xFF],
                   axis=-1).reshape(R, K * 4).astype(jnp.uint32)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, K * 4), 1)
    valid = col < row_bytes[:, None]
    is_ff = valid & (by == 0xFF)
    tok_bits = jnp.where(is_ff, jnp.uint32(0xFF00), by)
    tok_lens = jnp.where(is_ff, 16, jnp.where(valid, 8, 0))

    rst = jnp.asarray(rst_marker).astype(jnp.uint32)
    rst_bits = (jnp.uint32(0xFF00) | rst)[:, None]
    rst_lens = jnp.where(rst[:, None] != 0, 16, 0)
    tok_bits = jnp.concatenate([tok_bits, rst_bits], axis=1)
    tok_lens = jnp.concatenate([tok_lens, rst_lens], axis=1)

    out, out_bits, need = pack_rows_merge(tok_bits, tok_lens.astype(jnp.int32),
                                          caps=caps, max_token_bits=16)
    return out, (out_bits >> 3), need


def stuff_caps(K4: int) -> Tuple[int, ...]:
    """Worst-case cap schedule for the stuffing tree over K4+1 byte tokens."""
    return worst_caps(K4 + 1, 16)


def stuff_rows_roll(words: jnp.ndarray, row_bytes: jnp.ndarray,
                    rst_marker, z_cap: int):
    """Byte-stuff packed rows + append restart markers, as a small
    roll-select chain (replaces the 16-bit-token merge tree, which was
    sized by the densest row and dominated the encode).

    A row's output byte q is either a stuffed 0x00 or source byte
    q - z(q), where z(q) counts stuffed zeros before q — and z is tiny
    (~bytes/256).  Stuffed positions are marked with ONE sparse scatter
    (~n/256 elements), z comes from a row cumsum, and the source lookup is
    a select chain over z_cap static rolls.  Content-adaptive z_cap with
    overflow signalling, like the merge-tree capacities.

    words:      (R, K) uint32 packed+padded rows
    row_bytes:  (R,) int32 valid byte count per row
    rst_marker: (R,) uint8/uint32 static or traced; 0 = no marker
    z_cap:      static max stuffed zeros per row handled

    Returns (rows_u32, out_bytes, max_z): stuffed rows as
    (R, ceil((4K + z_cap + 2)/4)) uint32, per-row byte counts (marker
    included), and the realized max per-row stuffed count for overflow
    detection (valid iff max_z <= z_cap).
    """
    R, K = words.shape
    n_in = K * 4
    by = jnp.stack([(words >> 24) & 0xFF, (words >> 16) & 0xFF,
                    (words >> 8) & 0xFF, words & 0xFF],
                   axis=-1).reshape(R, n_in).astype(jnp.uint8)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, n_in), 1)
    valid = col < row_bytes[:, None]
    is_ff = valid & (by == 0xFF)
    # int32 cumsum: a row with >32767 0xFF bytes (restart_interval=0 on a
    # large frame) would wrap int16 and corrupt the overflow check itself
    ffx_incl = jnp.cumsum(is_ff.astype(jnp.int32), axis=1)
    nff = ffx_incl[:, -1]
    max_z = jnp.max(nff)

    K_out4 = n_in + ((z_cap + 2 + 3) // 4) * 4
    BIG = jnp.int32(K_out4 + 7)

    # output position of the k-th stuffed zero, as ONE masked row-reduction
    # per k (no scatter: an XLA scatter visits every index slot, ~10ns each)
    n_rolls = min(z_cap, n_in)
    pos = []
    for k in range(1, n_rolls + 1):
        m = is_ff & (ffx_incl == k)
        p = jnp.sum(jnp.where(m, col + k, 0), axis=1)
        pos.append(jnp.where(nff >= k, p, BIG))
    # z(q) counts stuffed zeros at positions < q... inclusive at q
    qcol0 = jax.lax.broadcasted_iota(jnp.int32, (R, K_out4), 1)
    z = jnp.zeros((R, K_out4), jnp.int16)
    stuffed = jnp.zeros((R, K_out4), jnp.bool_)
    for k in range(n_rolls):
        z = z + (qcol0 >= pos[k][:, None]).astype(jnp.int16)
        stuffed = stuffed | (qcol0 == pos[k][:, None])

    src = jnp.pad(by, ((0, 0), (0, K_out4 - n_in)))
    out = jnp.zeros((R, K_out4), jnp.uint8)
    rolled = src
    for k in range(n_rolls + 1):
        if k > 0:
            rolled = jnp.concatenate(
                [jnp.zeros((R, 1), jnp.uint8), rolled[:, :-1]], axis=1)
        out = jnp.where(z == k, rolled, out)
    out = jnp.where(stuffed, jnp.uint8(0), out)

    # restart markers after the stuffed payload
    end_out = row_bytes + nff
    qcol = jax.lax.broadcasted_iota(jnp.int32, (R, K_out4), 1)
    rst = jnp.asarray(rst_marker).astype(jnp.uint8)
    has = (rst != 0)[:, None]
    out = jnp.where(has & (qcol == end_out[:, None]), jnp.uint8(0xFF), out)
    out = jnp.where(has & (qcol == end_out[:, None] + 1), rst[:, None], out)
    marker_len = jnp.where(has[:, 0], 2, 0).astype(jnp.int32)
    out = jnp.where(qcol >= (end_out + marker_len)[:, None],
                    jnp.uint8(0), out)
    out_bytes = end_out + marker_len

    # pack back to big-endian words
    o = out.reshape(R, K_out4 // 4, 4).astype(jnp.uint32)
    rows = ((o[:, :, 0] << 24) | (o[:, :, 1] << 16)
            | (o[:, :, 2] << 8) | o[:, :, 3])
    return rows, out_bytes, max_z
