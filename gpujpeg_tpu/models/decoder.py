"""Decoder session: the TPU-native equivalent of gpujpeg_decoder.

Host parses markers + splits/unstuffs segments (stream/reader.py,
stream/segments.py); the device runs the segment-parallel Huffman decode
while-loop, dequant+IDCT matmuls, and the postprocessor.

Mirrors gpujpeg_decoder_decode (src/gpujpeg_decoder.c:234-452) with lazy
per-stream-geometry jit caches standing in for gpujpeg_decoder_init.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct, huffdec, sample
from ..stream import reader, segments as segprep
from ..types import (ColorSpace, CorruptStreamError, ImageInfo,
                     ImageParameters, PixelFormat)
from ..utils import tables
from ..utils.geometry import Geometry, get_geometry


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def default_output(ps: reader.ParsedStream) -> ImageParameters:
    """Default output: interleaved RGB (or U8 for grayscale), like the
    reference CLI default (gpujpeg_decoder.c output selection)."""
    if ps.comp_count == 1:
        pf, cs = PixelFormat.U8, ColorSpace.NONE
    elif ps.comp_count == 4:
        pf, cs = PixelFormat.P4444_U8_P0123, ColorSpace.RGB
    else:
        pf, cs = PixelFormat.P444_U8_P012, ColorSpace.RGB
    return ImageParameters(width=ps.width, height=ps.height,
                           color_space=cs, pixel_format=pf)


@functools.lru_cache(maxsize=16)
def _make_idct_post_fn(geo: Geometry):
    """jit: (coefs_rows_flat, qtabs) -> output image."""
    out_pi = geo.param_image

    def fn(coefs_flat, qtabs):
        planes = []
        for c in geo.components:
            rowpos = geo.storage_to_rowpos[
                geo.comp_block_base[c.index]: geo.comp_block_base[c.index + 1]]
            comp_coefs = coefs_flat[jnp.asarray(rowpos)]
            plane = dct.dequantize_idct_traced(
                comp_coefs, qtabs[c.index], c.data_height, c.data_width)
            planes.append(plane)
        return sample.postprocess(planes, geo, out_pi)

    return jax.jit(fn)


class Decoder:
    """Persistent decoder session (create once, decode many streams)."""

    def __init__(self) -> None:
        self._fns: Dict = {}

    def decode(self, data: bytes,
               param_image: Optional[ImageParameters] = None) -> np.ndarray:
        ps = reader.parse(data)
        if not ps.scans:
            raise CorruptStreamError("no scan in stream")
        param = reader.parsed_to_parameters(ps)
        defaults = default_output(ps)
        out_pi = param_image or defaults
        # resolve unset fields from the stream defaults (the reference's
        # pseudo-format handling, gpujpeg_reader.c:1507-1616)
        if out_pi.pixel_format == PixelFormat.NONE:
            out_pi = out_pi.with_(pixel_format=defaults.pixel_format)
        if out_pi.color_space == ColorSpace.NONE and \
                defaults.color_space != ColorSpace.NONE:
            out_pi = out_pi.with_(color_space=defaults.color_space)
        out_pi = out_pi.with_(width=ps.width, height=ps.height)
        geo = get_geometry(param, out_pi)

        # ---- flatten scan segments in global segment order ----------------
        ranges = [r for scan in ps.scans for r in scan.segments]
        if len(ranges) != geo.segment_count:
            raise CorruptStreamError(
                f"segment count mismatch: stream has {len(ranges)}, "
                f"geometry expects {geo.segment_count}")
        nseg = geo.segment_count
        max_seg_bytes = max((en - st) for st, en in ranges)
        max_words = _bucket((max_seg_bytes + 3) // 4)
        words, nbits = segprep.pack_segments_matrix(ps.data, ranges, max_words)

        # ---- per-block table maps ------------------------------------------
        comp_dc = np.zeros(geo.comp_count, np.int32)
        comp_ac = np.zeros(geo.comp_count, np.int32)
        for scan in ps.scans:
            for ci, d, a in zip(scan.comp_indices, scan.dc_table,
                                scan.ac_table):
                comp_dc[ci], comp_ac[ci] = d, a
        # stack decode LUTs: DC tables first, then AC
        dc_ids = sorted(ps.huff_dc)
        ac_ids = sorted(ps.huff_ac)
        lut = np.stack(
            [tables.huffman_decode_lut16(*ps.huff_dc[i]) for i in dc_ids]
            + [tables.huffman_decode_lut16(*ps.huff_ac[i]) for i in ac_ids])
        dc_slot = {i: k for k, i in enumerate(dc_ids)}
        ac_slot = {i: len(dc_ids) + k for k, i in enumerate(ac_ids)}

        rows = geo.seg_rows  # (nseg, max_bps) -> stream block or -1
        valid = rows >= 0
        comp_of_block = np.where(valid, geo.stream_comp[np.maximum(rows, 0)], 0)
        dc_tab = np.vectorize(lambda c: dc_slot[int(comp_dc[c])])(
            comp_of_block).astype(np.int32)
        ac_tab = np.vectorize(lambda c: ac_slot[int(comp_ac[c])])(
            comp_of_block).astype(np.int32)
        blocks_per_seg = valid.sum(axis=1).astype(np.int32)
        max_bps = geo.max_blocks_per_seg
        max_iters = max_bps * 65 + 2

        coefs_flat, err = huffdec.decode_segments(
            jnp.asarray(words), jnp.asarray(nbits),
            jnp.asarray(blocks_per_seg),
            jnp.asarray(dc_tab), jnp.asarray(ac_tab),
            jnp.asarray(comp_of_block.astype(np.int32)),
            jnp.asarray(lut),
            max_bps=max_bps, max_iters=max_iters)
        coefs_flat = coefs_flat.reshape(nseg * max_bps, 64)

        qtabs = np.stack([
            ps.quant_tables[ps.quant_map[c.index]]
            for c in geo.components
        ]).astype(np.float32)

        fn = _make_idct_post_fn(geo)
        out = fn(coefs_flat, jnp.asarray(qtabs))
        err_np = np.asarray(err)
        if err_np.any():
            import logging
            logging.getLogger("gpujpeg_tpu").warning(
                "%d corrupt segment(s) during Huffman decode",
                int(err_np.sum()))
        return np.asarray(out)

    def get_image_info(self, data: bytes) -> ImageInfo:
        return reader.get_image_info(data)
