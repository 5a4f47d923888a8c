"""Decoder session: the TPU-native equivalent of gpujpeg_decoder.

Host parses markers + splits segments (stream/reader.py), the device runs the
segment-parallel Huffman decode while-loop, dequant+IDCT matmuls, and the
postprocessor (ops/huffdec.py, ops/dct.py, ops/sample.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..types import ImageInfo, ImageParameters


class Decoder:
    """Persistent decoder session (placeholder until ops.huffdec lands)."""

    def __init__(self) -> None:
        self._fns = {}

    def decode(self, data: bytes,
               param_image: Optional[ImageParameters] = None) -> np.ndarray:
        raise NotImplementedError("decoder under construction")

    def get_image_info(self, data: bytes) -> ImageInfo:
        from ..stream import reader
        return reader.get_image_info(data)
