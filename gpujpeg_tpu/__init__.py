"""gpujpeg_tpu: TPU-native baseline-JPEG codec (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of CESNET/GPUJPEG for TPU:
restart-segment-parallel Huffman coding, MXU-matmul DCT, XLA-fused
pre/postprocessing, and mesh-sharded batch encoding.
"""

__version__ = "0.1.0"

from .jaxinit import ensure_cache as _ensure_cache

_ensure_cache()

from .types import (  # noqa: F401
    ColorSpace,
    HeaderType,
    ImageInfo,
    ImageParameters,
    Parameters,
    PixelFormat,
    RESTART_AUTO,
    RESTART_NONE,
    SamplingFactor,
    default_image_parameters,
    default_parameters,
)

from .models.encoder import Encoder  # noqa: F401
from .models.decoder import Decoder  # noqa: F401
