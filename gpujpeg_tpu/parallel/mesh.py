"""Device mesh construction for frame- and segment-sharded coding.

The reference is single-GPU (gpujpeg_init_device selects ONE device,
gpujpeg_common.c:220-288); scaling beyond one chip is new capability in the
TPU build.  Two mesh axes:

  'data': frames of a batch (embarrassingly parallel, DCN-friendly)
  'seg':  restart segments of one frame (the JPEG analogue of sequence
          parallelism; ICI-friendly, byte counts all-gathered for stitching)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              seg: int = 1) -> Mesh:
    """Build a ('data', 'seg') mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if data is None:
        data = n_devices // seg
    assert data * seg == n_devices, (data, seg, n_devices)
    arr = np.asarray(devs).reshape(data, seg)
    return Mesh(arr, ("data", "seg"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-frames arrays: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
