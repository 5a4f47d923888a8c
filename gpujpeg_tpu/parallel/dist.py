"""Multi-host (multi-process) execution scaffolding.

BASELINE's north star demands >= 80 % frames/s scaling to N >= 2 HOSTS.
The reference has no multi-device story at all (single-GPU select,
gpujpeg_common.c:220-288) — this axis is new capability.  The JAX
runtime makes a multi-host TPU slice look like one global device mesh
(SPMD over ICI + DCN); what this module adds is the process-local
plumbing around it:

  * initialize()            — jax.distributed bring-up (args or env)
  * make_global_mesh()      — ('data', 'seg') mesh over ALL processes'
                              devices, with 'seg' constrained to the
                              minor, intra-host axis: segment shards of
                              one frame ride ICI, frames ride DCN (the
                              scaling-book layout — collectives stay on
                              the fast fabric, the embarrassingly
                              parallel axis crosses hosts)
  * data_rows_of_process()  — which mesh 'data' rows this process owns
  * local_frame_indices()   — which global frames this process feeds
  * local_block() / assemble helpers — host-local input assembly and
                              output extraction via addressable shards

Frame routing is fully local: every frame's ('data' row x all 'seg')
device block belongs to exactly one process, so batch encode/decode
needs NO cross-host data movement — only the tiny capacity-needs
vector is allgathered (multihost_utils) so every process takes the
same sticky-caps growth decision.  That locality is what makes the
>= 80 % linear frames/s scaling target structural rather than
aspirational.

Everything here degrades to the single-process behavior when
jax.process_count() == 1, so the whole suite runs unchanged on one
process; tests/test_multihost.py additionally spawns REAL 2-process
Gloo-backed CPU runs to execute this path for real.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (idempotent).

    Explicit args win; otherwise GPUJPEG_TPU_COORDINATOR /
    GPUJPEG_TPU_NUM_PROCESSES / GPUJPEG_TPU_PROCESS_ID env vars; on TPU
    pods jax.distributed.initialize() also self-discovers with no args.
    A no-op when none of those are present (single-process run)."""
    import jax

    global _INITIALIZED
    if _INITIALIZED:
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("GPUJPEG_TPU_COORDINATOR")
    if num_processes is None and "GPUJPEG_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GPUJPEG_TPU_NUM_PROCESSES"])
    if process_id is None and "GPUJPEG_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GPUJPEG_TPU_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)
    _INITIALIZED = True


def make_global_mesh(seg: int = 1):
    """('data', 'seg') mesh over the GLOBAL device list.

    'seg' must divide the per-process device count so that every frame's
    segment shards stay intra-host (jax.devices() orders devices
    process-major, so reshaping (data, seg) with seg minor puts each
    row's seg block inside one process)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n_local = len(jax.local_devices())
    if n_local % seg:
        raise ValueError(
            f"seg={seg} must divide the per-process device count "
            f"{n_local} so segment shards of a frame stay intra-host")
    data = len(devs) // seg
    return Mesh(np.asarray(devs).reshape(data, seg), ("data", "seg"))


def _default_proc_of(d) -> int:
    return d.process_index


def data_rows_of_process(mesh, process_index: Optional[int] = None,
                         proc_of: Optional[Callable] = None) -> List[int]:
    """Sorted 'data' coordinates whose device rows belong to this
    process.  proc_of is injectable so the routing math is unit-testable
    without real multi-process runs; a row split across processes (a
    layout make_global_mesh never produces) is an error."""
    import jax

    if process_index is None:
        process_index = jax.process_index()
    proc_of = proc_of or _default_proc_of
    devs = np.asarray(mesh.devices)
    rows = []
    for r in range(devs.shape[0]):
        procs = {proc_of(d) for d in devs[r].reshape(-1)}
        if len(procs) > 1:
            raise ValueError(
                f"mesh 'data' row {r} spans processes {sorted(procs)}; "
                "build the mesh with make_global_mesh so 'seg' stays "
                "intra-host")
        if procs == {process_index}:
            rows.append(r)
    return rows


def local_frame_indices(mesh, batch_size: int,
                        process_index: Optional[int] = None,
                        proc_of: Optional[Callable] = None) -> List[int]:
    """Global indices of the frames THIS process feeds for a batch of
    batch_size frames sharded P('data') over the mesh (contiguous
    per-row blocks of batch_size / data_extent frames)."""
    data = mesh.shape["data"]
    if batch_size % data:
        raise ValueError(f"batch_size {batch_size} not divisible by the "
                         f"mesh 'data' extent {data}")
    per = batch_size // data
    out: List[int] = []
    for r in data_rows_of_process(mesh, process_index, proc_of):
        out.extend(range(r * per, (r + 1) * per))
    return out


def make_global_batch(mesh, spec, local_frames: np.ndarray,
                      global_batch: int):
    """Assemble the global sharded batch array from THIS process's
    frames (stacked in local_frame_indices order)."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    global_shape = (global_batch,) + tuple(local_frames.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_frames), global_shape)


def local_rows(arr, mesh, batch_size: int) -> dict:
    """{global frame index: np.ndarray} for the frames whose shards are
    addressable by this process.  arr: a (B, n_seg, ...) output sharded
    P('data', 'seg'); a frame's seg shards are intra-host by mesh
    construction, so each frame reassembles fully locally."""
    per = batch_size // mesh.shape["data"]
    n_seg = mesh.shape["seg"]
    parts: dict = {}
    for s in arr.addressable_shards:
        idx = s.index
        b0 = idx[0].start or 0
        b1 = idx[0].stop if idx[0].stop is not None else batch_size
        g0 = (idx[1].start or 0) if len(idx) > 1 else 0
        parts.setdefault((b0, b1), {})[g0] = np.asarray(s.data)
    out: dict = {}
    for (b0, b1), segs in parts.items():
        blocks = [segs[k] for k in sorted(segs)]
        whole = np.concatenate(blocks, axis=1) if len(blocks) > 1 \
            else blocks[0]
        for i, b in enumerate(range(b0, b1)):
            out[b] = whole[i]
    return out


def local_batch(arr, batch_size: int) -> dict:
    """{global frame index: np.ndarray} for a P('data')-sharded output
    with no 'seg' axis (e.g. decoded images)."""
    out: dict = {}
    for s in arr.addressable_shards:
        b0 = s.index[0].start or 0
        d = np.asarray(s.data)
        for i in range(d.shape[0]):
            out[b0 + i] = d[i]
    return out


def allgather_max(x) -> np.ndarray:
    """Elementwise max of a small per-process vector across processes
    (identity on one process).  Used for the sticky-caps needs vector so
    every process grows capacities identically."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray(x))
    return np.max(g, axis=0)
