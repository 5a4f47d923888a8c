"""Multi-host execution path (parallel.dist): routing unit tests with
injected process maps, plus REAL 2-process CPU runs (jax.distributed +
Gloo collectives, 4 virtual devices per process) exercising
BatchEncoder.encode_batch_local / BatchDecoder.decode_batch_local end
to end — outputs must be byte-identical to the single-process encoder.

This is BASELINE's >= 80 % multi-host frames/s scaling axis; the
reference is single-GPU (gpujpeg_common.c:220-288), so everything here
is new capability.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from gpujpeg_tpu.parallel import dist
from gpujpeg_tpu.parallel.mesh import make_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# -- routing math (unit, injected process maps) ---------------------------

def test_data_rows_of_process_injected():
    mesh = make_mesh(8, data=4, seg=2)
    # fake 2 processes: devices 0-3 -> p0, 4-7 -> p1 (process-major,
    # the order jax.devices() guarantees)
    devs = list(np.asarray(mesh.devices).reshape(-1))
    proc = {d: (0 if i < 4 else 1) for i, d in enumerate(devs)}
    rows0 = dist.data_rows_of_process(mesh, 0, proc_of=proc.get)
    rows1 = dist.data_rows_of_process(mesh, 1, proc_of=proc.get)
    assert rows0 == [0, 1] and rows1 == [2, 3]


def test_data_rows_rejects_split_row():
    mesh = make_mesh(8, data=2, seg=4)
    devs = list(np.asarray(mesh.devices).reshape(-1))
    # a 'seg' row torn across processes must be rejected
    proc = {d: (i % 2) for i, d in enumerate(devs)}
    with pytest.raises(ValueError, match="spans processes"):
        dist.data_rows_of_process(mesh, 0, proc_of=proc.get)


def test_local_frame_indices_injected():
    mesh = make_mesh(8, data=4, seg=2)
    devs = list(np.asarray(mesh.devices).reshape(-1))
    proc = {d: (0 if i < 4 else 1) for i, d in enumerate(devs)}
    assert dist.local_frame_indices(mesh, 8, 0, proc.get) == [0, 1, 2, 3]
    assert dist.local_frame_indices(mesh, 8, 1, proc.get) == [4, 5, 6, 7]
    with pytest.raises(ValueError, match="not divisible"):
        dist.local_frame_indices(mesh, 6, 0, proc.get)


def test_make_global_mesh_single_process():
    mesh = dist.make_global_mesh(seg=2)
    assert mesh.shape == {"data": 4, "seg": 2}
    with pytest.raises(ValueError, match="divide"):
        dist.make_global_mesh(seg=3)


def test_single_process_degradation():
    """encode_batch_local == encode_batch on one process."""
    from gpujpeg_tpu import Parameters
    from gpujpeg_tpu.parallel.batch import BatchEncoder
    from gpujpeg_tpu.types import (ColorSpace, ImageParameters,
                                   PixelFormat)

    mesh = make_mesh(4, data=4, seg=1)
    pi = ImageParameters(width=48, height=64, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    be = BatchEncoder(mesh, Parameters(quality=85, restart_interval=2), pi)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (4, 64, 48, 3), np.uint8)
    streams, idx = be.encode_batch_local(list(frames))
    assert idx == [0, 1, 2, 3]
    want = be.encode_batch(frames)
    assert [bytes(s) for s in streams] == [bytes(s) for s in want]


# -- real 2-process runs --------------------------------------------------

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2])
    port = sys.argv[3]; outdir = sys.argv[4]; seg = int(sys.argv[5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from gpujpeg_tpu.parallel import dist
    dist.initialize(f"127.0.0.1:{{port}}", nproc, pid)
    assert jax.process_count() == nproc
    import numpy as np
    from gpujpeg_tpu import Decoder, Encoder, Parameters
    from gpujpeg_tpu.parallel.batch import BatchDecoder, BatchEncoder
    from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat

    def frame(i):
        rng = np.random.default_rng(100 + i)
        return rng.integers(0, 256, (64, 48, 3), np.uint8)

    pi = ImageParameters(width=48, height=64,
                         color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    param = Parameters(quality=85, restart_interval=2)

    mesh = dist.make_global_mesh(seg=seg)
    B = mesh.shape["data"]
    idx = dist.local_frame_indices(mesh, B)
    be = BatchEncoder(mesh, param, pi)
    streams, got = be.encode_batch_local([frame(i) for i in idx])
    assert got == idx, (got, idx)
    for b, s in zip(got, streams):
        with open(os.path.join(outdir, f"enc_{{b:03d}}.jpg"), "wb") as f:
            f.write(s)

    # decode the same frames' streams back through the multi-host path
    # (seg=1 mesh: decode has no segment axis)
    if seg == 1:
        ex = bytes(Encoder().encode(frame(0), param, pi))
        mesh_d = dist.make_global_mesh(seg=1)
        bd = BatchDecoder(mesh_d, ex, B)
        my_streams = [bytes(Encoder().encode(frame(i), param, pi))
                      for i in idx]
        imgs, got_d = bd.decode_batch_local(my_streams)
        assert got_d == idx
        for b, img in zip(got_d, imgs):
            np.save(os.path.join(outdir, f"dec_{{b:03d}}.npy"),
                    np.asarray(img))
    print("WORKER_OK", pid, flush=True)
""")


def _run_two_procs(tmp_path, seg: int):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO))
    outdir = tmp_path / "out"
    outdir.mkdir()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port),
         str(outdir), str(seg)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out
    return outdir


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_encode_matches_single(tmp_path):
    """2 real processes x 4 CPU devices, data=8 seg=1: every frame's
    stream must be byte-identical to the single-process Encoder."""
    from gpujpeg_tpu import Decoder, Encoder, Parameters
    from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat

    outdir = _run_two_procs(tmp_path, seg=1)
    pi = ImageParameters(width=48, height=64, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    param = Parameters(quality=85, restart_interval=2)
    enc = Encoder()
    n = 0
    for b in range(8):
        p = outdir / f"enc_{b:03d}.jpg"
        if not p.exists():
            continue
        n += 1
        rng = np.random.default_rng(100 + b)
        frame = rng.integers(0, 256, (64, 48, 3), np.uint8)
        want = bytes(enc.encode(frame, param, pi))
        assert p.read_bytes() == want, f"frame {b} differs"
        d = outdir / f"dec_{b:03d}.npy"
        assert d.exists(), f"decode output {b} missing"
        got = np.load(d)
        ref = np.asarray(Decoder().decode(want))
        assert np.array_equal(got, ref), f"decoded frame {b} differs"
    assert n == 8, f"expected 8 encoded frames, found {n}"


@pytest.mark.slow
def test_two_process_seg_sharded_encode(tmp_path):
    """data=2 x seg=4 across 2 processes: one frame per 'data' row,
    its stripes over 4 intra-process devices — still byte-identical."""
    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.types import ColorSpace, ImageParameters, PixelFormat

    outdir = _run_two_procs(tmp_path, seg=4)
    pi = ImageParameters(width=48, height=64, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    param = Parameters(quality=85, restart_interval=2)
    enc = Encoder()
    n = 0
    for b in range(2):
        p = outdir / f"enc_{b:03d}.jpg"
        assert p.exists(), f"frame {b} missing"
        n += 1
        rng = np.random.default_rng(100 + b)
        frame = rng.integers(0, 256, (64, 48, 3), np.uint8)
        want = bytes(enc.encode(frame, param, pi))
        assert p.read_bytes() == want, f"frame {b} differs"
    assert n == 2
