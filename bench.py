#!/usr/bin/env python
"""Benchmark matrix vs GPUJPEG's published numbers (README.md:106-161).

Headline (the driver-recorded JSON line): 8K (7680x4320, 33 Mpix) RGB Q75
encode, DEVICE pipeline ms/frame — comparable to the reference's "without
PCIe transfers" 8K figure (RTX 3080: ~2.45 ms interpolated at Q75,
README.md:128).  The full matrix (encode HD/4K/8K/16K, decode HD/8K,
quality sweep at 8K) lands in BENCH_MATRIX.json and on stderr.

Method: ONE process; a sacrificial fetch first (the first device->host
fetch through this rig's tunnel takes minutes and degrades dispatch to
~1.8 s/step — constants that the DELTA method cancels exactly), then for
each config N serialized iterations inside one jit program (each
perturbed by the previous result to force sequential execution), fetch
one element, and report the wall-clock delta between N values.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} (plus a
"matrix" key with the full table).
"""

import functools
import json
import os
import sys
import time

import numpy as np

DEADLINE = float(os.environ.get("BENCH_DEADLINE", "3300"))
T_START = time.time()

BASELINES = {
    # RTX 3080 ms/frame, README.md:110-115 (encode, with PCIe),
    # :128 (encode w/o PCIe), :145 (decode, with PCIe)
    "encode_hd": 0.54, "encode_4k": 1.71, "encode_8k": 6.20,
    "encode_16k": 24.48,
    "encode_8k_device": 2.45,          # w/o PCIe, Q75 interpolated
    "encode_8k_q10_device": 2.13, "encode_8k_q90_device": 2.50,
    "encode_8k_q100_device": 5.01,
    "decode_hd": 0.75, "decode_8k": 6.76,
}

SIZES = {"hd": (1080, 1920), "4k": (2160, 3840), "8k": (4320, 7680),
         "16k": (8640, 15360)}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def left(): return DEADLINE - (time.time() - T_START)


def synth_frame(h, w, seed=7):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    f = gen(jax.random.PRNGKey(seed))
    jax.block_until_ready(f)
    return f


def delta_time(loop, args, n_hi=9, reps=3):
    """ms per iteration via the delta method (fetch-based)."""
    times = {}
    for n in (1, n_hi):
        _ = np.asarray(loop(*args, n))          # compile this n
        best = float("inf")
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(loop(*args, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0


def bench_encode(name, h, w, quality, matrix, **pkw):
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Encoder, Parameters
    from gpujpeg_tpu.models import encoder as enc_mod

    t0 = time.time()
    frame = synth_frame(h, w)
    enc = Encoder()
    enc.segment_info = True      # -g APP13 index: the decode benches'
    # host parse then takes the O(segments) offset path (reference
    # benchmarks its fast-decode story the same way, reader.c:1167-1232)
    param = Parameters(quality=quality, restart_interval=-1, **pkw)
    # converge capacities (fetches meta; sacrificial fetch already paid)
    geo, res, meta = enc.encode_to_device(frame, param)
    caps = enc._caps[geo]
    fn = enc_mod.make_full_encode_fn(geo, caps)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(raw, n):
        def body(i, carry):
            r = fn(raw.at[0, 0, 0].set(carry))
            return r["meta"][-1].astype(jnp.uint8)

        return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

    dt = delta_time(loop, (frame,))
    gpix = h * w / dt / 1e6
    matrix[name] = {"ms": round(dt, 3), "gpix_s": round(gpix, 3),
                    "setup_s": round(time.time() - t0, 1)}
    log(f"[bench] {name}: {dt:.2f} ms/frame ({gpix:.2f} Gpix/s, "
        f"setup {time.time()-t0:.0f}s)")
    return dt, enc, geo, res, meta


def host_prep_ms(stream, reps=5):
    """Warm host-side cost per frame: marker parse + segment ranges +
    unstuffed row packing (everything decode does off-device)."""
    from gpujpeg_tpu import Decoder
    from gpujpeg_tpu.models.decoder import _bucket, resolve_output
    from gpujpeg_tpu.stream import reader
    from gpujpeg_tpu.stream import segments as segprep
    from gpujpeg_tpu.utils.geometry import get_geometry

    dec = Decoder()
    best = float("inf")
    out = None
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        ps = reader.parse(stream)
        param = reader.parsed_to_parameters(ps)
        out_pi = resolve_output(ps, None, 0)
        geo = get_geometry(param, out_pi.with_(width_padding=0))
        bounds = dec._segment_bounds(ps, geo)
        mw = _bucket((int((bounds[1] - bounds[0]).max()) + 3) // 4)
        segprep.pack_segments_matrix(ps.data, bounds, mw, out=out)
        dt = time.perf_counter() - t0
        best = min(best, dt)    # first rep pays one-time costs
        # session steady state: the Decoder reuses its staging buffer
        # (_words_scratch), so later reps measure with warm pages
        if out is None:
            out = np.empty((len(bounds[0]), (mw + 1) * 4), np.uint8)
    return best * 1000.0


def bench_decode(name, stream, matrix):
    import jax

    from gpujpeg_tpu import Decoder

    t0 = time.time()
    dec = Decoder()
    fn, words, nbits = dec.compile_stream_pipeline(stream)
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(words, nbits, n):
        def body(i, carry):
            img = fn(words.at[0, 0].set(carry.astype(jnp.uint32)), nbits)
            flat = img.reshape(-1)
            return flat[0].astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    dt = delta_time(loop, (words, nbits))
    host_ms = host_prep_ms(stream)
    matrix[name] = {"ms": round(dt, 3),
                    "host_parse_ms": round(host_ms, 2),
                    "total_ms": round(dt + host_ms, 2),
                    "setup_s": round(time.time() - t0, 1)}
    log(f"[bench] {name}: {dt:.2f} ms device + {host_ms:.1f} ms host "
        f"= {dt + host_ms:.1f} ms total (setup {time.time()-t0:.0f}s)")
    return dt


def bench_pipelined(enc, geo, frame, matrix, n_frames=6):
    """Wall-clock per-frame cost of encode() vs encode_pipelined() on
    identical frames — the overlap evidence for the double-buffered
    driver (VERDICT r3 weak item 7).  Both numbers INCLUDE host
    assembly and the device->host row fetch, so they are end-to-end
    wall times (the tunnel inflates the fetch vs a real PCIe host;
    the DELTA between the two columns is the overlap win)."""
    import jax

    from gpujpeg_tpu import Parameters

    t0 = time.time()
    param = Parameters(quality=75, restart_interval=-1)
    frames = [frame] * n_frames
    # warm both paths (compile + converge)
    _ = enc.encode(frame, param)
    list(enc.encode_pipelined(frames[:2], param))
    t1 = time.perf_counter()
    for f in frames:
        _ = enc.encode(f, param)
    seq_ms = (time.perf_counter() - t1) / n_frames * 1000.0
    t1 = time.perf_counter()
    for _s in enc.encode_pipelined(frames, param):
        pass
    pipe_ms = (time.perf_counter() - t1) / n_frames * 1000.0
    matrix["encode_8k_q75_wall"] = {
        "sequential_ms": round(seq_ms, 2),
        "pipelined_ms": round(pipe_ms, 2),
        "overlap_gain_ms": round(seq_ms - pipe_ms, 2),
        "setup_s": round(time.time() - t0, 1)}
    log(f"[bench] 8K wall: sequential {seq_ms:.1f} ms, pipelined "
        f"{pipe_ms:.1f} ms per frame (overlap {seq_ms-pipe_ms:+.1f})")


def bench_mesh_anchor(matrix):
    """8K Q75 encode through the mesh BatchEncoder on a 1x1 mesh (one
    real chip): the single-chip anchor for multi-chip scaling claims.
    Should be ~= the plain single-chip pipeline (same megakernel)."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import ImageParameters, ColorSpace, Parameters, \
        PixelFormat
    from gpujpeg_tpu.parallel import batch as pbatch, mesh as pmesh

    t0 = time.time()
    h, w = SIZES["8k"]
    frame = synth_frame(h, w)
    mesh = pmesh.make_mesh(1, data=1, seg=1)
    pi = ImageParameters(width=w, height=h, color_space=ColorSpace.RGB,
                         pixel_format=PixelFormat.P444_U8_P012)
    be = pbatch.BatchEncoder(mesh, Parameters(quality=75,
                                              restart_interval=-1), pi)
    be.encode_batch(np.asarray(frame)[None])   # converge caps
    fn = be.fn

    @ft.partial(jax.jit, static_argnames=("n",))
    def loop(raw, n):
        def body(i, carry):
            rows, ob, needs = fn(raw.at[0, 0, 0, 0].set(carry))
            # reduce over ALL byte counts: consuming a single element
            # lets XLA dead-code-eliminate the other components'
            # kernels through the concat+slice (measured 6.4 "ms/frame"
            # with only the luma kernel live)
            return (ob.astype(jnp.int32).sum()
                    + needs.reshape(-1)[0]).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

    raws = jnp.asarray(np.asarray(frame)[None])
    dt = delta_time(loop, (raws,))
    matrix["encode_8k_q75_mesh1x1"] = {
        "ms": round(dt, 3), "setup_s": round(time.time() - t0, 1)}
    log(f"[bench] mesh 1x1 anchor: {dt:.2f} ms/frame "
        f"(setup {time.time()-t0:.0f}s)")
    return dt


def headline_json(dt8k, matrix=None):
    d = {
        "metric": "encode_8k_rgb_q75_device_ms_per_frame",
        "value": round(dt8k, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINES["encode_8k_device"] / dt8k, 3),
    }
    if matrix is not None:
        d["matrix"] = matrix
    return json.dumps(d)


def save_matrix(matrix):
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_MATRIX.json"), "w") as f:
        json.dump(matrix, f, indent=1)


def main():
    import jax

    log(f"[bench] backend: {jax.default_backend()}")
    matrix = {}

    # sacrificial fetch: pays the tunnel's first-fetch penalty up front
    t0 = time.time()
    import jax.numpy as jnp

    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))
    log(f"[bench] sacrificial fetch: {time.time()-t0:.0f} s")

    # ---- headline: 8K Q75 encode ----
    dt8k, enc, geo8k, res8k, meta8k = bench_encode(
        "encode_8k_q75_device", *SIZES["8k"], 75, matrix)

    # print the headline IMMEDIATELY: a timeout later in the matrix must
    # not erase the round's number (round 2 died at the 16K config and
    # recorded nothing); the full line incl. matrix is re-printed last,
    # and a parser taking the final JSON line sees the complete record
    print(headline_json(dt8k), flush=True)
    save_matrix(matrix)

    # 8K stream for the decode benchmark (assemble on host)
    stream8k = None
    try:
        t0 = time.time()
        stream8k = enc.assemble(geo8k, res8k, meta8k)
        log(f"[bench] 8K stream assembled: {len(stream8k)/1e6:.1f} MB "
            f"({time.time()-t0:.0f}s)")
    except Exception as e:
        log(f"[bench] 8K assembly failed: {e!r}")

    # ---- decode first (top verdict item), then the encode matrix ----
    if left() > 500 and stream8k is not None:
        try:
            bench_decode("decode_8k_q75_device", stream8k, matrix)
        except Exception as ex:
            log(f"[bench] decode 8k FAILED: {ex!r}")

    plan = [("encode", "hd", 75), ("encode", "4k", 75),
            ("encode", "16k", 75),
            ("encode", "8k", 90), ("encode", "8k", 10),
            ("encode", "8k", 100), ("encode", "8k", 50)]
    enc_sessions = {}
    for kind, size, q in plan:
        # 16K compiles three fresh programs; give it a bigger margin
        need = 900 if size == "16k" else 420
        if left() < need:
            log(f"[bench] deadline: skipping {kind}_{size}_q{q}")
            continue
        try:
            name = f"{kind}_{size}_q{q}_device"
            dt, e, g, r, m = bench_encode(name, *SIZES[size], q, matrix)
            enc_sessions[(size, q)] = (e, g, r, m)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] {kind} {size} q{q} FAILED: {ex!r}")

    for size, need in (("hd", 400), ("4k", 420), ("16k", 700)):
        if left() < need or (size, 75) not in enc_sessions:
            continue
        try:
            e, g, r, m = enc_sessions[(size, 75)]
            stream = e.assemble(g, r, m)
            bench_decode(f"decode_{size}_q75_device", stream, matrix)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] decode {size} FAILED: {ex!r}")

    # decode quality sweep at 8K (reference README.md:156-161)
    for q in (10, 50, 90, 100):
        if left() < 500 or ("8k", q) not in enc_sessions:
            continue
        try:
            e, g, r, m = enc_sessions[("8k", q)]
            stream = e.assemble(g, r, m)
            bench_decode(f"decode_8k_q{q}_device", stream, matrix)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] decode 8k q{q} FAILED: {ex!r}")

    # foreign stream: PIL/libjpeg interleaved 4:4:4 Q75 with restart
    # markers — the real-world "decode someone else's JPEG" case
    # (VERDICT r3 item 3); tables are Annex-K (libjpeg default)
    if left() > 500:
        try:
            import io as iomod

            import jax as _jax
            from PIL import Image

            t0 = time.time()
            frame = synth_frame(*SIZES["8k"])
            _jax.block_until_ready(frame)
            fnp = np.asarray(frame)
            buf = iomod.BytesIO()
            Image.fromarray(fnp).save(buf, "JPEG", quality=75,
                                      restart_marker_blocks=8,
                                      subsampling=0)
            log(f"[bench] PIL 8K stream: {buf.tell()/1e6:.1f} MB "
                f"({time.time()-t0:.0f}s)")
            bench_decode("decode_8k_foreign_pil", buf.getvalue(), matrix)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] foreign decode FAILED: {ex!r}")

    # interleaved encode (-i): runs the pairs tokenizer + deep kernel
    # path (mega_supported excludes interleaved scans)
    if left() > 500:
        try:
            bench_encode("encode_8k_q75_interleaved_device",
                         *SIZES["8k"], 75, matrix, interleaved=True)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] interleaved encode FAILED: {ex!r}")

    # pipelined-encode overlap evidence (wall time incl. assembly)
    if left() > 300:
        try:
            frame8k = synth_frame(*SIZES["8k"])
            bench_pipelined(enc, geo8k, frame8k, matrix)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] pipelined FAILED: {ex!r}")

    # 1x1-mesh anchor: the sharded BatchEncoder pipeline on ONE chip —
    # the per-chip ms/frame that multi-chip scaling claims anchor on
    if left() > 500:
        try:
            bench_mesh_anchor(matrix)
            save_matrix(matrix)
        except Exception as ex:
            log(f"[bench] mesh anchor FAILED: {ex!r}")

    save_matrix(matrix)
    log("[bench] matrix: " + json.dumps(matrix))
    print(headline_json(dt8k, matrix), flush=True)


if __name__ == "__main__":
    main()
