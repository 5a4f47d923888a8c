#!/usr/bin/env python
"""Phase-A scan-kernel C_tile sweep on a real 8K stream (real TPU).

Usage: python tools/profile_scan.py [HxW] [quality] [C_tile ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Decoder, Encoder, Parameters
    from gpujpeg_tpu.models import decoder as dec_mod
    from gpujpeg_tpu.ops import huffdec_kernel
    from gpujpeg_tpu.stream import reader

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    tiles = [int(x) for x in sys.argv[3:]] or [128, 256, 512]
    print(f"backend={jax.default_backend()} {h}x{w} q{q}", file=sys.stderr)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = np.asarray(gen(jax.random.PRNGKey(7)))
    enc = Encoder()
    data = enc.encode(frame, Parameters(quality=q, restart_interval=-1))
    print(f"stream {len(data)} bytes", file=sys.stderr)

    dec = Decoder()
    ps = reader.parse(bytes(data))
    param = reader.parsed_to_parameters(ps)
    out_pi = dec_mod.resolve_output(ps, None, 0)
    from gpujpeg_tpu.utils.geometry import get_geometry
    geo = get_geometry(param, out_pi.with_(width_padding=0))
    plan = dec._plan_for(geo, ps)
    nseg = geo.segment_count
    from gpujpeg_tpu.stream import segments as segprep
    from gpujpeg_tpu.models.decoder import _bucket
    ranges = dec._segment_ranges(ps, geo)
    max_words = _bucket((max(en - st for st, en in ranges) + 3) // 4)
    words_np, nbits_np = segprep.pack_segments_matrix(ps.data, ranges,
                                                      max_words)
    words = jnp.asarray(words_np)
    nbits = jnp.asarray(nbits_np)
    W = int(words.shape[1])
    bps = plan.bps
    blocks_per_seg = jnp.asarray(
        plan.blk_valid.reshape(nseg, bps).sum(axis=1).astype(np.int32))
    dc_l = jnp.asarray(plan.dc_luma_row)
    ac_l = jnp.asarray(plan.ac_luma_row)
    print(f"nseg={nseg} bps={bps} W={W}", file=sys.stderr)

    ac_lc, ac_cc, dc_lc, dc_cc = plan.kernel_consts

    def dtime(fn, args, n_hi=9, reps=3):
        times = {}
        for n in (1, n_hi):
            @jax.jit
            def lp(words, nbits, n=n):
                def body(i, carry):
                    bs, err = fn(words.at[0, 0].set(carry), nbits,
                                 blocks_per_seg, dc_l, ac_l)
                    return bs.reshape(-1)[0].astype(jnp.uint32)
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))
            r = lp(*args)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(lp(*args))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    # profile the exact production kernel variant: interleaved streams run
    # the pattern-lookup decode (extra blk % bpm select chain per step)
    pats = None
    if plan.luma_patterns is not None:
        dc_pat, ac_pat, bpm = plan.luma_patterns
        pats = (tuple(bool(x) for x in dc_pat),
                tuple(bool(x) for x in ac_pat), int(bpm))

    ref = None
    for ct in tiles:
        fn = huffdec_kernel.make_scan_kernel(
            W, bps, ac_lc, ac_cc, dc_lc, dc_cc, ct, False, pats)
        bs, err = fn(words, nbits, blocks_per_seg, dc_l, ac_l)
        bs = np.asarray(jax.block_until_ready(bs))
        ne = int(np.asarray(err).sum())
        if ref is None:
            ref = bs
        ok = np.array_equal(bs, ref)
        ms = dtime(fn, (words, nbits))
        print(f"C_tile={ct:4d}  {ms:8.2f} ms  err={ne} match={ok}",
              flush=True)


if __name__ == "__main__":
    main()
