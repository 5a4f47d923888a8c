#!/usr/bin/env python
"""Prototype: 8K Q100 with restart_interval=1 — encode device time,
stream size, host prep, and a hand-built bps==1 decode (no scan/split:
words ARE the per-block buffers) vs the current rst=4 pipeline.

Usage: python tools/proto_rst1.py [HxW] [quality] [rst...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from gpujpeg_tpu import Decoder, Encoder, Parameters
    from gpujpeg_tpu.models import decoder as dec_mod
    from gpujpeg_tpu.models import encoder as enc_mod
    from gpujpeg_tpu.stream import reader, segments as segprep
    from gpujpeg_tpu.utils.geometry import get_geometry

    size = sys.argv[1] if len(sys.argv) > 1 else "4320x7680"
    h, w = map(int, size.split("x"))
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    rsts = [int(x) for x in sys.argv[3:]] or [1, 4]
    print(f"backend={jax.default_backend()} {h}x{w} q{q} rsts={rsts}",
          flush=True)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        small = jax.random.uniform(k1, (-(-h // 16), -(-w // 16), 3),
                                   jnp.float32, 0.0, 255.0)
        up = jnp.repeat(jnp.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
        noise = jax.random.normal(k2, (h, w, 3), jnp.float32) * 6.0
        return jnp.clip(up + noise, 0, 255).astype(jnp.uint8)

    frame = gen(jax.random.PRNGKey(7))
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128))))  # warm

    def delta(loop, args, n_hi=5, reps=3):
        times = {}
        for n in (1, n_hi):
            _ = np.asarray(loop(*args, n))
            best = float("inf")
            for _r in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(loop(*args, n))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[n_hi] - times[1]) / (n_hi - 1) * 1000.0

    for rst in rsts:
        t0 = time.time()
        enc = Encoder()
        enc.segment_info = True
        param = Parameters(quality=q, restart_interval=rst)
        geo, res, meta = enc.encode_to_device(frame, param)
        caps = enc._caps[geo]
        fn = enc_mod.make_full_encode_fn(geo, caps)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(raw, n, fn=fn):
            def body(i, carry):
                r = fn(raw.at[0, 0, 0].set(carry))
                return r["meta"][-1].astype(jnp.uint8)

            return jax.lax.fori_loop(0, n, body, jnp.uint8(0))

        enc_ms = delta(loop, (frame,))
        stream = enc.assemble(geo, res, meta)
        t_asm0 = time.perf_counter()
        stream = enc.assemble(geo, res, meta)
        asm_ms = (time.perf_counter() - t_asm0) * 1000
        print(f"rst={rst}: encode {enc_ms:.2f} ms device, stream "
              f"{len(stream)/1e6:.2f} MB, assemble {asm_ms:.1f} ms, "
              f"nseg={geo.segment_count} (setup {time.time()-t0:.0f}s)",
              flush=True)

        # host prep
        dec = Decoder()
        best = float("inf")
        for _ in range(4):
            t0p = time.perf_counter()
            ps = reader.parse(bytes(stream))
            p2 = reader.parsed_to_parameters(ps)
            out_pi = dec_mod.resolve_output(ps, None, 0)
            g2 = get_geometry(p2, out_pi.with_(width_padding=0))
            ranges = dec._segment_ranges(ps, g2)
            mw = dec_mod._bucket(
                (int((ranges[:, 1] - ranges[:, 0]).max()) + 3) // 4)
            words_np, nbits = segprep.pack_segments_matrix(
                ps.data, ranges, mw)
            best = min(best, time.perf_counter() - t0p)
        print(f"rst={rst}: host prep {best*1000:.1f} ms "
              f"(max_words={mw})", flush=True)

        # decode: full pipeline (current path)
        t0 = time.time()
        dfn, dwords, dnbits = dec.compile_stream_pipeline(bytes(stream))

        @functools.partial(jax.jit, static_argnames=("n",))
        def dloop(words, nbits, n, dfn=dfn):
            def body(i, carry):
                img = dfn(words.at[0, 0].set(carry.astype(jnp.uint32)),
                          nbits)
                img = img[0] if isinstance(img, (list, tuple)) else img
                return img.reshape(-1)[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        dec_ms = delta(dloop, (dwords, dnbits))
        print(f"rst={rst}: decode FULL {dec_ms:.2f} ms "
              f"(setup {time.time()-t0:.0f}s)", flush=True)

        if rst != 1:
            continue
        # hand-built bps==1 phase C on words directly
        plan = dec._plan_for(g2, ps)
        nseg = g2.segment_count
        words = dec_mod._bswap32_dev(jnp.asarray(words_np))
        nbits_d = jnp.asarray(nbits)
        ranges_c = plan.comp_class_ranges()
        kmode = "on"
        K = int(words.shape[1])
        print(f"rst=1: plan bps={plan.bps} K={K} ranges_c="
              f"{[(lo, hi) for lo, hi, _ in ranges_c]}", flush=True)
        bdc_i = jnp.asarray(plan.blk_dc_luma.astype(np.int32))[None, :]
        bac_i = jnp.asarray(plan.blk_ac_luma.astype(np.int32))[None, :]
        bva_i = jnp.asarray(plan.blk_valid.astype(np.int32))[None, :]
        qtabs = jnp.asarray(np.stack([
            ps.quant_tables[ps.quant_map[c.index]]
            for c in g2.components]).astype(np.float32))
        idct_fn_t = dec_mod._make_idct_post_fn_t(g2)
        wcs = [dec_mod._comp_scan_width(K, ranges, lo, hi)
               for lo, hi, _ in ranges_c]

        def direct(words, nbits_d):
            cts = []
            for (lo, hi, cls), wc in zip(ranges_c, wcs):
                fn_c = plan.kernel_block_fn(wc, False, cls)
                ct, _e = fn_c(words[lo:hi, :wc].T,
                              nbits_d[None, lo:hi],
                              bdc_i[:, lo:hi], bac_i[:, lo:hi],
                              bva_i[:, lo:hi])
                cts.append(ct)
            coefs_t = jnp.concatenate(cts, axis=1)
            return idct_fn_t(coefs_t, qtabs)

        @functools.partial(jax.jit, static_argnames=("n",))
        def dirloop(words, nbits_d, n):
            def body(i, carry):
                img = direct(words.at[0, 0].set(carry.astype(jnp.uint32)),
                             nbits_d)
                img = img[0] if isinstance(img, (list, tuple)) else img
                return img.reshape(-1)[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        t0 = time.time()
        dir_ms = delta(dirloop, (words, nbits_d))
        print(f"rst=1: decode DIRECT (no scan/split) {dir_ms:.2f} ms "
              f"(setup {time.time()-t0:.0f}s)", flush=True)

        # correctness: compare direct vs full pipeline output
        a = np.asarray(direct(words, nbits_d))
        b = np.asarray(dfn(dwords, dnbits))
        b = b[0] if isinstance(b, (list, tuple)) else np.asarray(b)
        print(f"rst=1: direct vs full max|diff| = "
              f"{np.abs(a.astype(np.int32) - b.astype(np.int32)).max()}",
              flush=True)


if __name__ == "__main__":
    main()
