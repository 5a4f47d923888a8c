#!/usr/bin/env python
"""Design 'computable canonical' AC Huffman tables and measure their
compression efficiency vs Annex-K on real content.

Scheme: len(run, size) = min(16, r_len[run] + size); EOB and ZRL get their
own lengths.  Optimal r_len/L_EOB/L_ZRL = Huffman code over the 18
run-group super-symbols (each run group carries Kraft mass ~sum_s 2^-s).

Usage: python tools/design_tables.py [quality ...]
"""

import sys
from collections import Counter

import numpy as np

sys.path.insert(0, ".")

from gpujpeg_tpu.utils import tables  # noqa: E402


def load_yuv422_luma(path, w=1920, h=1080):
    """UYVY 4:2:2 -> (h, w) luma + half-res chroma planes."""
    raw = np.fromfile(path, np.uint8)
    raw = raw[: w * h * 2].reshape(h, w, 2)
    y = raw[:, :, 1]
    uv = raw[:, :, 0].reshape(h, w // 2, 2)
    return y, uv[:, :, 0], uv[:, :, 1]


def block_tokens(plane, qtab_zz):
    """Quantized zig-zag coefficients for every 8x8 block (numpy)."""
    h, w = plane.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    x = plane[:h8, :w8].astype(np.float32) - 128.0
    blocks = x.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(-1, 8, 8)
    C = tables.dct8_matrix()
    y = np.einsum("ij,bjk,lk->bil", C, blocks, C)
    yz = y.reshape(-1, 64)[:, tables.ZIGZAG_TO_NATURAL]
    q = np.round(yz / qtab_zz[None, :]).astype(np.int32)
    return q


def ac_symbol_hist(qblocks):
    """Counter over AC symbols: (run, size), 'EOB', 'ZRL'; plus DC sizes."""
    cnt = Counter()
    dc_cnt = Counter()
    prev_dc = 0
    for b in qblocks:
        diff = int(b[0]) - prev_dc
        prev_dc = int(b[0])
        dc_cnt[int(np.ceil(np.log2(abs(diff) + 1))) if diff else 0] += 1
        run = 0
        last_nz = 0
        nz_idx = np.nonzero(b[1:])[0]
        if len(nz_idx) == 0:
            cnt["EOB"] += 1
            continue
        pos = 0
        for i in nz_idx:
            run = i - pos
            while run >= 16:
                cnt["ZRL"] += 1
                run -= 16
            v = int(b[1 + i])
            size = int(np.floor(np.log2(abs(v)))) + 1
            cnt[(run, size)] += 1
            pos = i + 1
        if pos < 63:
            cnt["EOB"] += 1
    return cnt, dc_cnt


def annexk_bits(cnt, luma=True):
    bits_l, vals_l = tables.huffman_spec_for("ac", luma)
    lut = tables.huffman_encode_lut(bits_l, vals_l, 256)
    ln = (lut >> 16).astype(np.int64)
    total = 0
    for sym, f in cnt.items():
        if sym == "EOB":
            total += f * ln[0x00]
        elif sym == "ZRL":
            total += f * ln[0xF0]
        else:
            r, s = sym
            total += f * (ln[(r << 4) | s] + s)
    return int(total)


def optimal_bits(cnt):
    """Length-limited (16) Huffman over the exact symbol set, + value bits."""
    syms = list(cnt.keys())
    freqs = np.array([cnt[s] for s in syms], np.float64)
    lens = package_merge(freqs, 16)
    total = 0
    for s, f, ln in zip(syms, [cnt[s] for s in syms], lens):
        total += f * ln
        if isinstance(s, tuple):
            total += f * s[1]
    return int(total)


def package_merge(freqs, L):
    """Package-merge length-limited Huffman code lengths."""
    n = len(freqs)
    items = sorted(range(n), key=lambda i: freqs[i])
    packages = []
    level = [(freqs[i], (i,)) for i in items]
    for _ in range(L - 1):
        level.sort()
        merged = []
        for a in range(0, len(level) - 1, 2):
            w = level[a][0] + level[a + 1][0]
            merged.append((w, level[a][1] + level[a + 1][1]))
        level = merged + [(freqs[i], (i,)) for i in items]
    level.sort()
    lens = np.zeros(n, np.int64)
    for w, members in level[: 2 * n - 2]:
        for m in members:
            lens[m] += 1
    return lens


KRAFT_BUDGET = 1.0 - 2.0 ** -16      # reserve the all-ones code (F.1.2.3)


def _kraft(r_len, L_E, L_Z, l0=None):
    """l0: optional (10,) free lengths for run-0 sizes 1..10."""
    k = 2.0 ** -float(L_E) + 2.0 ** -float(L_Z)
    for r in range(16):
        if r == 0 and l0 is not None:
            k += sum(2.0 ** -int(l) for l in l0)
            continue
        for s in range(1, 11):
            k += 2.0 ** -min(16, int(r_len[r]) + s)
    return k


def _affine_bits(cnt, r_len, L_E, L_Z, l0=None):
    total = 0
    for sym, f in cnt.items():
        if sym == "EOB":
            total += f * L_E
        elif sym == "ZRL":
            total += f * L_Z
        else:
            r, s = sym
            if r == 0 and l0 is not None:
                total += f * (int(l0[s - 1]) + s)
            else:
                total += f * (min(16, int(r_len[r]) + s) + s)
    return int(total)


def affine_design(cnt):
    """Optimal hybrid params: run-0 sizes get FREE lengths (l0), runs 1-15
    are affine groups with monotone r_len; EOB/ZRL free-standing.  Initial
    solve = package-merge over the 27 entities, then isotonic projection
    + greedy polish (shrink AND lengthen-to-make-room moves) under the
    strict Kraft budget.

    Returns (r_len monotone for runs>=1, l0 (10,), L_EOB, L_ZRL,
    total_bits, kraft)."""
    run_f = np.zeros(16, np.float64)
    s0_f = np.zeros(10, np.float64)
    for sym, f in cnt.items():
        if isinstance(sym, tuple):
            r, s = sym
            if r == 0:
                s0_f[s - 1] += f
            else:
                run_f[r] += f
    f_eob = max(cnt.get("EOB", 0), 1)
    f_zrl = max(cnt.get("ZRL", 0), 1)
    # entities: 10 run-0 sizes, 15 run groups (r>=1), EOB, ZRL
    freqs = np.concatenate([np.maximum(s0_f, 1e-3),
                            np.maximum(run_f[1:], 1e-3),
                            [f_eob, f_zrl]])
    lens = package_merge(freqs, 15)
    l0 = np.asarray(lens[:10], np.int64)
    r_len = np.zeros(16, np.int64)
    r_len[1:] = lens[10:25]
    r_len[0] = 1             # unused by the hybrid (kept for monotonicity)
    L_E, L_Z = int(lens[25]), int(lens[26])
    for r in range(2, 16):
        r_len[r] = max(r_len[r], r_len[r - 1])
    r_len[0] = min(r_len[0], r_len[1])
    while _kraft(r_len, L_E, L_Z, l0) > KRAFT_BUDGET:
        cands = [r for r in range(1, 16) if r_len[r] < 16]
        r = min(cands, key=lambda r: run_f[r])
        r_len[r] += 1
        for rr in range(r + 1, 16):
            r_len[rr] = max(r_len[rr], r_len[rr - 1])

    def bits_of(rl, lz0, le, lzz):
        return _affine_bits(cnt, rl, le, lzz, lz0)

    changed = True
    while changed:
        changed = False
        base = bits_of(r_len, l0, L_E, L_Z)
        best = None
        for r in range(1, 16):
            if r_len[r] <= 1 or r_len[r] - 1 < r_len[r - 1]:
                continue
            trial = r_len.copy()
            trial[r] -= 1
            if _kraft(trial, L_E, L_Z, l0) <= KRAFT_BUDGET:
                gain = base - bits_of(trial, l0, L_E, L_Z)
                if gain > 0 and (best is None or gain > best[0]):
                    best = (gain, ("run", r))
        for s in range(10):
            if l0[s] <= 1:
                continue
            trial = l0.copy()
            trial[s] -= 1
            if _kraft(r_len, L_E, L_Z, trial) <= KRAFT_BUDGET:
                gain = base - bits_of(r_len, trial, L_E, L_Z)
                if gain > 0 and (best is None or gain > best[0]):
                    best = (gain, ("s0", s))
        if L_E > 1 and _kraft(r_len, L_E - 1, L_Z, l0) <= KRAFT_BUDGET:
            gain = base - bits_of(r_len, l0, L_E - 1, L_Z)
            if gain > 0 and (best is None or gain > best[0]):
                best = (gain, ("eob",))
        if L_Z > 1 and _kraft(r_len, L_E, L_Z - 1, l0) <= KRAFT_BUDGET:
            gain = base - bits_of(r_len, l0, L_E, L_Z - 1)
            if gain > 0 and (best is None or gain > best[0]):
                best = (gain, ("zrl",))
        if best is not None:
            _, what = best
            if what[0] == "run":
                r_len[what[1]] -= 1
            elif what[0] == "s0":
                l0[what[1]] -= 1
            elif what[0] == "eob":
                L_E -= 1
            else:
                L_Z -= 1
            changed = True
    kraft = _kraft(r_len, L_E, L_Z, l0)
    assert kraft <= KRAFT_BUDGET
    return r_len, l0, L_E, L_Z, bits_of(r_len, l0, L_E, L_Z), kraft


def synth_planes(seed, h=1072, w=1920):
    """Gradient + texture + noise synthetic content (train/holdout)."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, (h // 16, w // 16))
    up = np.repeat(np.repeat(small, 16, 0), 16, 1)
    noise = rng.normal(0, 8, (h, w))
    tex = 24 * np.sin(np.arange(w) / 3.1)[None, :] * \
        np.sin(np.arange(h) / 2.3)[:, None]
    return np.clip(up + tex + noise, 0, 255).astype(np.uint8)


def ramp_plane(h=512, w=768, k=1.0):
    """Pure smooth ramp (dense tiny coefficients at high quality)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * k + yy * 0.7 * k) % 256).astype(np.uint8)


def annexk_prior(luma, mass):
    """Annex-K-implied pseudo-counts: freq ~ 2^-len scaled to `mass` total.

    Blending this into the training histogram bounds the regret of the
    tuned tables vs Annex-K on content unlike the corpus (rare symbols
    can never be priced catastrophically)."""
    bits_l, vals_l = tables.huffman_spec_for("ac", luma)
    lut = tables.huffman_encode_lut(bits_l, vals_l, 256)
    ln = (lut >> 16).astype(np.float64)
    pri = Counter()
    tot = 0.0
    for sym in list(np.nonzero(ln)[0]):
        f = 2.0 ** -ln[sym]
        if sym == 0x00:
            pri["EOB"] = f
        elif sym == 0xF0:
            pri["ZRL"] = f
        else:
            r, s = sym >> 4, sym & 15
            if 1 <= s <= 10:
                pri[(int(r), int(s))] = f
        tot += f
    return Counter({k: v * mass / tot for k, v in pri.items()})


def gather_hist(planes, qt):
    cnt = Counter()
    for p, weight in planes:
        qb = block_tokens(p, qt)
        c, _ = ac_symbol_hist(qb)
        for k, v in c.items():
            cnt[k] += v * weight
    return cnt


def main():
    qualities = [int(a) for a in sys.argv[1:]] or [10, 25, 50, 75, 90, 95,
                                                   100]
    y, u, v = load_yuv422_luma("/root/reference/colors/image_bt709_422.yuv")
    y2, u2, v2 = load_yuv422_luma(
        "/root/reference/colors/camera_bt709_422.yuv")
    s1, s2 = synth_planes(1), synth_planes(2)
    flat = np.full((512, 512), 128, np.uint8)
    ramp1, ramp2 = ramp_plane(k=1.0), ramp_plane(k=0.37)
    hold = synth_planes(99)
    hold_ramp = ramp_plane(h=384, w=640, k=0.61)

    params_out = {}
    for q in qualities:
        qt_l = tables.quant_table_zz(True, q).astype(np.float64)
        qt_c = tables.quant_table_zz(False, q).astype(np.float64)
        for name, train, holdout, qt, luma in [
            ("luma", [(y, 1), (y2, 1), (s1, 1), (flat, 1), (ramp1, 2)],
             [(hold, 1), (y2, 1), (hold_ramp, 1)], qt_l, True),
            ("chroma", [(u, 1), (v, 1), (u2, 1), (v2, 1), (s2, 1),
                        (ramp2, 1)],
             [(hold, 1), (u2, 1), (hold_ramp, 1)], qt_c, False),
        ]:
            cnt = gather_hist(train, qt)
            total = sum(cnt.values())
            cnt.update(annexk_prior(luma, 0.25 * total))
            r_len, l0, L_E, L_Z, aff, kraft = affine_design(cnt)
            ak = annexk_bits(cnt, luma)
            opt = optimal_bits(cnt)
            hc = gather_hist(holdout, qt)
            h_ak = annexk_bits(hc, luma)
            h_aff = _affine_bits(hc, r_len, L_E, L_Z, l0)
            print(f"Q{q:3d} {name:6s}: train hybrid vs annexk "
                  f"{100*(aff-ak)/ak:+6.2f}% (opt {100*(opt-ak)/ak:+6.2f}%)"
                  f"  holdout {100*(h_aff-h_ak)/h_ak:+6.2f}%"
                  f"  kraft={kraft:.6f}")
            params_out[(q, name)] = (list(map(int, r_len)),
                                     list(map(int, l0)), int(L_E), int(L_Z))
    print("\n# embeddable params"
          " {(quality, class): (r_len, l0_run0, L_EOB, L_ZRL)}")
    for k in sorted(params_out, key=lambda t: (t[0], t[1])):
        print(f"  ({k[0]}, {k[1]!r}): {params_out[k]},")


if __name__ == "__main__":
    main()
