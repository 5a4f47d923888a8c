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
    zz = tables.ZIGZAG_ORDER if hasattr(tables, "ZIGZAG_ORDER") else None
    if zz is None:
        # derive zig-zag from the module's 2D matrix helper
        M = tables.dct2d_matrix_zz()
        # fallback: compute via known order
        raise RuntimeError("need zigzag order")
    yz = y.reshape(-1, 64)[:, zz]
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


def affine_design(cnt):
    """Huffman over run-groups -> r_len; returns (r_len, L_EOB, L_ZRL,
    total_bits)."""
    # super-symbol frequencies
    run_f = np.zeros(16, np.float64)
    size_mass = np.zeros(16, np.float64)
    f_eob = cnt.get("EOB", 0)
    f_zrl = cnt.get("ZRL", 0)
    for sym, f in cnt.items():
        if isinstance(sym, tuple):
            r, s = sym
            run_f[r] += f
            size_mass[r] += f * s
    # Kraft mass of a run group at r_len=k is 2^-k * sum_{s=1..10} 2^-s
    # ~= 2^-k; treat each group as one symbol in a Huffman solve.
    syms = [("run", r) for r in range(16) if run_f[r] > 0]
    syms += [("eob",), ("zrl",)] if f_zrl > 0 else [("eob",)]
    freqs = []
    for s in syms:
        if s[0] == "run":
            freqs.append(run_f[s[1]])
        elif s[0] == "eob":
            freqs.append(max(f_eob, 1))
        else:
            freqs.append(max(f_zrl, 1))
    # length limit for run groups: r_len <= 15 (len = r_len + 1 minimum);
    # use package-merge at L=15 for safety
    lens = package_merge(np.asarray(freqs), 15)
    r_len = np.full(16, 15, np.int64)
    L_E, L_Z = 15, 15
    for s, ln in zip(syms, lens):
        if s[0] == "run":
            r_len[s[1]] = ln
        elif s[0] == "eob":
            L_E = ln
        else:
            L_Z = ln
    # verify Kraft with cap-at-16
    kraft = 2.0 ** -float(L_E) + (2.0 ** -float(L_Z) if f_zrl else 0)
    for r in range(16):
        for s in range(1, 11):
            kraft += 2.0 ** -min(16, r_len[r] + s)
    # shrink any slack greedily (most frequent first)
    order = np.argsort(-run_f)
    changed = True
    while changed:
        changed = False
        for r in order:
            if r_len[r] <= 1:
                continue
            delta = sum(2.0 ** -min(16, r_len[r] - 1 + s)
                        - 2.0 ** -min(16, r_len[r] + s)
                        for s in range(1, 11))
            if kraft + delta <= 1.0:
                r_len[r] -= 1
                kraft += delta
                changed = True
        if f_eob and L_E > 2 and kraft + 2.0 ** -(L_E - 1) - 2.0 ** -L_E <= 1.0:
            L_E -= 1
            kraft += 2.0 ** -L_E
            changed = True
    total = 0
    for sym, f in cnt.items():
        if sym == "EOB":
            total += f * L_E
        elif sym == "ZRL":
            total += f * L_Z
        else:
            r, s = sym
            total += f * (min(16, r_len[r] + s) + s)
    return r_len, L_E, L_Z, int(total), kraft


def main():
    qualities = [int(a) for a in sys.argv[1:]] or [50, 75, 90]
    y, u, v = load_yuv422_luma("/root/reference/colors/image_bt709_422.yuv")
    y2, u2, v2 = load_yuv422_luma(
        "/root/reference/colors/camera_bt709_422.yuv")
    for q in qualities:
        qt_l = tables.quant_table_zz(True, q).astype(np.float64)
        qt_c = tables.quant_table_zz(False, q).astype(np.float64)
        for name, planes, qt, luma in [
            ("luma", [y, y2], qt_l, True),
            ("chroma", [u, v, u2, v2], qt_c, False),
        ]:
            cnt = Counter()
            for p in planes:
                qb = block_tokens(p, qt)
                c, _ = ac_symbol_hist(qb)
                cnt.update(c)
            ak = annexk_bits(cnt, luma)
            opt = optimal_bits(cnt)
            r_len, L_E, L_Z, aff, kraft = affine_design(cnt)
            print(f"Q{q} {name:6s}: annexk={ak/8/1024:8.1f} KiB  "
                  f"optimal={opt/8/1024:8.1f}  affine={aff/8/1024:8.1f}  "
                  f"(affine vs annexk {100*(aff-ak)/ak:+.2f}%, "
                  f"kraft={kraft:.4f})")
            print(f"    r_len={list(r_len)} L_EOB={L_E} L_ZRL={L_Z}")


if __name__ == "__main__":
    main()
