#!/usr/bin/env python
"""Quality/size sweep -> QUALITY.json (VERDICT r3 item 7).

For Q10..Q100, both Huffman families (tuned computable vs Annex-K),
non-interleaved 4:4:4 (the reference's quality-table configuration,
/root/reference/README.md:163-181): encode the synthetic photographic
test frame, decode with PIL (independent oracle), record PSNR + bytes.
The reference's published HD/4K table is embedded for side-by-side
comparison (their numbers are averages over unspecified photos, so
cross-codec PSNR/size comparisons are indicative, not exact; the
tuned-vs-annexk delta on identical input IS exact).

Usage: python tools/quality_sweep.py [HD|4K|both]
"""

import io
import json
import sys

sys.path.insert(0, ".")

import numpy as np

REF_TABLE = {   # /root/reference/README.md:170-181 (GTX 580 averages)
    "4k": {10: (29.33, 539.30), 20: (32.70, 697.20), 30: (34.63, 850.60),
           40: (35.97, 958.90), 50: (36.94, 1073.30), 60: (37.96, 1217.10),
           70: (39.22, 1399.20), 80: (40.67, 1710.00), 90: (42.83, 2441.40),
           100: (47.09, 7798.70)},
    "hd": {10: (27.41, 145.90), 20: (30.32, 198.30), 30: (31.92, 243.60),
           40: (32.99, 282.20), 50: (33.82, 319.10), 60: (34.65, 360.00),
           70: (35.71, 422.10), 80: (37.15, 526.70), 90: (39.84, 768.40),
           100: (47.21, 2499.60)},
}


def gen_frame(h, w, seed=7):
    """Piecewise-smooth + texture + noise — the bench generator's
    content model (photographic-ish token densities)."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, (-(-h // 16), -(-w // 16), 3))
    up = np.repeat(np.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
    noise = rng.normal(0, 6.0, (h, w, 3))
    return np.clip(up + noise, 0, 255).astype(np.uint8)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse)) if mse else float("inf")


def main():
    from PIL import Image

    import gpujpeg_tpu as gj

    which = sys.argv[1].lower() if len(sys.argv) > 1 else "both"
    sizes = {"hd": (1080, 1920), "4k": (2160, 4096)}
    if which != "both":
        sizes = {which: sizes[which]}

    out = {"config": "non-interleaved 4:4:4, synthetic photographic "
                     "frame (tools/quality_sweep.py gen_frame)",
           "reference_published": {
               k: {str(q): {"psnr_db": v[0], "kb": v[1]}
                   for q, v in t.items()} for k, t in REF_TABLE.items()},
           "measured": {}}

    for name, (h, w) in sizes.items():
        frame = gen_frame(h, w)
        rows = {}
        for family in ("tuned", "annexk"):
            enc = gj.Encoder()
            fam = {}
            for q in range(10, 101, 10):
                # fixed interval: the quality/size story must not move
                # with the speed-tuned AUTO interval (which trades ~5%
                # size for decode speed at Q >= 97 — geometry.py)
                p = gj.Parameters(quality=q, restart_interval=8,
                                  huffman_tables=family)
                data = enc.encode(frame, p)
                dec = np.asarray(Image.open(io.BytesIO(data))
                                 .convert("RGB"))
                fam[str(q)] = {"psnr_db": round(psnr(frame, dec), 2),
                               "kb": round(len(data) / 1000.0, 2)}
                print(f"{name} {family} q{q}: {fam[str(q)]['psnr_db']} dB "
                      f"{fam[str(q)]['kb']} kB", flush=True)
            rows[family] = fam
        # size delta tuned vs annexk at equal Q (identical coefficients,
        # so PSNR is identical; only entropy coding differs)
        rows["tuned_vs_annexk_size_pct"] = {
            str(q): round(100.0 * (rows["tuned"][str(q)]["kb"]
                                   / rows["annexk"][str(q)]["kb"] - 1), 1)
            for q in range(10, 101, 10)}
        out["measured"][name] = rows

    with open("QUALITY.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote QUALITY.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
