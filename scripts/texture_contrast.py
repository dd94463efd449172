#!/usr/bin/env python
"""Information-ceiling ranking of background textures: post-compositing
ink contrast for every texture PNG, at a given dimmer intensity.

The generator composites ``clip(digits + s*bg)`` (reference
multi_mnist.py:319-334), so an ink pixel of value i over a background
pixel b retains visible contrast ``min(i, 1 - s*b)`` against its
surroundings. The round-2 analysis (RESULTS.md) used this to show the
bg-1.0 value-noise failure was partly information loss (19.3% of ink
pixels under 0.3 contrast); this script ranks the reference's shipped
textures by the same statistic, predicting which of the 19 are hard for
*any* method before spending chip time.

Usage:
    python scripts/texture_contrast.py [--intensity 1.0] \
        [--data multi_mnist_data/test.airrec] [PNG...]
Defaults to all PNGs in /root/reference/backgrounds.
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ink_pixels(test_path: str, canvas: int = 50, thresh: float = 0.05):
    """(values, rows, cols) of ink pixels from clean (background-free)
    scenes — the empirical digit-ink distribution with its placement."""
    from air_tpu.data.records import read_records
    images = np.asarray(read_records(test_path)["images"],
                        np.float32).reshape(-1, canvas, canvas)
    ink = images > thresh
    vals = images[ink]
    _, rows, cols = np.nonzero(ink)
    return vals, rows, cols


def texture_stats(png: str, vals, rows, cols, intensity: float,
                  canvas: int = 50):
    from air_tpu.data.multi_mnist import prepare_background
    bg = prepare_background(canvas, bg_path=png, max_intensity=intensity)
    contrast = np.minimum(vals, 1.0 - bg[rows, cols])
    return {"texture": os.path.splitext(os.path.basename(png))[0],
            "pct_lost": float((contrast < 0.3).mean() * 100),
            "mean_contrast": float(contrast.mean()),
            "bg_mean": float(bg.mean())}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pngs", nargs="*",
                   default=sorted(glob.glob(
                       "/root/reference/backgrounds/*.png")))
    p.add_argument("--intensity", type=float, default=1.0)
    p.add_argument("--data", default="multi_mnist_data/test.airrec")
    args = p.parse_args()

    vals, rows, cols = ink_pixels(args.data)
    print(f"{len(vals)} ink pixels from {args.data}; intensity "
          f"{args.intensity}")
    print(f"{'texture':<12} {'% ink < 0.3 contrast':>20} "
          f"{'mean contrast':>14} {'bg mean':>8}")
    out = [texture_stats(png, vals, rows, cols, args.intensity)
           for png in args.pngs]
    for r in sorted(out, key=lambda r: r["pct_lost"]):
        print(f"{r['texture']:<12} {r['pct_lost']:>20.1f} "
              f"{r['mean_contrast']:>14.3f} {r['bg_mean']:>8.3f}")


if __name__ == "__main__":
    main()
