"""Stroke statistics: synthetic glyphs vs upsampled UCI digits.

Quantifies WHY the raw-pixel (MLP-encoder) config's window-scale
degeneracy basin is stickier on the real-handwriting set than on the
synthetic-glyph set (RESULTS.md raw-pixel-on-real campaign): the UCI
digits are 8x8 captures upsampled to 28x28, so their strokes are wide
and soft-edged. Three per-digit-crop statistics make that concrete:

- ink fraction: share of pixels > 0.5 (stroke WIDTH proxy);
- midtone fraction: share of pixels in (0.1, 0.9) — soft edges produce
  large midtone halos (BLUR proxy);
- mean gradient magnitude over ink edges (SHARPNESS proxy).

The mechanism: AIR's localization bootstrap is driven by the BCE
gradient spike at crisp unexplained ink (models/air.py RECON_EPS
analysis). Blurred, wide strokes (a) weaken that force — midtone pixels
have bounded 1/eps terms on both sides — and (b) make a half-digit
window's blurry VAE reconstruction cheaper, flattening the loss wall
between the correct one-window code and the two-window tiling code
that the 0.67 basin is made of.

Usage: python scripts/stroke_stats.py          # prints a JSON summary
Cited by RESULTS.md "Round-5 raw-pixel-on-real campaign".
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from air_tpu.data.mnist import load_sklearn_digits, synthesize_mnist


def stats(images: np.ndarray) -> dict:
    """images: [N, 28, 28] float in [0, 1]."""
    images = images.reshape(-1, 28, 28)
    ink = (images > 0.5).mean(axis=(1, 2))
    mid = ((images > 0.1) & (images < 0.9)).mean(axis=(1, 2))
    gy = np.abs(np.diff(images, axis=1)).mean(axis=(1, 2))
    gx = np.abs(np.diff(images, axis=2)).mean(axis=(1, 2))
    # edge sharpness: mean gradient conditioned on the edge band only
    # (otherwise ink fraction leaks into the statistic)
    edge_band = ((images > 0.1) & (images < 0.9))
    grad = np.zeros_like(images)
    grad[:, :-1, :] += np.abs(np.diff(images, axis=1))
    grad[:, :, :-1] += np.abs(np.diff(images, axis=2))
    denom = np.maximum(edge_band.sum(axis=(1, 2)), 1)
    edge_grad = (grad * edge_band).sum(axis=(1, 2)) / denom
    return {
        "ink_fraction": round(float(ink.mean()), 4),
        "midtone_fraction": round(float(mid.mean()), 4),
        "mean_gradient": round(float((gx + gy).mean()), 4),
        "edge_gradient": round(float(edge_grad.mean()), 4),
    }


def main():
    synth, _ = synthesize_mnist(2000, seed=0)
    synth = np.asarray(synth, np.float32).reshape(-1, 28, 28)
    if synth.max() > 1.5:
        synth = synth / 255.0
    out = {"synthetic_glyphs": stats(synth)}
    for interp in ("bilinear", "bicubic"):
        uci, _ = load_sklearn_digits(interp=interp)
        uci = np.asarray(uci, np.float32).reshape(-1, 28, 28)
        if uci.max() > 1.5:
            uci = uci / 255.0
        out[f"uci_{interp}"] = stats(uci)
    # headline ratios: how much wider/blurrier the UCI strokes are
    s, u = out["synthetic_glyphs"], out["uci_bilinear"]
    out["uci_vs_synthetic"] = {
        "ink_fraction_ratio": round(u["ink_fraction"] / s["ink_fraction"], 2),
        "midtone_fraction_ratio": round(
            u["midtone_fraction"] / s["midtone_fraction"], 2),
        "edge_gradient_ratio": round(
            u["edge_gradient"] / s["edge_gradient"], 2),
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
