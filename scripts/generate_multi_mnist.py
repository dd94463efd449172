#!/usr/bin/env python
"""Multi-MNIST dataset generator CLI.

Flag-for-flag parity with the reference generator CLI
(reference multi_mnist.py:312-329), writing AIRREC files instead of
TFRecords. Digits come from mnist_data/ (idx or npz) when present, else the
deterministic synthetic fallback.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--max-digits", type=int,
                        choices=list(range(7)), default=2)
    parser.add_argument("--max-in-common", type=int,
                        choices=list(range(7)), default=2)
    parser.add_argument("--images-per-digit", type=int, default=20000)
    parser.add_argument("--test-set-size", type=int, default=1000)
    parser.add_argument("--digit-gap", type=int, default=0)
    parser.add_argument("--canvas-margin", type=int, default=0)
    parser.add_argument("--bg-path", default="")
    parser.add_argument("--bg-kind", default="", help="procedural background: "
                        "noise|gradient|stripes|blobs|checker")
    parser.add_argument("--bg-max-intensity", type=float, default=1.0)
    parser.add_argument("--min-width-scale", type=float, default=1.0)
    parser.add_argument("--max-width-scale", type=float, default=1.0)
    parser.add_argument("--min-height-scale", type=float, default=1.0)
    parser.add_argument("--max-height-scale", type=float, default=1.0)
    parser.add_argument("--min-rotation-angle", type=float, default=0.0)
    parser.add_argument("--max-rotation-angle", type=float, default=0.0)
    parser.add_argument("--use-bounding-box-overlap", action="store_true")
    parser.add_argument("--canvas-size", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--mnist-folder", default="mnist_data")
    parser.add_argument("--out-folder", default="multi_mnist_data")
    parser.add_argument("--source", default="auto",
                        choices=["auto", "sklearn"],
                        help="auto: real MNIST idx/npz from --mnist-folder "
                             "if present, else synthetic glyphs. sklearn: "
                             "the 1797 REAL handwritten UCI digits bundled "
                             "with scikit-learn (upsampled 8x8 -> 28x28)")
    parser.add_argument("--upsample", default="bilinear",
                        choices=["bilinear", "bicubic"],
                        help="sklearn 8x8 -> 28x28 glyph upsampling: "
                             "bilinear (the shipped round-4 datasets) or "
                             "bicubic (Catmull-Rom; smoother stroke edges "
                             "— a data-fidelity arm, generates a SEPARATE "
                             "dataset that never feeds the union tables)")
    parser.add_argument("--digit-slice", default="",
                        help="a:b slice of the digit pool (after a "
                             "seed-0 shuffle), e.g. ':1400' / '1400:' — "
                             "for disjoint-pool generalization datasets")
    args = parser.parse_args()

    from air_tpu.data import get_mnist, generate_dataset, MultiMNISTConfig

    if args.source == "sklearn":
        from air_tpu.data.mnist import load_sklearn_digits
        digits, labels = load_sklearn_digits(interp=args.upsample)
        source = f"sklearn-real-handwritten ({args.upsample})"
    else:
        digits, labels, source = get_mnist(args.mnist_folder)
    if args.digit_slice:
        import numpy as np
        a, b = args.digit_slice.split(":")
        perm = np.random.default_rng(0).permutation(len(digits))
        sel = perm[slice(int(a) if a else None, int(b) if b else None)]
        digits, labels = digits[sel], labels[sel]
    print(f"digit source: {source} ({len(digits)} digits)")

    os.makedirs(args.out_folder, exist_ok=True)
    cfg = MultiMNISTConfig(
        max_digits=args.max_digits, max_in_common=args.max_in_common,
        images_per_digit=args.images_per_digit,
        test_set_size=args.test_set_size,
        digit_gap=args.digit_gap, canvas_margin=args.canvas_margin,
        bg_path=args.bg_path, bg_kind=args.bg_kind,
        bg_max_intensity=args.bg_max_intensity,
        min_width_scale=args.min_width_scale,
        max_width_scale=args.max_width_scale,
        min_height_scale=args.min_height_scale,
        max_height_scale=args.max_height_scale,
        min_rotation_angle=args.min_rotation_angle,
        max_rotation_angle=args.max_rotation_angle,
        use_bounding_box_overlap=args.use_bounding_box_overlap,
        canvas_size=args.canvas_size, seed=args.seed)

    out = generate_dataset(
        digits, labels, cfg, out_dir=args.out_folder,
        progress=lambda d, n: print(f"{d}-digit images: {n} done"))
    print(f"{len(out['used_digit_ids'])} digits used for "
          f"0-{args.max_in_common} digit images")
    print(f"common: {len(out['common']['images'])} images, "
          f"test: {len(out['test']['images'])} images -> {args.out_folder}/")


if __name__ == "__main__":
    main()
