#!/usr/bin/env python
"""Embedding-projector dataset CLI (reference embeddings.py parity)."""

import argparse
import os
import shutil
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", default="./model/air-model")
    parser.add_argument("--test-data", default="multi_mnist_data/test.airrec")
    parser.add_argument("--results-folder",
                        default=os.path.join(os.getcwd(), "embeddings"))
    parser.add_argument("--max-distance", type=float, default=0.2)
    parser.add_argument("--canvas-size", type=int, default=50)
    parser.add_argument("--windows-size", type=int, default=28)
    args = parser.parse_args()

    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
    from air_tpu.serve.model_wrapper import ModelWrapper
    from air_tpu.train.checkpoint import (
        load_checkpoint, latest_checkpoint, checkpoint_arch)
    from air_tpu.tools.embeddings import run

    shutil.rmtree(args.results_folder, ignore_errors=True)
    os.makedirs(args.results_folder)

    path = args.model_path
    if os.path.isdir(path):
        path = latest_checkpoint(path)
        if path is None:
            sys.exit(f"no checkpoints in {args.model_path}")
    config = DEFAULT_TRAINING_CONFIG.replace(
        canvas_size=args.canvas_size, windows_size=args.windows_size,
        train=False, **checkpoint_arch(path))
    print(f"Restoring model from {path}...")
    state = load_checkpoint(path, config)
    wrapper = ModelWrapper(config, state.params)

    run(wrapper, args.test_data, args.results_folder,
        args.canvas_size, args.windows_size, args.max_distance)


if __name__ == "__main__":
    main()
