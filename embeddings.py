#!/usr/bin/env python
"""Embedding-projector dataset CLI (reference embeddings.py parity)."""

import argparse
import os
import shutil
import sys


def prepare_results_folder(results_folder):
    """Fresh-output-dir semantics with a safety guard.

    The reference tool starts from a fresh output dir (reference
    embeddings.py deletes and recreates it). Only delete a folder whose
    contents are a previous run of THIS tool — pointing
    --results-folder at a training run would otherwise silently delete
    its checkpoints before they are even loaded.
    """
    if os.path.isdir(results_folder):
        own = ("_tensors.tsv", "mnist_metadata.tsv", "mnist_sprites.png",
               "projector_config.pbtxt")
        alien = [e for e in os.listdir(results_folder)
                 if not e.endswith(own)]
        if alien:
            sys.exit(f"{results_folder} contains files not written by "
                     f"this tool (e.g. {alien[0]}); refusing to delete it. "
                     "Pass a dedicated embeddings output folder.")
        shutil.rmtree(results_folder)
    os.makedirs(results_folder)


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

    prepare_results_folder(args.results_folder)

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
