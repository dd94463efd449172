#!/usr/bin/env python
"""AIR live-inference demo.

Reference parity (reference demo.py): loads a trained checkpoint, builds an
eval-mode model (z_pres rounded), and opens the Tk drawing window. Extra
TPU-era mode: ``--headless N`` streams N demo-style inferences as JSON lines
instead of opening a GUI (for benchmarking and display-less machines).
"""

import argparse
import sys


CANVAS_SIZE = 50
WINDOW_SIZE = 28


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", default="./model/air-model",
                        help="checkpoint file or directory of checkpoints")
    parser.add_argument("--headless", type=int, default=0, metavar="N",
                        help="stream N frames as JSON lines instead of GUI")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--canvas-size", type=int, default=CANVAS_SIZE)
    parser.add_argument("--windows-size", type=int, default=WINDOW_SIZE)
    parser.add_argument("--refresh-ms", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
    from air_tpu.serve.model_wrapper import ModelWrapper
    from air_tpu.train.checkpoint import (
        load_checkpoint, latest_checkpoint, checkpoint_arch)
    import os

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
    wrapper = ModelWrapper(config, state.params, seed=args.seed)

    if args.headless:
        from air_tpu.tools.headless_demo import stream, scribble_frames
        stats = stream(wrapper,
                       scribble_frames(args.canvas_size, args.headless,
                                       args.seed),
                       batch_size=args.batch_size)
        print(f"# {stats['frames']} frames, "
              f"{stats['frames_per_sec']:.1f} frames/sec, "
              f"{stats['mean_latency_ms']:.2f} ms/frame", file=sys.stderr)
        return

    import tkinter as tk
    from air_tpu.tools.demo_tk import DemoWindow
    master = tk.Tk()
    master.title("Attend Infer Repeat - Live Demo (TPU)")
    master.columnconfigure(0, weight=1)
    master.rowconfigure(1, weight=1)
    DemoWindow(master, wrapper, args.canvas_size, args.windows_size,
               refresh_period=args.refresh_ms)
    master.mainloop()


if __name__ == "__main__":
    main()
