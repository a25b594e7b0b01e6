"""Training CLI — train a detector from labeled audio and export the net.

The native replacement for the reference's MATLAB training + convert_to_text.m
export loop. Labels are a CSV of `start_seconds,end_seconds` syllable
intervals (lines starting with `#` ignored). The exported text network loads
in this framework's CLI and in the reference Swift app.

Usage:
  python -m syllable_detector_tpu.train -a song.wav -l labels.csv -o net.txt
         [--epochs N] [--hidden 4] [--rate 44100] [--fft 256] [--overlap 124]
         [--freq 2000 7000] [--time-range 10] [--data-parallel]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from syllable_detector_tpu.config.model_format import save_config
from syllable_detector_tpu.training.trainer import (
    TrainSettings,
    export_trained_config,
    features_and_labels,
    train,
)
from syllable_detector_tpu.utils.wav import read_audio

__all__ = ["main", "read_labels"]


def read_labels(path: str) -> list[tuple[float, float]]:
    intervals = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            if len(parts) < 2:
                continue
            intervals.append((float(parts[0]), float(parts[1])))
    return intervals


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="syllable-detector-train")
    p.add_argument("-a", "--audio", required=True, help="Training audio WAV.")
    p.add_argument("-l", "--labels", required=True,
                   help="CSV of start_seconds,end_seconds syllable intervals.")
    p.add_argument("-o", "--output", required=True, help="Output network file.")
    p.add_argument("--channel", type=int, default=0)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=3e-3)
    p.add_argument("--hidden", type=int, nargs="+", default=[4])
    p.add_argument("--fft", type=int, default=256)
    p.add_argument("--window", type=int, default=None)
    p.add_argument("--overlap", type=int, default=124)
    p.add_argument("--freq", type=float, nargs=2, default=[2000.0, 7000.0])
    p.add_argument("--time-range", type=int, default=10)
    p.add_argument("--scaling", choices=("linear", "log", "db"), default="linear")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard batches across all local devices.")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    try:
        samples, rate = read_audio(args.audio)
    except (OSError, ValueError) as e:
        print(f"Unable to read {args.audio}: {e}", file=sys.stderr)
        return 1
    try:
        intervals = read_labels(args.labels)
    except (OSError, ValueError) as e:
        print(f"Unable to read {args.labels}: {e}", file=sys.stderr)
        return 1
    if not intervals:
        print("No labeled intervals found.", file=sys.stderr)
        return 1
    if args.channel >= samples.shape[1]:
        print(f"No channel {args.channel} in {args.audio}.", file=sys.stderr)
        return 1

    settings = TrainSettings(
        sampling_rate=float(rate),
        fourier_length=args.fft,
        window_length=args.window if args.window is not None else args.fft,
        window_overlap=args.overlap,
        freq_range=(args.freq[0], args.freq[1]),
        time_range=args.time_range,
        scaling=args.scaling,
        hidden=tuple(args.hidden),
        learning_rate=args.learning_rate,
        epochs=args.epochs,
        batch_size=args.batch_size,
        seed=args.seed,
    )

    audio = np.ascontiguousarray(samples[:, args.channel])
    feats, labels = features_and_labels(settings, audio, intervals)
    n_pos = int(labels.sum())
    if not args.quiet:
        print(
            f"{len(feats)} evaluations ({n_pos} positive) from "
            f"{len(audio)/rate:.1f}s of audio; {settings.n_features} features"
        )
    if n_pos == 0 or n_pos == len(labels):
        print("Labels must contain both positive and negative spans.",
              file=sys.stderr)
        return 1

    mesh = None
    if args.data_parallel:
        from syllable_detector_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis="data")

    net_spec, params, threshold = train(
        settings, feats, labels, mesh=mesh, verbose=not args.quiet
    )
    cfg = export_trained_config(settings, net_spec, params, threshold)
    save_config(cfg, args.output)
    if not args.quiet:
        print(f"threshold {threshold:.4f}; wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
