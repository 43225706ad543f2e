#!/usr/bin/env python
# coding: utf-8
"""Plot learning curves from validations.txt (counterpart of
scripts/plot_validations.py)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from joeys2t_tpu.plotting import plot_learning_curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dirs", nargs="+", type=str,
                    help="model dirs containing validations.txt")
    ap.add_argument("--plot-values", nargs="*", default=None,
                    help="metrics to plot (default: all)")
    ap.add_argument("--output-path", type=str, default="plot.png")
    args = ap.parse_args()

    for model_dir in args.model_dirs:
        valid_file = Path(model_dir) / "validations.txt"
        assert valid_file.is_file(), f"{valid_file} not found"
        out = args.output_path if len(args.model_dirs) == 1 else \
            f"{Path(model_dir).name}_{args.output_path}"
        plot_learning_curve(valid_file.as_posix(), out, metrics=args.plot_values)
        print(f"Plot saved to {out}")


if __name__ == "__main__":
    main()
