#!/usr/bin/env python
# coding: utf-8
"""Average parameters over checkpoints (counterpart of
scripts/average_checkpoints.py, fairseq-style uniform averaging).

Usage:
    python scripts/average_checkpoints.py --inputs m/10000.ckpt m/12000.ckpt \
        --output m/avg2.ckpt
    python scripts/average_checkpoints.py --model-dir m --num 5 --output m/avg5.ckpt
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from joeys2t_tpu.checkpoints import average_checkpoints, save_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="*", default=None,
                    help="explicit checkpoint paths to average")
    ap.add_argument("--model-dir", type=str, default=None,
                    help="pick the newest --num checkpoints from this dir")
    ap.add_argument("--num", type=int, default=5)
    ap.add_argument("--output", required=True, type=str)
    args = ap.parse_args()

    if args.inputs:
        paths = [Path(p) for p in args.inputs]
    else:
        assert args.model_dir, "provide --inputs or --model-dir"
        ckpts = [p for p in Path(args.model_dir).glob("*.ckpt")
                 if not p.is_symlink() and p.stem.isdigit()]
        paths = sorted(ckpts, key=lambda p: int(p.stem))[-args.num:]
    assert paths, "no checkpoints found"
    print(f"Averaging {len(paths)} checkpoints:")
    for p in paths:
        print(f"  {p}")
    avg = average_checkpoints(paths)
    save_checkpoint(Path(args.output), avg)
    print(f"Saved to {args.output}")


if __name__ == "__main__":
    main()
