#!/usr/bin/env python
# coding: utf-8
"""Generate synthetic reverse-task data (counterpart of
scripts/generate_reverse_task.py in the reference): src = random digit
sequences, trg = reversed sequences."""
import argparse
import random
from pathlib import Path


def generate_samples(n: int, low: int = 0, high: int = 50,
                     min_len: int = 3, max_len: int = 25, seed: int = 42):
    rng = random.Random(seed)
    src, trg = [], []
    for _ in range(n):
        length = rng.randint(min_len, max_len)
        seq = [str(rng.randint(low, high - 1)) for _ in range(length)]
        src.append(" ".join(seq))
        trg.append(" ".join(reversed(seq)))
    return src, trg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-dir", type=str, default="test/data/reverse")
    ap.add_argument("--train-size", type=int, default=50000)
    ap.add_argument("--dev-size", type=int, default=1000)
    ap.add_argument("--test-size", type=int, default=1000)
    ap.add_argument("--high", type=int, default=50)
    ap.add_argument("--max-len", type=int, default=25)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for split, n, seed in [("train", args.train_size, args.seed),
                           ("dev", args.dev_size, args.seed + 1),
                           ("test", args.test_size, args.seed + 2)]:
        src, trg = generate_samples(n, high=args.high, max_len=args.max_len, seed=seed)
        (out / f"{split}.src").write_text("\n".join(src) + "\n", encoding="utf-8")
        (out / f"{split}.trg").write_text("\n".join(trg) + "\n", encoding="utf-8")
        print(f"{split}: {n} examples -> {out}/{split}.{{src,trg}}")


if __name__ == "__main__":
    main()
