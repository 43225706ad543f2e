#!/usr/bin/env python
# coding: utf-8
"""Generate a synthetic ASR corpus for flagship-scale end-to-end training.

Analogous to scripts/generate_reverse_task.py for the MT leg: no public
dataset is reachable in this environment, so this builds a speech-shaped
recognition task that exercises the ENTIRE S2T pipeline (tsv manifests,
.npy feature lookup, CMVN/SpecAugment, conv subsampling, joint CTC,
validation WER, beam decode) with non-trivial alignment learning.

Each character is rendered as a fixed 80-dim log-mel "template" (a
char-specific mixture of spectral bumps) stretched to a random duration
of 6..10 frames, with per-utterance gain ("speaker"), additive noise and
silence padding — so the model must learn BOTH where characters are
(alignment, via conv subsampling + CTC) and what they look like
(classification). Deterministic per seed; dev/test are drawn from the
same distribution but are disjoint word sequences.

Output layout (default data/synthetic_asr/):
  train.tsv / dev.tsv / test.tsv   id|src|n_frames|trg|speaker manifests
  feats/<id>.npy                   float32 (n_frames, 80) features
  char.txt                         char vocabulary (reference format)

Usage:
  python scripts/generate_synthetic_asr.py [--out DIR] [--train N]
         [--dev N] [--test N] [--seed S]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

CHARS = "abcdefghijklmnopqrstuvwxyz"
N_MELS = 80
FRAMES_PER_CHAR = (6, 11)  # duration drawn uniform [6, 10]
SILENCE = (5, 15)  # leading/trailing silence frames

# a small closed lexicon: recognizable words, enough distinct char contexts
WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "speech", "model", "tensor", "audio", "frame", "batch", "token",
    "beam", "search", "loss", "train", "valid", "test", "chip", "mesh",
    "scale", "kernel", "cache", "decode", "encode", "sample", "signal",
    "filter", "window", "spectral", "hidden", "layer", "attention",
    "vocab", "greedy", "output", "input", "state", "value", "query",
    "zero", "one", "two", "three", "four", "five", "six", "seven",
    "eight", "nine", "ten", "alpha", "beta", "gamma", "delta", "omega",
]


def char_template(ch: str, rng: np.random.RandomState) -> np.ndarray:
    """Fixed (N_MELS,) spectral signature for a character: 2-3 gaussian
    bumps at char-specific mel positions."""
    idx = CHARS.index(ch)
    centers = [(7 * idx + 11) % N_MELS, (13 * idx + 37) % N_MELS,
               (29 * idx + 5) % N_MELS]
    mel = np.arange(N_MELS, dtype=np.float32)
    sig = np.zeros(N_MELS, np.float32)
    for j, c in enumerate(centers):
        width = 2.0 + (idx + j) % 4
        sig += np.exp(-0.5 * ((mel - c) / width) ** 2) * (1.0 - 0.2 * j)
    return sig


def render(text: str, templates: dict, rng: np.random.RandomState,
           gain: float) -> np.ndarray:
    """Text -> (n_frames, 80) synthetic log-mel features."""
    frames = [np.zeros((rng.randint(*SILENCE), N_MELS), np.float32)]
    for ch in text:
        if ch == " ":
            frames.append(np.zeros((rng.randint(3, 7), N_MELS), np.float32))
            continue
        dur = rng.randint(*FRAMES_PER_CHAR)
        # attack/decay envelope over the char's duration
        env = np.sin(np.linspace(0.15, np.pi - 0.15, dur)).astype(np.float32)
        frames.append(env[:, None] * templates[ch][None, :])
    frames.append(np.zeros((rng.randint(*SILENCE), N_MELS), np.float32))
    feat = np.concatenate(frames, axis=0) * gain
    # log-mel-like dynamic range + noise floor
    noise = rng.randn(*feat.shape).astype(np.float32) * 0.08
    return np.log(feat * 4.0 + 0.02).astype(np.float32) + noise


def sample_text(rng: np.random.RandomState) -> str:
    n_words = rng.randint(3, 9)
    return " ".join(WORDS[rng.randint(len(WORDS))] for _ in range(n_words))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/synthetic_asr")
    ap.add_argument("--train", type=int, default=2000)
    ap.add_argument("--dev", type=int, default=100)
    ap.add_argument("--test", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    out = Path(args.out)
    (out / "feats").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    templates = {ch: char_template(ch, rng) for ch in CHARS}

    seen = set()
    for split, n in [("train", args.train), ("dev", args.dev),
                     ("test", args.test)]:
        rows = ["id\tsrc\tn_frames\ttrg\tspeaker"]
        made = 0
        while made < n:
            text = sample_text(rng)
            if text in seen:  # splits must stay disjoint
                continue
            seen.add(text)
            gain = float(rng.uniform(0.6, 1.4))  # "speaker" loudness
            feat = render(text, templates, rng, gain)
            uid = f"{split}-{made:05d}"
            np.save(out / "feats" / f"{uid}.npy", feat)
            rows.append(f"{uid}\tfeats/{uid}.npy\t{feat.shape[0]}\t{text}"
                        f"\tspk{int(gain * 10)}")
            made += 1
        (out / f"{split}.tsv").write_text("\n".join(rows) + "\n",
                                          encoding="utf-8")
        print(f"{split}: {made} utterances")

    (out / "char.txt").write_text(
        "\n".join([chr(9601)] + list(CHARS)) + "\n", encoding="utf-8")
    print(f"wrote corpus to {out}")


if __name__ == "__main__":
    sys.exit(main())
