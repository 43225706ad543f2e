#!/usr/bin/env python
# coding: utf-8
"""Generate a synthetic end-to-end SPEECH TRANSLATION corpus.

ST-leg counterpart of generate_synthetic_asr.py (ASR) and
generate_synthetic_mt.py (MT): the source side is the same synthetic
speech rendering (char-template log-mel features with duration jitter,
noise, per-utterance gain), but the target is a TRANSLATION into a nonce
language, not a transcript:

  * deterministic word lexicon: each source word maps to a nonce form;
  * reordering: the sentence is emitted in chunks of 3 source words with
    each chunk's translations REVERSED (so the model cannot succeed with
    a monotonic CTC-style alignment alone — real seq2seq attention);
  * a sentence-final particle encodes the parity of the source length
    (a global feature the decoder must aggregate).

This exercises the full ST path at deployment scale: speech frontend +
conv subsampling + encoder, cross-attention translation decode, BLEU
evaluation protocol — the reference's MuST-C ST recipe shape
(/root/reference/configs/mustc_st.yaml) without a reachable dataset.

Usage:
  python scripts/generate_synthetic_st.py [--out DIR] [--train N]
         [--dev N] [--test N] [--seed S]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from generate_synthetic_asr import (  # noqa: E402
    CHARS,
    WORDS,
    char_template,
    render,
    sample_text,
)

CONS = list("ptkbdgmnszlrvf")
VOWELS = list("aeiou")
CHUNK = 3
PARTICLES = ("pom", "tak")  # even / odd source length


def build_lexicon(seed: int):
    rng = np.random.RandomState(seed)
    used = set()
    lex = {}
    for w in WORDS:
        while True:
            t = "".join(CONS[rng.randint(len(CONS))] +
                        VOWELS[rng.randint(len(VOWELS))] for _ in range(3))
            if t not in used:
                used.add(t)
                lex[w] = t
                break
    return lex


def translate(text: str, lex: dict) -> str:
    words = text.split()
    out = []
    for i in range(0, len(words), CHUNK):
        out += [lex[w] for w in reversed(words[i:i + CHUNK])]
    out.append(PARTICLES[len(words) % 2])
    return " ".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/synthetic_st")
    ap.add_argument("--train", type=int, default=2000)
    ap.add_argument("--dev", type=int, default=100)
    ap.add_argument("--test", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    out = Path(args.out)
    (out / "feats").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    templates = {ch: char_template(ch, rng) for ch in CHARS}
    lex = build_lexicon(args.seed + 100)

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
            gain = float(rng.uniform(0.6, 1.4))
            feat = render(text, templates, rng, gain)
            trg = translate(text, lex)
            uid = f"{split}-{made:05d}"
            np.save(out / "feats" / f"{uid}.npy", feat)
            rows.append(f"{uid}\tfeats/{uid}.npy\t{feat.shape[0]}\t{trg}"
                        f"\tspk{int(gain * 10)}")
            made += 1
        (out / f"{split}.tsv").write_text("\n".join(rows) + "\n",
                                          encoding="utf-8")
        print(f"{split}: {made} utterances")

    # word-level target vocabulary file (reference format: one token/line,
    # specials prepended by Vocabulary)
    vocab = sorted(set(lex.values())) + list(PARTICLES)
    (out / "trg_vocab.txt").write_text("\n".join(vocab) + "\n",
                                       encoding="utf-8")
    print(f"wrote corpus to {out}")


if __name__ == "__main__":
    sys.exit(main())
