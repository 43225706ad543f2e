#!/usr/bin/env python
# coding: utf-8
"""Generate a synthetic MT corpus for flagship-scale end-to-end training.

The MT-leg counterpart of scripts/generate_synthetic_asr.py: no public
parallel corpus is reachable in this environment, so this builds a
translation task that is deterministic (BLEU-measurable against a single
correct reference) yet requires genuine seq2seq machinery — none of it is
solvable by token-wise copying:

  * lexical translation over a ~6k nonce-word source lexicon;
  * context-dependent disambiguation: ambiguous verbs translate
    differently depending on the GENDER CLASS of the preceding noun
    (cross-token attention);
  * local reordering: each source chunk `ADJ* NOUN [VERB]` is emitted
    verb-first with the adjectives reversed after the noun (the model
    must learn systematic word-order transformation);
  * morphology-like insertion: a gender particle follows every noun.

Source sentences are 2-5 chunks; splits are disjoint sentence strings.
Word-level tokenization, vocab built from the training split by the
standard pipeline (voc_limit in the config).

Usage:
  python scripts/generate_synthetic_mt.py [--out DIR] [--train N]
         [--dev N] [--test N] [--seed S]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

CONS = list("ptkbdgmnszlrvf")
VOWELS = list("aeiou")

N_NOUN, N_VERB, N_ADJ = 3200, 1600, 1200
AMBIG_FRACTION = 0.2  # of verbs
PARTICLES = ["qa", "qe", "qo"]  # one per noun gender class


def _nonce(rng: np.random.RandomState, n_syll: int, suffix: str = "") -> str:
    s = "".join(CONS[rng.randint(len(CONS))] + VOWELS[rng.randint(len(VOWELS))]
                for _ in range(n_syll))
    return s + suffix


def build_lexicon(seed: int):
    """Returns (nouns, verbs, adjs) lists of dict entries.

    noun: {src, trg, gender}
    verb: {src, trg} or {src, trg_a, trg_b} (ambiguous: _a after gender-0/1
          noun, _b otherwise)
    adj:  {src, trg}
    """
    rng = np.random.RandomState(seed)
    used = set()

    def fresh(suffix=""):
        # 3 syllables: (14*5)^3 = 343k bases, so rejection sampling stays
        # cheap for the ~9k forms drawn (2 syllables would livelock: only
        # 4900 bases for 6000 source words)
        while True:
            w = _nonce(rng, 3, suffix)
            if w not in used:
                used.add(w)
                return w

    nouns = [{"src": fresh(), "trg": fresh("ne"),
              "gender": int(rng.randint(3))} for _ in range(N_NOUN)]
    verbs = []
    for i in range(N_VERB):
        src = fresh()
        if rng.rand() < AMBIG_FRACTION:
            verbs.append({"src": src, "trg_a": fresh("va"),
                          "trg_b": fresh("vo")})
        else:
            verbs.append({"src": src, "trg": fresh("ve")})
    adjs = [{"src": fresh(), "trg": fresh("je")} for _ in range(N_ADJ)]
    return nouns, verbs, adjs


def sample_pair(rng, nouns, verbs, adjs):
    """One (src, trg) sentence pair."""
    src, trg = [], []
    n_chunks = rng.randint(2, 6)
    for _ in range(n_chunks):
        chunk_adjs = [adjs[rng.randint(N_ADJ)] for _ in range(rng.randint(0, 3))]
        noun = nouns[rng.randint(N_NOUN)]
        verb = verbs[rng.randint(N_VERB)] if rng.rand() < 0.8 else None

        # source order: ADJ* NOUN [VERB]
        src += [a["src"] for a in chunk_adjs] + [noun["src"]]
        if verb is not None:
            src.append(verb["src"])

        # target order: [VERB] NOUN PARTICLE ADJ*(reversed)
        if verb is not None:
            if "trg" in verb:
                trg.append(verb["trg"])
            else:  # disambiguate on the preceding noun's gender
                trg.append(verb["trg_a"] if noun["gender"] in (0, 1)
                           else verb["trg_b"])
        trg.append(noun["trg"])
        trg.append(PARTICLES[noun["gender"]])
        trg += [a["trg"] for a in reversed(chunk_adjs)]
    return " ".join(src), " ".join(trg)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/synthetic_mt")
    ap.add_argument("--train", type=int, default=30000)
    ap.add_argument("--dev", type=int, default=500)
    ap.add_argument("--test", type=int, default=500)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    nouns, verbs, adjs = build_lexicon(args.seed)
    rng = np.random.RandomState(args.seed + 1)

    seen = set()
    for split, n in [("train", args.train), ("dev", args.dev),
                     ("test", args.test)]:
        src_lines, trg_lines = [], []
        while len(src_lines) < n:
            s, t = sample_pair(rng, nouns, verbs, adjs)
            if s in seen:  # disjoint splits
                continue
            seen.add(s)
            src_lines.append(s)
            trg_lines.append(t)
        (out / f"{split}.src").write_text("\n".join(src_lines) + "\n",
                                          encoding="utf-8")
        (out / f"{split}.trg").write_text("\n".join(trg_lines) + "\n",
                                          encoding="utf-8")
        print(f"{split}: {n} pairs")
    print(f"wrote corpus to {out}")


if __name__ == "__main__":
    sys.exit(main())
