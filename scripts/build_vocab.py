#!/usr/bin/env python
# coding: utf-8
"""Build vocabulary files (and optionally subword models) from the training
data referenced by a config (counterpart of scripts/build_vocab.py).

Usage:
    python scripts/build_vocab.py configs/transformer_small.yaml \
        --joint --output-dir data/vocab
"""
import argparse
import sys
import tempfile
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from joeys2t_tpu.config import load_config, parse_special_symbols
from joeys2t_tpu.data.loader import load_data
from joeys2t_tpu.helpers import flatten, write_list_to_file
from joeys2t_tpu.vocabulary import sort_and_cut


def build_vocab_from_sents(sents, special_symbols, max_size, min_freq):
    counter = Counter(flatten(sents))
    unique_tokens = sort_and_cut(counter, max_size, min_freq)
    specials = [special_symbols.unk_token, special_symbols.pad_token,
                special_symbols.bos_token, special_symbols.eos_token]
    if special_symbols.sep_token:
        specials.append(special_symbols.sep_token)
    specials += list(special_symbols.lang_tags)
    return specials + [t for t in unique_tokens if t not in specials]


def run(cfg_path: str, joint: bool, output_dir: str, subword_type: str = None,
        vocab_size: int = 32000):
    cfg = load_config(Path(cfg_path))
    data_cfg = cfg["data"]
    task = cfg.get("task", data_cfg.get("task", "MT")).upper()
    data_cfg["special_symbols"] = parse_special_symbols(
        data_cfg.get("special_symbols", {}))
    special_symbols = data_cfg["special_symbols"]

    # avoid requiring existing vocab files while building them
    for side in ("src", "trg"):
        data_cfg.get(side, {}).pop("voc_file", None)

    src_vocab_ignored, trg_vocab_ignored, train_data, _, _ = load_data(
        data_cfg, datasets=["train"], task=task)
    assert train_data is not None, "no train data found"

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    langs = ([train_data.src_lang, train_data.trg_lang] if task == "MT"
             else [train_data.trg_lang])

    if subword_type:  # train a subword model first
        from audiodata_utils import build_sp_model
        from types import SimpleNamespace

        raw = Path(tempfile.mkstemp(suffix=".txt")[1])
        with raw.open("w", encoding="utf-8") as f:
            for lang in langs:
                for sent in train_data.get_list(lang, tokenized=False,
                                                subsampled=False):
                    f.write(sent + "\n")
        build_sp_model(raw, out / f"spm_{subword_type}{vocab_size}",
                       SimpleNamespace(**special_symbols.__dict__),
                       model_type=subword_type, vocab_size=vocab_size)
        print(f"Subword model written to {out}")
        return

    if joint and task == "MT":
        sents = []
        for lang in langs:
            sents.extend(train_data.get_list(lang, tokenized=True, subsampled=False))
        vocab = build_vocab_from_sents(
            sents, special_symbols,
            int(data_cfg["src"].get("voc_limit", 32000)),
            data_cfg["src"].get("voc_min_freq", 1))
        write_list_to_file(out / "vocab.txt", vocab)
        print(f"Joint vocab ({len(vocab)}) -> {out / 'vocab.txt'}")
    else:
        for lang in langs:
            side = "src" if lang == train_data.src_lang and task == "MT" else "trg"
            sents = train_data.get_list(lang, tokenized=True, subsampled=False)
            vocab = build_vocab_from_sents(
                sents, special_symbols,
                int(data_cfg[side].get("voc_limit", 32000)),
                data_cfg[side].get("voc_min_freq", 1))
            write_list_to_file(out / f"{side}_vocab.txt", vocab)
            print(f"{side} vocab ({len(vocab)}) -> {out}/{side}_vocab.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config_path", type=str, help="path to YAML config file")
    ap.add_argument("--joint", action="store_true", help="build joint vocab")
    ap.add_argument("--output-dir", type=str, default=".")
    ap.add_argument("--subword-type", type=str, default=None,
                    choices=[None, "bpe", "unigram", "char"])
    ap.add_argument("--vocab-size", type=int, default=32000)
    args = ap.parse_args()
    run(args.config_path, args.joint, args.output_dir, args.subword_type,
        args.vocab_size)


if __name__ == "__main__":
    main()
