#!/usr/bin/env python
# coding: utf-8
"""Prepare LibriSpeech for S2T training (counterpart of
scripts/prepare_librispeech.py in the reference):

HF `librispeech_asr` -> 80-dim fbank .npy -> uncompressed zip + byte-offset
manifest -> per-split joey tsv (`id|src|n_frames|trg`) -> subword vocab.

Expected output layout (matches configs/librispeech_*.yaml):
    LibriSpeech/
    ├── fbank80.zip
    ├── joey_train-clean-100.tsv
    ├── joey_dev-clean.tsv / joey_test-clean.tsv / ...
    └── spm_train-clean-100_unigram5000.{model,vocab}
"""
import argparse
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from audiodata_utils import (
    SPECIAL_SYMBOLS,
    build_sp_model,
    create_zip,
    get_zip_manifest,
    save_tsv,
)

from joeys2t_tpu.data.audio_io import extract_fbank_features

N_MEL_FILTERS = 80
SP_MODEL_TYPE = "unigram"
VOCAB_SIZE = {"train.clean.100": 5000, "train.960": 10000}
LOWERCASE = True

SPLITS = [
    "train.clean.100",
    "train.clean.360",
    "train.other.500",
    "validation.clean",
    "validation.other",
    "test.clean",
    "test.other",
]


def process(output_root: str, splits=None):
    from datasets import load_dataset

    out_root = Path(output_root).absolute()
    out_root.mkdir(exist_ok=True, parents=True)
    feature_root = out_root / f"fbank{N_MEL_FILTERS}"
    feature_root.mkdir(exist_ok=True)

    splits = splits or SPLITS
    print("Fetching librispeech dataset...")
    dataset_dict = load_dataset("librispeech_asr", name="all")

    for split in splits:
        def _extract(row, i):
            n_frames = 0
            try:
                wav = np.asarray(row["audio"]["array"], dtype=np.float32) * (2**15)
                npy = extract_fbank_features(
                    waveform=wav, sample_rate=row["audio"]["sampling_rate"],
                    output_path=feature_root / f"{row['id']}.npy",
                    n_mel_bins=N_MEL_FILTERS, overwrite=False)
                n_frames = npy.shape[0]
            except Exception as e:  # pylint: disable=broad-except
                print(i, row["id"], e)
            return n_frames

        dataset_dict[split] = dataset_dict[split].map(
            lambda row, i: {"n_frames": _extract(row, i)}, with_indices=True,
            desc="Extracting log mel filter bank features...")

    print("ZIPing features...")
    create_zip(feature_root, feature_root.with_suffix(".zip"))
    print("Fetching ZIP manifest...")
    zip_manifest = get_zip_manifest(feature_root.with_suffix(".zip"),
                                    npy_root=feature_root)

    dfs = []
    for split in splits:
        dataset_dict[split] = dataset_dict[split].map(
            lambda row: {
                "src": zip_manifest[row["id"]],
                "trg": row["text"].lower() if LOWERCASE else row["text"],
                "split": split,
            },
            desc="Generating manifest...",
            remove_columns=["file", "audio", "speaker_id", "chapter_id", "text"])
        dfs.append(dataset_dict[split].to_pandas())
    all_df = pd.concat(dfs)
    save_tsv(all_df, out_root / "joey_all_data.tsv")

    # per-split tsvs with joey column order
    for split in splits:
        df = all_df[all_df["split"] == split]
        df = df[["id", "src", "n_frames", "trg"]]
        name = split.replace("validation", "dev").replace(".", "-")
        save_tsv(df, out_root / f"joey_{name}.tsv")
        print(f"{split}: {len(df)} utterances -> joey_{name}.tsv")

    # train-960 = all train splits
    train_splits = [s for s in splits if s.startswith("train")]
    if len(train_splits) > 1:
        df960 = all_df[all_df["split"].isin(train_splits)][
            ["id", "src", "n_frames", "trg"]]
        save_tsv(df960, out_root / "joey_train-960.tsv")

    # subword models over the train transcripts
    for split, vocab_size in VOCAB_SIZE.items():
        if split == "train.960":
            if len(train_splits) <= 1:
                continue
            text = all_df[all_df["split"].isin(train_splits)]["trg"]
        elif split in splits:
            text = all_df[all_df["split"] == split]["trg"]
        else:
            continue
        raw_file = out_root / f"{split}.txt"
        raw_file.write_text("\n".join(text) + "\n", encoding="utf-8")
        name = split.replace("validation", "dev").replace(".", "-")
        build_sp_model(raw_file, out_root / f"spm_{name}_unigram{vocab_size}",
                       SimpleNamespace(**SPECIAL_SYMBOLS),
                       model_type=SP_MODEL_TYPE, vocab_size=vocab_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", "-d", required=True, type=str)
    ap.add_argument("--splits", nargs="*", default=None,
                    help="subset of splits to process")
    args = ap.parse_args()
    process(args.data_root, args.splits)


if __name__ == "__main__":
    main()
