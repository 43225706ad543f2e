#!/usr/bin/env python
# coding: utf-8
"""Prepare OpenSLR ASR corpora (counterpart of scripts/prepare_openslr.py):
HF `openslr` loader -> fbank80 -> zip manifest -> seeded train/dev/test split
tsvs + subword model.

Output layout (matches configs/openslr_asr.yaml):
    OpenSLR/<name>/
    ├── fbank80.zip
    ├── joey_{train,dev,test}_asr.tsv
    └── spm_bpe1000.{model,vocab}
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

COLUMNS = ["id", "src", "n_frames", "trg"]
SEED = 123
N_MEL_FILTERS = 80
SP_MODEL_TYPE = "bpe"
VOCAB_SIZE = 1000


def process(data_root: str, name: str):
    from datasets import load_dataset

    root = Path(data_root).absolute()
    cur_root = root / name
    feature_root = cur_root / f"fbank{N_MEL_FILTERS}"
    feature_root.mkdir(exist_ok=True, parents=True)

    print(f"Fetching OpenSLR {name} dataset...")
    dataset = load_dataset("openslr", name)["train"]

    def _extract(row, i):
        n_frames = 0
        try:
            wav = np.asarray(row["audio"]["array"], np.float32) * (2**15)
            utt_id = Path(row["path"]).stem
            npy = extract_fbank_features(
                waveform=wav, sample_rate=row["audio"]["sampling_rate"],
                output_path=feature_root / f"{utt_id}.npy",
                n_mel_bins=N_MEL_FILTERS, overwrite=False)
            n_frames = npy.shape[0]
        except Exception as e:  # pylint: disable=broad-except
            print(i, row["path"], e)
        return n_frames

    dataset = dataset.map(lambda row, i: {"n_frames": _extract(row, i)},
                          with_indices=True,
                          desc="Extracting log mel filter bank features...")

    print("ZIPing features...")
    create_zip(feature_root, feature_root.with_suffix(".zip"))
    zip_manifest = get_zip_manifest(feature_root.with_suffix(".zip"))

    rows = []
    for row in dataset:
        utt_id = Path(row["path"]).stem
        if utt_id not in zip_manifest or row["n_frames"] == 0:
            continue
        rows.append((utt_id, zip_manifest[utt_id], row["n_frames"],
                     row["sentence"].strip()))
    df = pd.DataFrame(rows, columns=COLUMNS)

    # seeded 90/5/5 split
    rng = np.random.RandomState(SEED)
    perm = rng.permutation(len(df))
    n_dev = n_test = max(len(df) // 20, 1)
    splits = {
        "test": df.iloc[perm[:n_test]],
        "dev": df.iloc[perm[n_test:n_test + n_dev]],
        "train": df.iloc[perm[n_test + n_dev:]],
    }
    for split, split_df in splits.items():
        save_tsv(split_df, cur_root / f"joey_{split}_asr.tsv")
        print(f"{split}: {len(split_df)} utterances")

    raw_file = cur_root / "train_text.txt"
    raw_file.write_text("\n".join(splits["train"]["trg"]) + "\n", encoding="utf-8")
    build_sp_model(raw_file, cur_root / f"spm_bpe{VOCAB_SIZE}",
                   SimpleNamespace(**SPECIAL_SYMBOLS),
                   model_type=SP_MODEL_TYPE, vocab_size=VOCAB_SIZE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", "-d", required=True, type=str)
    ap.add_argument("--name", default="SLR70", type=str)
    args = ap.parse_args()
    process(args.data_root, args.name)


if __name__ == "__main__":
    main()
