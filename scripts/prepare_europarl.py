#!/usr/bin/env python
# coding: utf-8
"""Prepare Europarl-ST (counterpart of scripts/prepare_europarl.py): HF
`europarl_st` loader -> fbank80 -> zip manifest -> ASR/ST tsvs + joint
subword model.

Output layout:
    Europarl_ST/<trg>/<src>/
    ├── fbank80.zip
    ├── joey_{train,validation,test}_{asr,st}.tsv
    └── spm_bpe5000.{model,vocab}
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
SPLITS = ["train", "train.noisy", "validation", "test"]
N_MEL_FILTERS = 80
SP_MODEL_TYPE = "bpe"
VOCAB_SIZE = 5000


def process(data_root: str, src_lang: str, trg_lang: str):
    from datasets import DatasetDict, load_dataset

    root = Path(data_root).absolute()
    cur_root = root / trg_lang / src_lang
    feature_root = cur_root / f"fbank{N_MEL_FILTERS}"
    feature_root.mkdir(exist_ok=True, parents=True)

    dataset_dict = DatasetDict()
    for split in SPLITS:
        print(f"Load Europarl-ST {src_lang}-{trg_lang} {split}.")
        dataset_dict[split] = load_dataset(
            "europarl_st", split=split, name=f"{src_lang}-{trg_lang}",
            data_dir=root.as_posix())

        def _extract(row, i):
            n_frames = 0
            try:
                wav = np.asarray(row["audio"]["array"], np.float32) * (2**15)
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
            desc=f"Extracting log mel filter bank features ({split})...")

    print("ZIPing features...")
    create_zip(feature_root, feature_root.with_suffix(".zip"))
    zip_manifest = get_zip_manifest(feature_root.with_suffix(".zip"))

    for split in SPLITS:
        rows_asr, rows_st = [], []
        for row in dataset_dict[split]:
            utt_id = row["id"]
            if utt_id not in zip_manifest or row["n_frames"] == 0:
                continue
            src = zip_manifest[utt_id]
            rows_asr.append((utt_id, src, row["n_frames"], row["sentence"].strip()))
            rows_st.append((utt_id, src, row["n_frames"], row["translation"].strip()))
        save_tsv(pd.DataFrame(rows_asr, columns=COLUMNS),
                 cur_root / f"joey_{split}_asr.tsv")
        save_tsv(pd.DataFrame(rows_st, columns=COLUMNS),
                 cur_root / f"joey_{split}_st.tsv")
        print(f"{split}: {len(rows_asr)} utterances")

    train = dataset_dict["train"]
    raw_file = cur_root / "train_text.txt"
    with raw_file.open("w", encoding="utf-8") as f:
        for row in train:
            f.write(row["sentence"].strip() + "\n")
            f.write(row["translation"].strip() + "\n")
    build_sp_model(raw_file, cur_root / f"spm_bpe{VOCAB_SIZE}",
                   SimpleNamespace(**SPECIAL_SYMBOLS),
                   model_type=SP_MODEL_TYPE, vocab_size=VOCAB_SIZE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", "-d", required=True, type=str)
    ap.add_argument("--src_lang", default="en", type=str)
    ap.add_argument("--trg_lang", default="de", type=str)
    args = ap.parse_args()
    process(args.data_root, args.src_lang, args.trg_lang)


if __name__ == "__main__":
    main()
