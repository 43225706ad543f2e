#!/usr/bin/env python
# coding: utf-8
"""Prepare MuST-C for ASR/ST training (counterpart of
scripts/prepare_mustc.py): HF `mustc` loader -> fbank80 .npy -> zip manifest
-> joey tsvs for ASR (en transcripts) and ST (target-language translations)
+ joint subword model.

Expected output layout (matches configs/mustc_*.yaml):
    MUSTC_ROOT/en-<lang>/
    ├── fbank80.zip
    ├── joey_{train,dev,tst-COMMON,tst-HE}_{asr,st}.tsv
    └── spm_bpe<size>.{model,vocab}
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
from normalizer import Normalizer

from joeys2t_tpu.data.audio_io import extract_fbank_features

COLUMNS = ["id", "src", "n_frames", "trg", "speaker"]
SPLITS = ["train", "validation", "tst.COMMON", "tst.HE"]

N_MEL_FILTERS = 80
SP_MODEL_TYPE = "bpe"
VOCAB_SIZE = 5000
LOWERCASE = {"en": True, "de": False, "ja": False}


def process(data_root: str, languages):
    from datasets import DatasetDict, load_dataset

    root = Path(data_root).absolute()
    for lang in languages:
        cur_root = root / f"en-{lang}"
        feature_root = cur_root / f"fbank{N_MEL_FILTERS}"
        feature_root.mkdir(exist_ok=True, parents=True)

        mapping_path = Path(__file__).resolve().parent / "mapping_en.txt"
        normalizer = {
            "en": Normalizer(lang="en", lowercase=LOWERCASE["en"], remove_punc=True,
                             normalize_num=True, mapping_path=mapping_path),
            lang: Normalizer(lang=lang, lowercase=LOWERCASE.get(lang, False),
                             remove_punc=False, normalize_num=False),
        }

        dataset_dict = DatasetDict()
        for split in SPLITS:
            print(f"Load MuST-C en-{lang} {split} dataset.")
            dataset_dict[split] = load_dataset("mustc", split=split,
                                               name=f"en-{lang}",
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
        print("Fetching ZIP manifest...")
        zip_manifest = get_zip_manifest(feature_root.with_suffix(".zip"))

        for split in SPLITS:
            rows_asr, rows_st = [], []
            for row in dataset_dict[split]:
                utt_id = row["id"]
                src = zip_manifest[utt_id]
                en = normalizer["en"](row["sentence"])
                tr = normalizer[lang](row["translation"])
                speaker = row.get("speaker_id", "")
                rows_asr.append((utt_id, src, row["n_frames"], en, speaker))
                rows_st.append((utt_id, src, row["n_frames"], tr, speaker))
            name = split.replace("validation", "dev").replace("tst.", "tst-")
            save_tsv(pd.DataFrame(rows_asr, columns=COLUMNS),
                     cur_root / f"joey_{name}_asr.tsv")
            save_tsv(pd.DataFrame(rows_st, columns=COLUMNS),
                     cur_root / f"joey_{name}_st.tsv")
            print(f"{split}: {len(rows_asr)} utterances")

        # joint subword model over train transcripts + translations
        train = dataset_dict["train"]
        raw_file = cur_root / "train_text.txt"
        with raw_file.open("w", encoding="utf-8") as f:
            for row in train:
                f.write(normalizer["en"](row["sentence"]) + "\n")
                f.write(normalizer[lang](row["translation"]) + "\n")
        build_sp_model(raw_file, cur_root / f"spm_bpe{VOCAB_SIZE}",
                       SimpleNamespace(**SPECIAL_SYMBOLS),
                       model_type=SP_MODEL_TYPE, vocab_size=VOCAB_SIZE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", "-d", required=True, type=str)
    ap.add_argument("--languages", nargs="+", default=["de"])
    args = ap.parse_args()
    process(args.data_root, args.languages)


if __name__ == "__main__":
    main()
