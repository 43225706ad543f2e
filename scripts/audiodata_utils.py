#!/usr/bin/env python
# coding: utf-8
"""Audio dataset preparation utilities (counterpart of
scripts/audiodata_utils.py in the reference): uncompressed-zip feature packs
with byte-offset manifests, tsv IO, and subword model training.

Subword training uses the sentencepiece library when installed; otherwise it
falls back to the first-party BPE learner (joeys2t_tpu.bpe) and writes a
subword-nmt codes file + vocab."""
import csv
import io
import zipfile
from collections import Counter
from pathlib import Path
from types import SimpleNamespace
from typing import Dict, Optional

import numpy as np
import pandas as pd

SPECIAL_SYMBOLS = {
    "unk_token": "<unk>",
    "pad_token": "<pad>",
    "bos_token": "<s>",
    "eos_token": "</s>",
    "sep_token": None,
    "unk_id": 0,
    "pad_id": 1,
    "bos_id": 2,
    "eos_id": 3,
    "sep_id": None,
    "lang_tags": [],
}
N_WORKERS = 16
SP_MODEL_TYPE = "bpe"
VOCAB_SIZE = 5000
LOWERCASE = False
CHARACTER_COVERAGE = 1.0


def _is_npy_data(data: bytes) -> bool:
    return data[0] == 147 and data[1] == 78


def get_zip_manifest(zip_path: Path, npy_root: Optional[Path] = None) -> Dict[str, str]:
    """Map utterance id -> "file.zip:offset:size" (uncompressed entries)."""
    manifest = {}
    with zipfile.ZipFile(zip_path, mode="r") as f:
        info = f.infolist()
    for i in info:
        utt_id = Path(i.filename).stem
        offset, file_size = i.header_offset + 30 + len(i.filename), i.file_size
        with zip_path.open("rb") as f:
            f.seek(offset)
            data = f.read(file_size)
            assert len(data) > 1 and _is_npy_data(data), (utt_id, len(data))
        manifest[utt_id] = f"{zip_path.name}:{offset}:{file_size}"
        if npy_root is not None:
            byte_data = np.load(io.BytesIO(data))
            npy_data = np.load((npy_root / f"{utt_id}.npy").as_posix())
            assert np.allclose(byte_data, npy_data)
    return manifest


def create_zip(data_root: Path, zip_path: Path) -> None:
    """Pack .npy features into an UNCOMPRESSED zip (byte-offset addressable)."""
    paths = sorted(data_root.glob("*.npy"))
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as f:
        for path in paths:
            f.write(path, arcname=path.name)


def save_tsv(df: pd.DataFrame, path: Path, header: bool = True) -> None:
    df.to_csv(path.as_posix(), sep="\t", header=header, index=False,
              encoding="utf-8", escapechar="\\", quoting=csv.QUOTE_NONE)


def load_tsv(path: Path) -> pd.DataFrame:
    return pd.read_csv(path.as_posix(), sep="\t", header=0, encoding="utf-8",
                       escapechar="\\", quoting=csv.QUOTE_NONE, na_filter=False)


def build_sp_model(input_path: Path, model_path_prefix: Path,
                   cfg: SimpleNamespace, **kwargs) -> None:
    """Train a subword model over the text in input_path.

    With sentencepiece installed this trains a real spm model; otherwise it
    learns BPE codes with joeys2t_tpu.bpe.learn_bpe and writes
    {prefix}.codes + {prefix}.vocab usable with tokenizer_type subword-nmt."""
    try:
        import sentencepiece as sp

        arguments = [
            f"--input={input_path.as_posix()}",
            f"--model_prefix={model_path_prefix.as_posix()}",
            f"--model_type={kwargs.get('model_type', SP_MODEL_TYPE)}",
            f"--vocab_size={kwargs.get('vocab_size', VOCAB_SIZE)}",
            f"--character_coverage={kwargs.get('character_coverage', CHARACTER_COVERAGE)}",
            f"--num_threads={kwargs.get('num_workers', N_WORKERS)}",
            f"--unk_piece={cfg.unk_token}",
            f"--bos_piece={cfg.bos_token}",
            f"--eos_piece={cfg.eos_token}",
            f"--pad_piece={cfg.pad_token}",
            f"--unk_id={cfg.unk_id}",
            f"--bos_id={cfg.bos_id}",
            f"--eos_id={cfg.eos_id}",
            f"--pad_id={cfg.pad_id}",
            "--vocabulary_output_piece_score=false",
        ]
        if cfg.sep_token:
            arguments.append(f"--control_symbols={cfg.sep_token}")
        user_defined = cfg.lang_tags + kwargs.get("user_defined_symbols", [])
        if user_defined:
            arguments.append(f"--user_defined_symbols={','.join(user_defined)}")
        sp.SentencePieceTrainer.Train(" ".join(arguments))
        return
    except ImportError:
        pass

    # first-party BPE fallback
    from joeys2t_tpu.bpe import learn_bpe, write_codes

    freqs: Counter = Counter()
    with Path(input_path).open("r", encoding="utf-8") as f:
        for line in f:
            for tok in line.strip().split():
                freqs[tok] += 1
    merges = learn_bpe(dict(freqs), kwargs.get("vocab_size", VOCAB_SIZE))
    write_codes(merges, Path(f"{model_path_prefix}.codes"))

    # derive the vocab by applying the codes to the corpus
    from joeys2t_tpu.bpe import BPE

    bpe = BPE.from_file(Path(f"{model_path_prefix}.codes"))
    piece_freqs: Counter = Counter()
    for tok, c in freqs.items():
        for piece in bpe.segment_word(tok):
            piece_freqs[piece] += c
    vocab = [cfg.unk_token, cfg.pad_token, cfg.bos_token, cfg.eos_token]
    if cfg.sep_token:
        vocab.append(cfg.sep_token)
    vocab += list(cfg.lang_tags)
    vocab += [p for p, _ in piece_freqs.most_common()]
    Path(f"{model_path_prefix}.vocab").write_text(
        "\n".join(vocab) + "\n", encoding="utf-8")
