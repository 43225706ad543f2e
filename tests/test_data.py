# coding: utf-8
"""Data pipeline tests mirroring test/unit/test_data.py: batch construction,
teacher-forcing shift, seeded subsampling determinism, S2T batches from real
wavs, and static-shape bucketing (new, TPU-specific)."""
from pathlib import Path

import numpy as np
import pytest

from joeys2t_tpu.data.batch import Batch, round_up_to_bucket
from joeys2t_tpu.data.loader import load_data

REF_DATA = Path("/root/reference/test/data")
needs_ref = pytest.mark.skipif(not REF_DATA.is_dir(), reason="reference fixtures absent")

SPECIALS = {
    "unk_token": "<unk>", "pad_token": "<pad>", "bos_token": "<s>",
    "eos_token": "</s>", "sep_token": None, "unk_id": 0, "pad_id": 1,
    "bos_id": 2, "eos_id": 3, "sep_id": None, "lang_tags": [],
}


def toy_mt_cfg():
    from joeys2t_tpu.config import parse_special_symbols

    return {
        "train": (REF_DATA / "toy/train").as_posix(),
        "dev": (REF_DATA / "toy/dev").as_posix(),
        "test": (REF_DATA / "toy/test").as_posix(),
        "src": {"lang": "de", "level": "word", "lowercase": False, "max_length": 10},
        "trg": {"lang": "en", "level": "word", "lowercase": False, "max_length": 10},
        "dataset_type": "plain",
        "special_symbols": parse_special_symbols({}),
    }


def speech_cfg():
    from joeys2t_tpu.config import parse_special_symbols

    return {
        "train": (REF_DATA / "speech/test").as_posix(),
        "dev": (REF_DATA / "speech/test").as_posix(),
        "src": {"lang": "en", "level": "frame", "num_freq": 80, "max_length": 500,
                "tokenizer_cfg": {}},
        "trg": {"lang": "en", "level": "char", "lowercase": True, "max_length": 50,
                "voc_file": (REF_DATA / "speech/char.txt").as_posix()},
        "dataset_type": "speech",
        "special_symbols": parse_special_symbols({}),
    }


class TestBatch:
    def test_teacher_forcing_shift(self):
        """trg_input = trg w/o EOS, trg = trg w/o BOS (joeynmt/batch.py:79-96)."""
        trg = np.array([[2, 5, 6, 3], [2, 7, 3, 1]])  # bos=2 eos=3 pad=1
        batch = Batch(src=np.array([[4, 5], [6, 1]]), src_length=np.array([2, 1]),
                      src_prompt_mask=None, trg=trg, trg_length=np.array([4, 3]),
                      trg_prompt_mask=None, indices=np.array([0, 1]),
                      pad_index=1, eos_index=3, is_train=True, task="MT")
        np.testing.assert_array_equal(batch.trg_input, [[2, 5, 6], [2, 7, 1]])
        np.testing.assert_array_equal(batch.trg, [[5, 6, 3], [7, 3, 1]])
        np.testing.assert_array_equal(batch.trg_length, [3, 2])
        assert batch.ntokens == 5
        np.testing.assert_array_equal(batch.src_mask[:, 0],
                                      [[True, True], [True, False]])

    def test_normalize(self):
        batch = Batch(src=np.array([[4, 5], [6, 1]]), src_length=np.array([2, 1]),
                      src_prompt_mask=None, trg=np.array([[2, 5, 3], [2, 7, 3]]),
                      trg_length=np.array([3, 3]), trg_prompt_mask=None,
                      indices=np.array([0, 1]), pad_index=1, eos_index=3,
                      is_train=True, task="MT")
        assert batch.normalize(8.0, "batch") == 4.0
        assert batch.normalize(8.0, "tokens") == 8.0 / batch.ntokens
        assert batch.normalize(8.0, "none") == 8.0

    def test_pad_to_shape(self):
        batch = Batch(src=np.array([[4, 5, 6]]), src_length=np.array([3]),
                      src_prompt_mask=None, trg=np.array([[2, 5, 3]]),
                      trg_length=np.array([3]), trg_prompt_mask=None,
                      indices=np.array([0]), pad_index=1, eos_index=3,
                      is_train=True, task="MT")
        padded = batch.pad_to_shape(batch_size=4)
        assert padded.src.shape == (4, 8)  # bucket 8
        assert padded.trg.shape == (4, 8)
        assert padded.src[0, 3] == 1  # pad value
        assert (padded.indices[1:] == -1).all()
        assert not padded.trg_mask[1:].any()  # dummy rows fully masked

    def test_bucket_function(self):
        assert round_up_to_bucket(3) == 8
        assert round_up_to_bucket(8) == 8
        assert round_up_to_bucket(9) == 16
        assert round_up_to_bucket(1000) == 1024


@needs_ref
class TestMTData:
    def test_load_and_iterate(self):
        src_vocab, trg_vocab, train, dev, test = load_data(
            toy_mt_cfg(), datasets=["train", "dev", "test"], task="MT")
        assert len(train) == 1000
        assert src_vocab is not None
        it = train.make_iter(batch_size=4, batch_type="sentence", seed=42,
                             shuffle=True, pad_index=1, eos_index=3)
        batch = next(iter(it))
        assert batch.task == "MT"
        assert batch.src.shape[0] == 4
        assert batch.has_trg
        # src has EOS appended, no BOS (sequence_encoder bos=False eos=True)
        row = batch.src[0][:batch.src_length[0]]
        assert row[-1] == 3

    def test_seeded_subsample_deterministic(self):
        """Same seed -> same subset (test/unit/test_data.py:64-181 behavior)."""
        cfg = toy_mt_cfg()
        cfg["sample_train_subset"] = 100
        _, _, train1, _, _ = load_data(cfg, datasets=["train"], task="MT")
        list(train1.make_iter(batch_size=8, seed=7, shuffle=True,
                              pad_index=1, eos_index=3))
        idx1 = list(train1.indices)
        _, _, train2, _, _ = load_data(cfg, datasets=["train"], task="MT")
        list(train2.make_iter(batch_size=8, seed=7, shuffle=True,
                              pad_index=1, eos_index=3))
        idx2 = list(train2.indices)
        assert idx1 == idx2
        assert len(idx1) == 100
        assert idx1 == sorted(idx1)  # subset stays sorted

    def test_token_batching(self):
        _, _, train, _, _ = load_data(toy_mt_cfg(), datasets=["train"], task="MT")
        it = train.make_iter(batch_size=64, batch_type="token", seed=42,
                             shuffle=False, pad_index=1, eos_index=3)
        batches = list(it)
        assert all(b.nseqs >= 1 for b in batches)
        # total items = those surviving the train-time length filter (no drop_last)
        n_valid = sum(1 for i in train.indices if train[i][1] is not None)
        assert sum(b.nseqs for b in batches) == n_valid


@needs_ref
class TestSpeechData:
    def test_s2t_batches(self):
        _, trg_vocab, train, dev, _ = load_data(
            speech_cfg(), datasets=["train", "dev"], task="S2T")
        it = train.make_iter(batch_size=2, batch_type="sentence", seed=42,
                             shuffle=False, pad_index=1, eos_index=3)
        batch = next(iter(it))
        assert batch.task == "S2T"
        assert batch.src.ndim == 3 and batch.src.shape[2] == 80
        assert batch.src.dtype == np.float32
        assert batch.src_mask is None  # reconstructed in encoder
        assert batch.has_trg
        # char-level targets with bos/eos
        assert batch.trg_input[0, 0] == 2

    def test_s2t_pad_to_shape(self):
        _, _, train, _, _ = load_data(speech_cfg(), datasets=["train"], task="S2T")
        it = train.make_iter(batch_size=2, seed=42, shuffle=False,
                             pad_index=1, eos_index=3)
        batch = next(iter(it)).pad_to_shape(batch_size=4)
        assert batch.src.shape[0] == 4
        assert batch.src.shape[1] in (8, 16, 32, 64, 96, 128, 192, 256, 384, 512)
        assert batch.src_length[2:].tolist() == [1, 1]  # dummy rows
