# coding: utf-8
"""Vocabulary behaviors mirrored from the reference suite
(test/unit/test_vocabulary.py, test/unit/test_embeddings.py)."""
from collections import Counter
from pathlib import Path

import numpy as np
import pytest

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models.embeddings import load_pretrained_embeddings
from joeys2t_tpu.vocabulary import Vocabulary, sort_and_cut


def sym(**kwargs):
    return SpecialSymbols(**kwargs)


class TestVocabulary:
    def test_from_list_specials_first(self):
        v = Vocabulary(["word", "a", "b"], sym())
        assert v.lookup("<unk>") == 0
        assert v.lookup("<pad>") == 1
        assert v.lookup("<s>") == 2
        assert v.lookup("</s>") == 3
        assert v.lookup("word") == 4
        assert len(v) == 7

    def test_lang_tags_before_tokens(self):
        v = Vocabulary(["tok"], sym(lang_tags=["<en>", "<de>"]))
        assert v.lookup("<en>") == 4
        assert v.lookup("<de>") == 5
        assert v.lookup("tok") == 6

    def test_duplicate_tokens_deduped(self):
        # the reference silently keeps the first occurrence
        # (joeynmt/vocabulary.py:62-68)
        v = Vocabulary(["x", "x", "y"], sym())
        assert len(v) == 6
        assert v.lookup("x") == 4 and v.lookup("y") == 5

    def test_is_unk(self):
        v = Vocabulary(["known"], sym())
        assert v.is_unk("unknown-token")
        assert not v.is_unk("known")
        assert not v.is_unk("<pad>")

    def test_file_round_trip(self, tmp_path: Path):
        v = Vocabulary(["alpha", "beta", "gamma"], sym())
        f = tmp_path / "vocab.txt"
        v.to_file(f)
        lines = f.read_text(encoding="utf-8").splitlines()
        assert lines[:4] == ["<unk>", "<pad>", "<s>", "</s>"]
        v2 = Vocabulary(lines[4:], sym())
        assert v == v2

    def test_sentences_to_ids_bos_eos_pad(self):
        v = Vocabulary(["a", "b", "c"], sym())
        ids, lengths, prompt_masks = v.sentences_to_ids(
            [["a", "b"], ["c"]], bos=True, eos=True)
        assert lengths == [4, 3]
        max_len = max(lengths)
        assert ids[0] == [2, v.lookup("a"), v.lookup("b"), 3]
        assert ids[1] == [2, v.lookup("c"), 3, 1][:max_len]

    def test_sentences_to_ids_prompt_mask(self):
        v = Vocabulary(["x", "y"], sym(sep_token="<sep>", sep_id=4))
        ids, lengths, masks = v.sentences_to_ids(
            [["x", "<sep>", "y"]], bos=True, eos=True)
        # mask marks prompt positions (through <sep>) as 1
        row = masks[0]
        sep_pos = ids[0].index(v.lookup("<sep>"))
        assert all(m == 1 for m in row[:sep_pos + 1])
        assert any(m == 0 for m in row[sep_pos + 1:lengths[0]])

    def test_arrays_to_sentences_cut_at_eos(self):
        v = Vocabulary(["a", "b"], sym())
        arr = np.array([[2, 4, 5, 3, 4, 4]])
        out = v.arrays_to_sentences(arr, cut_at_eos=True)
        assert out[0][-1] == "</s>"
        assert "a" in out[0] and out[0].count("a") == 1  # post-eos dropped

    def test_arrays_to_sentences_skip_pad(self):
        v = Vocabulary(["a"], sym())
        arr = np.array([[4, 1, 1, 1]])
        out = v.arrays_to_sentences(arr, cut_at_eos=False, skip_pad=True)
        assert out[0] == ["a"]


class TestSortAndCut:
    def test_frequency_then_alpha(self):
        c = Counter({"low": 1, "bbb": 3, "aaa": 3, "top": 5})
        assert sort_and_cut(c) == ["top", "aaa", "bbb", "low"]

    def test_min_freq(self):
        c = Counter({"keep": 3, "drop": 1})
        assert sort_and_cut(c, min_freq=2) == ["keep"]

    def test_max_size(self):
        c = Counter({"a": 5, "b": 4, "c": 3})
        assert sort_and_cut(c, max_size=2) == ["a", "b"]


class TestPretrainedEmbeddings:
    def test_partial_load_nan_merge(self, tmp_path: Path):
        v = Vocabulary(["hello", "world"], sym())
        f = tmp_path / "embeds.txt"
        f.write_text(
            "2 4\n"
            "hello 0.1 0.2 0.3 0.4\n"
            "oov-token 9 9 9 9\n",
            encoding="utf-8")
        table = load_pretrained_embeddings(f, v, embedding_dim=4)
        assert table.shape == (len(v), 4)
        np.testing.assert_allclose(table[v.lookup("hello")], [0.1, 0.2, 0.3, 0.4])
        # rows absent from the file stay NaN for the caller's np.where merge
        assert np.isnan(table[v.lookup("world")]).all()
        # oov rows in the file are ignored (only 1 vocab row loaded)
        loaded = (~np.isnan(table).any(axis=1)).sum()
        assert loaded == 1

    def test_dim_mismatch_rejected(self, tmp_path: Path):
        v = Vocabulary(["a"], sym())
        f = tmp_path / "embeds.txt"
        f.write_text("1 3\na 1 2 3\n", encoding="utf-8")
        with pytest.raises(AssertionError):
            load_pretrained_embeddings(f, v, embedding_dim=8)
