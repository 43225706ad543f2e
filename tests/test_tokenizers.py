# coding: utf-8
"""Tokenizer tests mirroring test/unit/test_tokenizer.py, using the reference
repo's public fixtures (read-only mount) as golden data."""
from pathlib import Path

import pytest

from joeys2t_tpu.bpe import BPE, learn_bpe, write_codes
from joeys2t_tpu.spm import MiniSentencePiece
from joeys2t_tpu.tokenizers import (
    BasicTokenizer,
    EvaluationTokenizer,
    SubwordNMTTokenizer,
    _build_tokenizer,
)

REF_DATA = Path("/root/reference/test/data")
needs_ref = pytest.mark.skipif(not REF_DATA.is_dir(), reason="reference fixtures absent")


class TestBasicTokenizer:
    def test_word_level(self):
        tok = BasicTokenizer(level="word", lowercase=True)
        assert tok.pre_process("Hello World") == "hello world"
        assert tok("hello world") == ["hello", "world"]

    def test_char_level(self):
        tok = BasicTokenizer(level="char", lowercase=True)
        out = tok("ab c")
        assert out == ["a", "b", "▁", "c"]

    def test_length_filter(self):
        tok = BasicTokenizer(level="word", max_length=3)
        assert tok("a b c d", is_train=True) is None
        assert tok("a b c", is_train=True) == ["a", "b", "c"]
        # no filtering at test time
        assert tok("a b c d", is_train=False) == ["a", "b", "c", "d"]

    def test_post_process(self):
        tok = BasicTokenizer(level="char")
        tok.specials, tok.unk_token, tok.sep_token = ["<pad>"], "<unk>", None
        assert tok.post_process(["a", "b", "▁", "c"]) == "ab c"


class TestSubwordNMT:
    @needs_ref
    def test_golden_segmentation(self):
        """Golden values from test/unit/test_tokenizer.py:175-186."""
        bpe = BPE.from_file(REF_DATA / "toy/bpe200.codes")
        vocab = set((REF_DATA / "toy/bpe200.txt").read_text().split("\n"))
        bpe.vocab = vocab - {"<unk>", "<pad>", "<s>", "</s>", ""}
        assert bpe.process_line("Danke.").split() == ["D@@", "an@@", "k@@", "e."]
        assert bpe.process_line("Thank you.").split() == \
            ["Th@@", "an@@", "k", "y@@", "ou@@", "."]

    @needs_ref
    def test_tokenizer_class_and_postprocess(self):
        tok = SubwordNMTTokenizer(level="bpe", codes=(REF_DATA / "toy/bpe200.codes"))
        tok.specials, tok.unk_token, tok.sep_token = [], "<unk>", None
        toks = tok("Danke.")
        assert tok.post_process(toks) == "Danke."

    @needs_ref
    def test_dropout_changes_segmentation(self):
        import random

        random.seed(12)
        tok = SubwordNMTTokenizer(level="bpe", codes=(REF_DATA / "toy/bpe200.codes"),
                                  dropout=0.9)
        toks = tok("Danke.", is_train=True)
        # with heavy dropout nearly character-level
        assert len(toks) >= 4

    @needs_ref
    def test_glossary_isolation(self):
        """Glossary terms pass through BPE unsegmented (subword_nmt
        apply_bpe.isolate_glossary semantics; see ADVICE r1)."""
        bpe = BPE.from_file(REF_DATA / "toy/bpe200.codes")
        # without glossary, "Danke." is segmented
        assert len(bpe.process_line("Danke.").split()) > 1
        bpe.glossaries = ["Danke"]
        bpe._cache.clear()
        out = bpe.process_line("Danke.").split()
        # "Danke" survives whole; the trailing "." is segmented separately
        assert out[0].replace("@@", "") == "Danke"
        # embedded occurrence is isolated too
        out2 = bpe.process_line("xDankey").split()
        assert any(piece.replace("@@", "") == "Danke" for piece in out2)

    def test_learn_bpe_roundtrip(self, tmp_path):
        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = learn_bpe(freqs, 10)
        assert len(merges) > 0
        codes_path = tmp_path / "codes"
        write_codes(merges, codes_path)
        bpe = BPE.from_file(codes_path)
        out = bpe.process_line("lowest")
        assert "".join(t.replace("@@", "") for t in out.split()) == "lowest"


class TestMiniSentencePiece:
    @needs_ref
    def test_golden_segmentation(self):
        """Golden values from test/unit/test_tokenizer.py:126-140 (produced by
        the real sentencepiece C++ library)."""
        m = MiniSentencePiece.from_file(REF_DATA / "toy/sp200.model")
        assert m.encode("Der Großteil der Erde ist Meerwasser.") == [
            '▁', 'D', 'er', '▁', 'G', 'r', 'o', 'ß', 'te', 'il', '▁der', '▁E',
            'r', 'd', 'e', '▁ist', '▁M', 'e', 'er', 'w', 'as', 's', 'er', '.']
        assert m.encode("Most of the planet is ocean water.") == [
            '▁M', 'o', 'st', '▁of', '▁the', '▁', 'p', 'l', 'an', 'e', 't',
            '▁is', '▁', 'o', 'c', 'e', 'an', '▁w', 'at', 'er', '.']

    @needs_ref
    def test_decode(self):
        m = MiniSentencePiece.from_file(REF_DATA / "toy/sp200.model")
        assert m.decode(m.encode("Danke, aber nein.")) == "Danke, aber nein."

    @needs_ref
    def test_factory(self):
        tok = _build_tokenizer({
            "lang": "de", "level": "bpe", "tokenizer_type": "sentencepiece",
            "tokenizer_cfg": {"model_file": (REF_DATA / "toy/sp200.model").as_posix()},
        })
        assert tok("Danke.") is not None


class TestEvaluationTokenizer:
    def test_wer_protocol(self):
        """Lowercase + 13a + punctuation removal (the WER protocol,
        joeynmt/tokenizers.py:511-553)."""
        tok = EvaluationTokenizer(lowercase=True, tokenize="13a", no_punc=True)
        assert tok("Hello, World!") == ["hello", "world"]
        tok2 = EvaluationTokenizer(lowercase=False, tokenize="13a", no_punc=False)
        assert tok2("Hello, World!") == ["Hello", ",", "World", "!"]
