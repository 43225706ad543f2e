# coding: utf-8
"""Metric tests (mirroring test/unit/test_metric.py) incl. the C++ edit
distance extension."""
import numpy as np
import pytest

from joeys2t_tpu.metrics import bleu, chrf, sequence_accuracy, token_accuracy, wer
from joeys2t_tpu.native import edit_distance, edit_distance_batch
from joeys2t_tpu.tokenizers import EvaluationTokenizer


class TestEditDistance:
    def test_known_values(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance([], [1, 2]) == 2
        assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
        assert edit_distance(["a", "b"], ["b", "a"]) == 2
        assert edit_distance("abc", "") == 3

    def test_batch_matches_single(self):
        rng = np.random.RandomState(0)
        pairs = []
        for _ in range(20):
            a = rng.randint(0, 5, size=rng.randint(0, 12)).tolist()
            b = rng.randint(0, 5, size=rng.randint(0, 12)).tolist()
            pairs.append((a, b))
        batch = edit_distance_batch(pairs)
        single = [edit_distance(a, b) for a, b in pairs]
        assert batch == single

    def test_cpp_backend_active(self):
        """The g++ toolchain is present in CI; the extension must build."""
        from joeys2t_tpu import native

        native._build_and_load()
        assert native._LIB is not None, "C++ editdistance failed to build"


class TestWER:
    def test_corpus_wer(self):
        """Corpus WER = sum(edit)/sum(ref len) (joeynmt/metrics.py:128-131)."""
        tok = EvaluationTokenizer(lowercase=True, tokenize="13a", no_punc=True)
        hyps = ["hello world", "good morning"]
        refs = ["hello, World!", "good night"]
        # hyp1 == ref1 after lowercase+no_punc (0 errors / 2 ref tokens)
        # hyp2: 1 substitution / 2 ref tokens
        assert wer(hyps, refs, tok) == 25.0

    def test_perfect_wer(self):
        tok = EvaluationTokenizer(lowercase=True, tokenize="13a", no_punc=True)
        assert wer(["a b c"], ["A B C."], tok) == 0.0


class TestBleuChrf:
    def test_bleu_perfect(self):
        score = bleu(["the cat sat on the mat"], ["the cat sat on the mat"])
        assert abs(score - 100.0) < 1e-6

    def test_bleu_zero(self):
        assert bleu(["xyz abc def ghi"], ["the cat sat on a mat"]) < 5.0

    def test_chrf_range(self):
        score = chrf(["the cat"], ["the cat"])
        assert 0.99 <= score <= 1.0  # normalized to [0,1]


class TestAccuracy:
    def test_token_accuracy(self):
        tok = str.split
        assert token_accuracy(["a b c"], ["a x c"], tok) == (2 / 3) * 100

    def test_sequence_accuracy(self):
        assert sequence_accuracy(["a", "b"], ["a", "c"]) == 50.0


class TestCheckpointAveraging:
    def test_uniform_average(self, tmp_path):
        """average_checkpoints = arithmetic mean of params
        (scripts/average_checkpoints.py semantics)."""
        from joeys2t_tpu.checkpoints import (average_checkpoints,
                                             load_checkpoint, save_checkpoint)

        p1 = {"layer": {"kernel": np.ones((2, 2), np.float32) * 2.0}}
        p2 = {"layer": {"kernel": np.ones((2, 2), np.float32) * 4.0}}
        for i, p in enumerate([p1, p2]):
            save_checkpoint(tmp_path / f"{i}.ckpt",
                            {"model_state": p, "stats_state": {"steps": i}})
        avg = average_checkpoints([tmp_path / "0.ckpt", tmp_path / "1.ckpt"])
        np.testing.assert_allclose(avg["model_state"]["layer"]["kernel"], 3.0)
        assert avg["optimizer_state"] is None
        # averaged ckpt round-trips
        save_checkpoint(tmp_path / "avg.ckpt", avg)
        loaded = load_checkpoint(tmp_path / "avg.ckpt")
        np.testing.assert_allclose(loaded["model_state"]["layer"]["kernel"], 3.0)


class TestSacrebleuOptions:
    """Config options pass through to sacrebleu (joeynmt/metrics.py:16-62);
    mirrors the reference's chrf whitespace and tokenize tests."""

    def test_chrf_whitespace_flag_changes_score(self):
        hyps = ["dies ist ein test"]
        refs = ["das ist ein test !"]
        without = chrf(hyps, refs, whitespace=False)
        with_ws = chrf(hyps, refs, whitespace=True)
        assert 0.0 < without <= 1.0 and 0.0 < with_ws <= 1.0
        assert without != with_ws
        # matches calling sacrebleu directly
        from sacrebleu.metrics import CHRF
        direct = CHRF(whitespace=True).corpus_score(hyps, [refs]).score / 100
        assert abs(with_ws - direct) < 1e-9

    def test_bleu_tokenize_option(self):
        hyps = ["this is a test."]
        refs = ["this is the test."]
        b_13a = bleu(hyps, refs, tokenize="13a")
        b_none = bleu(hyps, refs, tokenize="none")
        assert b_13a > 0
        # "none" keeps the period attached -> different n-gram stats
        assert b_13a != b_none

    def test_unknown_keys_ignored(self):
        # the factory filters to valid sacrebleu kwargs (lowercase etc. pass,
        # junk keys are dropped instead of raising)
        assert bleu(["a b c d e"], ["a b c d e"],
                    bogus_option=1, lowercase=True) > 0


class TestEvaluateStandalone:
    """evaluate() computes metrics over already-decoded hypotheses
    (joeynmt/prediction.py:384-439)."""

    def test_metrics_and_nbest_selection(self):
        from types import SimpleNamespace

        from joeys2t_tpu.config import TestConfig
        from joeys2t_tpu.prediction import evaluate

        class _Tok:
            def post_process(self, t, generate_unk=True):
                return t if isinstance(t, str) else " ".join(t)

        data = SimpleNamespace(trg_lang="trg", tokenizer={"trg": _Tok()},
                               trg=["a b c", "d e f"])
        args = TestConfig(load_model=None, batch_size=2, batch_type="sentence",
                          max_output_length=-1, min_output_length=1,
                          eval_metrics=["bleu", "chrf", "token_accuracy",
                                        "sequence_accuracy", "wer"],
                          sacrebleu_cfg={"lowercase": True}, beam_size=2,
                          beam_alpha=1.0, n_best=2, return_attention=False,
                          return_prob="none", generate_unk=True,
                          repetition_penalty=-1, no_repeat_ngram_size=-1)
        # n_best=2: rows alternate best/second-best; evaluate picks every 2nd
        hyps = ["a b c", "x x x", "d e z", "y y y"]
        scores, refs = evaluate({}, hyps, data, args)
        assert refs == ["a b c", "d e f"]
        assert scores["sequence_accuracy"] == 50.0
        assert abs(scores["token_accuracy"] - 100.0 * 5 / 6) < 1e-9
        assert scores["wer"] == pytest.approx(100.0 * 1 / 6)
        assert 0 <= scores["chrf"] <= 1 and scores["bleu"] >= 0
