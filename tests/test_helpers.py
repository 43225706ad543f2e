# coding: utf-8
"""Helper-function behaviors mirrored from the reference suite
(test/unit/test_prediction.py:17-31 expand_reverse_index; helpers.py)."""
from pathlib import Path

import numpy as np

from joeys2t_tpu.helpers import (
    adjust_mask_size,
    expand_reverse_index,
    flatten,
    get_latest_checkpoint,
    lengths_to_mask,
    pad_2d,
    remove_extra_spaces,
    remove_punctuation,
    resolve_ckpt_path,
    symlink_update,
    unicode_normalize,
)


class TestExpandReverseIndex:
    def test_nbest_expansion(self):
        # joeynmt test/unit/test_prediction.py:17-31
        assert expand_reverse_index([1, 0, 2], 1) == [1, 0, 2]
        assert expand_reverse_index([1, 0, 2], 2) == [2, 3, 0, 1, 4, 5]
        assert expand_reverse_index([1, 0, 2], 3) == [3, 4, 5, 0, 1, 2, 6, 7, 8]


class TestMasks:
    def test_lengths_to_mask(self):
        m = lengths_to_mask(np.array([3, 1, 0]), max_len=4)
        expect = np.array([[1, 1, 1, 0], [1, 0, 0, 0], [0, 0, 0, 0]], bool)
        np.testing.assert_array_equal(np.asarray(m), expect)

    def test_adjust_mask_size(self):
        mask = np.ones((2, 3), bool)
        grown = adjust_mask_size(mask, batch_size=2, hyp_len=5)
        assert grown.shape == (2, 5)
        assert not grown[:, 3:].any()
        shrunk = adjust_mask_size(mask, batch_size=2, hyp_len=2)
        assert shrunk.shape == (2, 2)
        assert adjust_mask_size(None, 2, 2) is None

    def test_pad_2d(self):
        arr = np.array([[1, 2], [3, 4]])
        out = pad_2d(arr, 4, pad_value=9)
        np.testing.assert_array_equal(out, [[1, 2, 9, 9], [3, 4, 9, 9]])


class TestTextNormalization:
    def test_remove_extra_spaces(self):
        # joeynmt/helpers.py:429-444 semantics
        assert remove_extra_spaces("  a  b ?") == "a b?"
        assert remove_extra_spaces("x , y .") == "x, y."

    def test_unicode_normalize(self):
        assert unicode_normalize("’“”") == "'\"\""

    def test_remove_punctuation(self):
        # drops tokens that are entirely punctuation (WER eval protocol,
        # joeynmt/tokenizers.py:536-546)
        assert remove_punctuation("a , b ! c", space=" ") == "a b c"
        assert remove_punctuation("a, b", space=" ") == "a, b"


class TestCheckpointResolution:
    def test_latest_and_resolve(self, tmp_path: Path):
        flatten([[1], [2]])  # smoke: helper importable and works
        (tmp_path / "10.ckpt").write_bytes(b"x")
        (tmp_path / "200.ckpt").write_bytes(b"y")
        latest = get_latest_checkpoint(tmp_path)
        assert latest.name == "200.ckpt"
        # resolve: explicit path wins; None falls back to latest
        assert resolve_ckpt_path(None, tmp_path).name == "200.ckpt"
        assert resolve_ckpt_path(tmp_path / "10.ckpt", tmp_path).name == "10.ckpt"

    def test_symlink_update(self, tmp_path: Path):
        t1 = tmp_path / "1.ckpt"
        t1.write_bytes(b"a")
        link = tmp_path / "best.ckpt"
        symlink_update(Path(t1.name), link)
        assert link.is_symlink() and link.resolve().name == "1.ckpt"
        t2 = tmp_path / "2.ckpt"
        t2.write_bytes(b"b")
        symlink_update(Path(t2.name), link)
        assert link.resolve().name == "2.ckpt"
