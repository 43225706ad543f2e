# coding: utf-8
"""CheckpointManager best-K retention (joeynmt/training.py:149-218): heap
behavior in minimize and maximize modes, symlink rotation, and that the
best checkpoint is never deleted."""
from pathlib import Path

from joeys2t_tpu.checkpoints import CheckpointManager


def state(i):
    return {"model_state": {"w": [float(i)]}, "stats_state": {"steps": i}}


def kept(model_dir: Path):
    return sorted(int(p.stem) for p in model_dir.glob("*.ckpt")
                  if not p.is_symlink())


class TestBestK:
    def test_minimize_keeps_lowest_scores(self, tmp_path):
        cm = CheckpointManager(tmp_path, keep_best_ckpts=2, minimize_metric=True)
        scores = {10: 5.0, 20: 3.0, 30: 4.0}
        best = float("inf")
        for step, score in scores.items():
            new_best = score < best
            best = min(best, score)
            cm.save(step, state(step), new_best=new_best, score=score)
        # worst (5.0 at step 10) evicted; best symlink -> 20
        assert kept(tmp_path) == [20, 30]
        assert (tmp_path / "best.ckpt").resolve().stem == "20"
        assert (tmp_path / "latest.ckpt").resolve().stem == "30"

    def test_maximize_keeps_highest_scores(self, tmp_path):
        cm = CheckpointManager(tmp_path, keep_best_ckpts=2, minimize_metric=False)
        scores = {10: 10.0, 20: 30.0, 30: 20.0}
        best = -float("inf")
        for step, score in scores.items():
            new_best = score > best
            best = max(best, score)
            cm.save(step, state(step), new_best=new_best, score=score)
        assert kept(tmp_path) == [20, 30]
        assert (tmp_path / "best.ckpt").resolve().stem == "20"

    def test_best_never_deleted(self, tmp_path):
        """Even when the best score rotates out of the heap by age, the file
        the best symlink points to survives (joeynmt/training.py:209-210)."""
        cm = CheckpointManager(tmp_path, keep_best_ckpts=1, minimize_metric=True)
        cm.save(10, state(10), new_best=True, score=1.0)
        cm.save(20, state(20), new_best=False, score=2.0)
        cm.save(30, state(30), new_best=False, score=3.0)
        assert (tmp_path / "best.ckpt").resolve().stem == "10"
        assert (tmp_path / "10.ckpt").exists()

    def test_nan_scores_skip_queue(self, tmp_path):
        cm = CheckpointManager(tmp_path, keep_best_ckpts=1, minimize_metric=True)
        cm.save(10, state(10), new_best=True, score=float("nan"))
        cm.save(20, state(20), new_best=False, score=float("nan"))
        # nothing queued -> nothing deleted
        assert kept(tmp_path) == [10, 20]

    def test_worse_newcomer_does_not_evict_better(self, tmp_path):
        """A new checkpoint with a worse score than everything retained must
        not evict a better one (fixes the reference's max-heap quirk): the
        best-K on disk stay the genuinely best K."""
        cm = CheckpointManager(tmp_path, keep_best_ckpts=2, minimize_metric=True)
        cm.save(10, state(10), new_best=True, score=1.0)
        cm.save(20, state(20), new_best=False, score=2.0)
        cm.save(30, state(30), new_best=False, score=9.0)  # worst so far
        # queue still holds steps 10 and 20; 30 only survives as latest
        assert sorted(p.stem for _, p in cm.ckpt_queue) == ["10", "20"]
        assert (tmp_path / "10.ckpt").exists()
        assert (tmp_path / "20.ckpt").exists()
        assert (tmp_path / "latest.ckpt").resolve().stem == "30"
        # once latest rotates on, the out-of-queue 30 is cleaned up
        cm.save(40, state(40), new_best=False, score=1.5)
        assert not (tmp_path / "30.ckpt").exists()
        assert sorted(p.stem for _, p in cm.ckpt_queue) == ["10", "40"]

    def test_worse_newcomer_maximize(self, tmp_path):
        cm = CheckpointManager(tmp_path, keep_best_ckpts=2,
                               minimize_metric=False)
        cm.save(10, state(10), new_best=True, score=30.0)
        cm.save(20, state(20), new_best=False, score=20.0)
        cm.save(30, state(30), new_best=False, score=5.0)  # worst so far
        assert sorted(p.stem for _, p in cm.ckpt_queue) == ["10", "20"]
        assert (tmp_path / "10.ckpt").exists()


class TestStructureCheck:
    def test_matching_structure_passes(self):
        from joeys2t_tpu.checkpoints import check_params_structure

        tree = {"encoder": {"layer_0": {"kernel": 1}}, "decoder": {"w": 2}}
        check_params_structure(tree, tree)  # no raise

    def test_conformer_bn_hint(self):
        """Loading a converted conformer checkpoint into a layernorm-built
        model raises a readable error pointing at conv_norm: batchnorm."""
        import pytest

        from joeys2t_tpu.checkpoints import check_params_structure

        expected = {"encoder": {"layer_0": {"conv_module": {"norm": {"scale": 1}}}}}
        loaded = {"encoder": {"layer_0": {"conv_module": {
            "batch_norm_scale": 1, "batch_norm_mean": 1}}}}
        with pytest.raises(ValueError, match="conv_norm"):
            check_params_structure(expected, loaded)

    def test_missing_key_raises_extras_warn(self):
        import pytest

        from joeys2t_tpu.checkpoints import check_params_structure

        with pytest.raises(ValueError, match="missing"):
            check_params_structure({"a": 1, "b": 1}, {"a": 1})
        # extra LEAVES alone are harmless (flax apply ignores them — e.g. the
        # constant PE buffer old conversions carried): warn, don't raise
        check_params_structure({"a": 1}, {"a": 1, "extra_key": 2})

    def test_extra_subtree_raises(self):
        """A whole unused sub-module (e.g. a 6-layer checkpoint into a
        4-layer config) is an architecture mismatch, not clutter."""
        import pytest

        from joeys2t_tpu.checkpoints import check_params_structure

        expected = {"encoder": {"layer_0": {"k": 1}}}
        loaded = {"encoder": {"layer_0": {"k": 1}, "layer_1": {"k": 1}}}
        with pytest.raises(ValueError, match="unused sub-modules"):
            check_params_structure(expected, loaded)

    def test_leaf_vs_subtree_mismatch_raises(self):
        """A dict where the model expects a tensor (and vice versa) must
        raise readably instead of passing as 'extras'."""
        import pytest

        from joeys2t_tpu.checkpoints import check_params_structure

        with pytest.raises(ValueError, match="sub-module"):
            check_params_structure({"a": 1}, {"a": {"scale": 1, "bias": 1}})
        with pytest.raises(ValueError, match="bare tensor"):
            check_params_structure({"a": {"scale": 1}}, {"a": 1})


class TestPartialLoad:
    """load_encoder/load_decoder merge semantics — the reference's
    `load_state_dict(strict=False)` by-name merge (joeynmt/training.py:
    294-309): matching paths load, missing keep init, unexpected are
    ignored, shape mismatches raise. The documented ST recipe depends on
    the `unexpected` rule: mustc_st.yaml loads a 16-layer ASR encoder
    into a 12-layer ST encoder."""

    def _params(self, n_layers, dim, seed):
        import numpy as np

        rng = np.random.RandomState(seed)
        enc = {f"layers_{i}": {"kernel": rng.randn(dim, dim).astype("f4"),
                               "bias": rng.randn(dim).astype("f4")}
               for i in range(n_layers)}
        dec = {"out": {"kernel": rng.randn(dim, 3).astype("f4")}}
        return {"encoder": enc, "decoder": dec}

    def test_deeper_checkpoint_into_shallower_model(self):
        import numpy as np

        from joeys2t_tpu.checkpoints import partial_load

        model = self._params(2, 4, seed=0)
        ckpt = self._params(4, 4, seed=1)
        merged = partial_load(dict(model), ckpt, "encoder")
        for i in range(2):  # present in both -> loaded from ckpt
            np.testing.assert_array_equal(
                merged["encoder"][f"layers_{i}"]["kernel"],
                ckpt["encoder"][f"layers_{i}"]["kernel"])
        assert set(merged["encoder"]) == {"layers_0", "layers_1"}
        np.testing.assert_array_equal(  # other sub-trees untouched
            merged["decoder"]["out"]["kernel"],
            model["decoder"]["out"]["kernel"])

    def test_missing_in_ckpt_keeps_init(self):
        import numpy as np

        from joeys2t_tpu.checkpoints import partial_load

        model = self._params(3, 4, seed=0)
        ckpt = self._params(1, 4, seed=1)
        merged = partial_load(dict(model), ckpt, "encoder")
        np.testing.assert_array_equal(
            merged["encoder"]["layers_0"]["bias"],
            ckpt["encoder"]["layers_0"]["bias"])
        for i in (1, 2):
            np.testing.assert_array_equal(
                merged["encoder"][f"layers_{i}"]["kernel"],
                model["encoder"][f"layers_{i}"]["kernel"])

    def test_shape_mismatch_raises(self):
        import pytest

        from joeys2t_tpu.checkpoints import partial_load

        model = self._params(1, 4, seed=0)
        ckpt = self._params(1, 8, seed=1)
        with pytest.raises(ValueError, match="shape mismatch"):
            partial_load(dict(model), ckpt, "encoder")
