# coding: utf-8
"""Config schema contracts (joeynmt/config.py:26-472): defaults, option
validation, deprecation shims, validation-time overrides, and that every
shipped example config parses."""
from pathlib import Path

import pytest

from joeys2t_tpu.config import (
    ConfigurationError,
    load_config,
    parse_global_args,
    parse_special_symbols,
    parse_test_args,
    parse_train_args,
    set_validation_args,
)

CONFIGS = Path(__file__).parent.parent / "configs"


class TestSpecialSymbols:
    def test_defaults(self):
        s = parse_special_symbols({})
        assert (s.unk_id, s.pad_id, s.bos_id, s.eos_id) == (0, 1, 2, 3)
        assert (s.unk_token, s.pad_token, s.bos_token, s.eos_token) == (
            "<unk>", "<pad>", "<s>", "</s>")
        assert s.sep_token is None and s.lang_tags == []

    def test_sep_and_lang_tags(self):
        s = parse_special_symbols({
            "sep_token": "<sep>", "sep_id": 4, "lang_tags": ["<en>", "<de>"]})
        assert s.sep_token == "<sep>" and s.sep_id == 4
        assert s.lang_tags == ["<en>", "<de>"]


class TestTrainArgs:
    def base(self, **over):
        cfg = {"model_dir": "/tmp/x", "batch_size": 4,
               "logging_freq": 10, "validation_freq": 100}
        cfg.update(over)
        return cfg

    def test_invalid_normalization_rejected(self):
        with pytest.raises(ConfigurationError):
            parse_train_args(self.base(normalization="words"))

    def test_logging_vs_validation_freq(self):
        with pytest.raises(ConfigurationError):
            parse_train_args(self.base(logging_freq=200, validation_freq=100))
        with pytest.raises(ConfigurationError):
            parse_train_args(self.base(logging_freq=30, validation_freq=100))

    def test_keep_last_ckpts_shim(self):
        args = parse_train_args(self.base(keep_last_ckpts=7))
        assert args.keep_best_ckpts == 7

    def test_invalid_early_stopping_metric(self):
        with pytest.raises(ConfigurationError):
            parse_train_args(self.base(early_stopping_metric="rouge"))

    def test_profile_dir_knob(self, tmp_path):
        assert parse_train_args(self.base()).profile_dir is None
        args = parse_train_args(self.base(profile_dir=tmp_path.as_posix()))
        assert args.profile_dir == tmp_path

    def test_feature_dtype_knob(self):
        assert parse_train_args(self.base()).feature_dtype == "auto"
        args = parse_train_args(self.base(feature_dtype="BFLOAT16"))
        assert args.feature_dtype == "bfloat16"
        with pytest.raises(ConfigurationError):
            parse_train_args(self.base(feature_dtype="float16"))

    def test_moment_dtype_knob(self):
        # a typo must fail at parse time, not as a TypeError from
        # jnp.dtype() when the optimizer is built
        assert parse_train_args(self.base()).moment_dtype is None
        args = parse_train_args(self.base(moment_dtype="BFLOAT16"))
        assert args.moment_dtype == "bfloat16"
        with pytest.raises(ConfigurationError):
            parse_train_args(self.base(moment_dtype="bf16"))


class TestTestArgs:
    def test_defaults(self):
        args = parse_test_args({}, mode="train")
        assert args.beam_size == 1 and args.n_best == 1
        assert args.return_prob == "none"
        assert args.max_output_length == -1

    def test_eval_metric_shim(self):
        args = parse_test_args({"eval_metric": "BLEU"}, mode="train")
        assert args.eval_metrics == ["bleu"]

    def test_alpha_shim(self):
        args = parse_test_args({"alpha": 0.7}, mode="train")
        assert args.beam_alpha == 0.7

    def test_sacrebleu_shim(self):
        args = parse_test_args({"sacrebleu": {"tokenize": "intl"}}, mode="train")
        assert args.sacrebleu_cfg == {"tokenize": "intl"}

    def test_invalid_metric_rejected(self):
        with pytest.raises(ConfigurationError):
            parse_test_args({"eval_metrics": ["rouge"]}, mode="train")

    def test_nbest_beam_consistency(self):
        with pytest.raises(ConfigurationError):
            parse_test_args({"n_best": 5, "beam_size": 2}, mode="train")
        with pytest.raises(ConfigurationError):
            parse_test_args({"beam_size": 0}, mode="train")

    def test_repetition_penalty_range(self):
        with pytest.raises(ConfigurationError):
            parse_test_args({"repetition_penalty": 0.5}, mode="train")

    def test_beam_reorder_knob(self):
        assert parse_test_args({}, mode="train").beam_reorder == "auto"
        args = parse_test_args({"beam_reorder": "PHYSICAL"}, mode="train")
        assert args.beam_reorder == "physical"
        with pytest.raises(ConfigurationError):
            parse_test_args({"beam_reorder": "eager"}, mode="train")

    def test_beam_reorder_env_override(self, monkeypatch):
        # the env var beats the YAML, and is resolved at parse time — the
        # decode hot path (search.beam_search) never reads the environment
        monkeypatch.setenv("JOEYS2T_BEAM_REORDER", "lazy")
        args = parse_test_args({"beam_reorder": "physical"}, mode="train")
        assert args.beam_reorder == "lazy"
        monkeypatch.setenv("JOEYS2T_BEAM_REORDER", "bogus")
        with pytest.raises(ConfigurationError):
            parse_test_args({}, mode="train")
        import inspect

        from joeys2t_tpu import search

        assert "environ" not in inspect.getsource(search)

    def test_validation_overrides(self):
        args = parse_test_args({"beam_size": 5, "n_best": 3,
                                "return_prob": "hyp",
                                "no_repeat_ngram_size": 4}, mode="train")
        v = set_validation_args(args)
        assert v.beam_size == 1 and v.n_best == 1
        assert v.return_prob == "none" and v.no_repeat_ngram_size == -1
        # original untouched (frozen dataclass replace)
        assert args.beam_size == 5


class TestShippedConfigs:
    @pytest.mark.parametrize("name", sorted(
        p.name for p in CONFIGS.glob("*.yaml")))
    def test_parses(self, name, tmp_path, monkeypatch):
        cfg = load_config((CONFIGS / name).as_posix())
        task = cfg.get("task", "MT")
        assert task in ("MT", "S2T")
        # transfer configs (load_model/load_encoder/load_decoder) reference
        # prior checkpoints by relative path; stub them in a tmp cwd so the
        # resume/transfer parse branch is exercised rather than skipped
        train_cfg = cfg.get("training", {})
        test_cfg = cfg.get("testing", {})
        ckpt_paths = [
            v for section in (train_cfg, test_cfg)
            for k, v in section.items()
            if k in ("load_model", "load_encoder", "load_decoder")
        ]
        if ckpt_paths:
            monkeypatch.chdir(tmp_path)
            for p in ckpt_paths:
                stub = tmp_path / p
                stub.parent.mkdir(parents=True, exist_ok=True)
                stub.touch()
        args = parse_global_args(cfg, rank=0, mode="train")
        assert args.model_dir is not None
        if ckpt_paths and "load_model" in train_cfg:
            assert args.train.load_model is not None
        if "load_encoder" in train_cfg:
            assert args.train.load_encoder is not None
