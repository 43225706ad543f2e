# coding: utf-8
"""End-to-end training slice on the synthetic reverse task (the PR1 reference
scenario from SURVEY.md §7 step 2): train -> validate -> checkpoint -> test,
then resume from checkpoint."""
import sys
import tempfile
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from generate_reverse_task import generate_samples  # noqa: E402

from joeys2t_tpu.checkpoints import load_checkpoint  # noqa: E402
from joeys2t_tpu.helpers import make_model_dir  # noqa: E402
from joeys2t_tpu.training import train  # noqa: E402

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def reverse_env():
    tmp = Path(tempfile.mkdtemp())
    data_dir = tmp / "data"
    data_dir.mkdir()
    for split, n, seed in [("train", 300, 1), ("dev", 24, 2), ("test", 24, 3)]:
        src, trg = generate_samples(n, high=10, min_len=3, max_len=8, seed=seed)
        (data_dir / f"{split}.src").write_text("\n".join(src) + "\n")
        (data_dir / f"{split}.trg").write_text("\n".join(trg) + "\n")

    cfg = yaml.safe_load(open(REPO / "configs/transformer_reverse.yaml"))
    cfg["model_dir"] = (tmp / "model").as_posix()
    cfg["data"].update(
        train=(data_dir / "train").as_posix(), dev=(data_dir / "dev").as_posix(),
        test=(data_dir / "test").as_posix(), sample_train_subset=-1,
        sample_dev_subset=-1)
    cfg["training"].update(epochs=1, validation_freq=10, logging_freq=10,
                           batch_size=32, batch_multiplier=1, keep_best_ckpts=2)
    cfg["testing"].update(load_model=None)
    for side in ("encoder", "decoder"):
        cfg["model"][side].update(num_layers=2, hidden_size=32, ff_size=64)
        cfg["model"][side]["embeddings"]["embedding_dim"] = 32
    return tmp, cfg


def test_train_validate_test(reverse_env):
    tmp, cfg = reverse_env
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=False)
    model_dir = Path(cfg["model_dir"])

    # artifacts (joeynmt/training.py:149-218 checkpoint semantics)
    assert (model_dir / "latest.ckpt").is_symlink()
    assert (model_dir / "best.ckpt").is_symlink()
    assert (model_dir / "validations.txt").is_file()
    assert (model_dir / "src_vocab.txt").is_file()
    assert (model_dir / "trg_vocab.txt").is_file()
    assert (model_dir / "best.hyps.dev").is_file()
    assert (model_dir / "best.hyps.test").is_file()
    # keep_best_ckpts=2 + final save
    ckpts = [p for p in model_dir.glob("*.ckpt") if not p.is_symlink()]
    assert len(ckpts) <= 3

    # validations.txt rows carry bleu + LR
    lines = (model_dir / "validations.txt").read_text().strip().split("\n")
    assert len(lines) >= 1
    assert "bleu" in lines[0] and "LR:" in lines[0]

    # checkpoint contents (same logical layout as joeynmt/training.py:166-177)
    ckpt = load_checkpoint(model_dir / "latest.ckpt")
    for key in ["model_state", "optimizer_state", "scheduler_state",
                "train_iter_state", "stats_state"]:
        assert key in ckpt, key
    assert ckpt["stats_state"]["steps"] > 0


def test_resume_from_checkpoint(reverse_env):
    tmp, cfg = reverse_env
    model_dir = Path(cfg["model_dir"])
    assert (model_dir / "latest.ckpt").exists(), "run test_train_validate_test first"

    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2["model_dir"] = (tmp / "model_resumed").as_posix()
    cfg2["training"]["load_model"] = (model_dir / "latest.ckpt").resolve().as_posix()
    cfg2["training"]["epochs"] = 1
    make_model_dir(Path(cfg2["model_dir"]))

    prev_steps = load_checkpoint(model_dir / "latest.ckpt")["stats_state"]["steps"]
    train(cfg2, skip_test=True)
    resumed = load_checkpoint(Path(cfg2["model_dir"]) / "latest.ckpt")
    # stats were restored and training continued; with epochs=1 already done,
    # the step counter must not go backwards
    assert resumed["stats_state"]["steps"] >= prev_steps


def test_cli_test_mode_save_attention_and_scores(reverse_env):
    """`test` mode with -a/-s: attention heatmaps and token scores must be
    written alongside the hypotheses (joeynmt/prediction.py:560-615).
    Reuses the model test_train_validate_test trained in this module's
    shared dir rather than training another one."""
    import copy

    from joeys2t_tpu.prediction import test as run_test

    tmp, cfg = reverse_env
    model_dir = Path(cfg["model_dir"])
    assert (model_dir / "latest.ckpt").exists(), \
        "run test_train_validate_test first"

    cfg2 = copy.deepcopy(cfg)
    cfg2["testing"]["load_model"] = (model_dir / "latest.ckpt").resolve().as_posix()
    cfg2["testing"]["beam_size"] = 1  # greedy => attention available
    cfg2["testing"]["return_prob"] = "hyp"
    out_prefix = (model_dir / "attn_run").as_posix()
    run_test(cfg2, output_path=out_prefix, save_attention=True, save_scores=True)

    assert (model_dir / "attn_run.dev").is_file(), list(model_dir.iterdir())
    pngs = list(model_dir.glob("attn_run.dev.att*"))
    assert pngs, "no attention plots written"
    assert (model_dir / "attn_run.dev.scores").is_file()
    assert (model_dir / "attn_run.dev.tokens").is_file()


def test_profiler_hook_writes_trace(reverse_env, monkeypatch, tmp_path):
    """JOEYS2T_PROFILE_DIR captures a profiler trace of the configured step
    window (observability upgrade over the reference's wall-clock logging)."""
    import copy

    tmp, cfg = reverse_env
    cfg = copy.deepcopy(cfg)
    cfg["model_dir"] = (tmp / "model_prof").as_posix()
    cfg["training"].update(epochs=1)  # ~10 steps -> crosses the 4-6 window
    trace_dir = tmp_path / "trace"
    monkeypatch.setenv("JOEYS2T_PROFILE_DIR", trace_dir.as_posix())
    # 3 traced steps prove the hook (past the step-1 compile); more epochs
    # or a later window would just burn host tracing time
    monkeypatch.setenv("JOEYS2T_PROFILE_WINDOW", "4,6")
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    files = list(trace_dir.rglob("*")) if trace_dir.exists() else []
    assert any(f.is_file() for f in files), files


def test_adafactor_bf16_moments_train(reverse_env):
    """The TPU memory knobs (optimizer: adafactor; moment_dtype for adam)
    train end-to-end through the real config->TrainManager path and
    checkpoint/resume cleanly (factored optimizer state round-trips)."""
    import copy

    tmp, base_cfg = reverse_env
    cfg = copy.deepcopy(base_cfg)
    cfg["model_dir"] = (tmp / "adafactor_model").as_posix()
    cfg["training"].update(optimizer="adafactor", learning_rate=1e-2,
                           weight_decay=0.01, epochs=1)
    # 2 steps per train() are enough to exercise factored-state update +
    # round-trip; the full 300-sample epoch adds nothing but wall time
    cfg["data"]["sample_train_subset"] = 64
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    model_dir = Path(cfg["model_dir"])
    assert (model_dir / "latest.ckpt").is_symlink()
    ckpt = load_checkpoint(model_dir / "latest.ckpt")
    assert ckpt["optimizer_state"] is not None
    # resume: factored state loads back
    cfg["training"].update(load_model=(model_dir / "latest.ckpt").as_posix(),
                           epochs=1)
    cfg["model_dir"] = (tmp / "adafactor_resume").as_posix()
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)


def test_rnn_reverse_config_trains(reverse_env):
    """The shipped legacy-RNN config (configs/rnn_reverse.yaml, LSTM +
    Luong attention + input feeding) trains end-to-end: one epoch,
    validation, checkpoint."""
    tmp, _ = reverse_env
    cfg = yaml.safe_load(open(REPO / "configs/rnn_reverse.yaml"))
    data_dir = tmp / "data"
    cfg["model_dir"] = (tmp / "rnn_model").as_posix()
    cfg["data"].update(
        train=(data_dir / "train").as_posix(), dev=(data_dir / "dev").as_posix(),
        test=(data_dir / "test").as_posix(), sample_train_subset=64,
        sample_dev_subset=-1)
    # 2 train steps + 1 recurrent-greedy validation: the LSTM scan graphs
    # (the thing under test) compile either way; a longer epoch only
    # re-executes them
    cfg["training"].update(epochs=1, validation_freq=2, logging_freq=1,
                           batch_size=32)
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    model_dir = Path(cfg["model_dir"])
    assert (model_dir / "latest.ckpt").is_symlink()
    assert "bleu" in (model_dir / "validations.txt").read_text()
