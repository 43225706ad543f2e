# coding: utf-8
"""End-to-end S2T slice: speech dataset from real wavs -> fbank -> conv
subsampler -> transformer -> joint CTC loss -> greedy decode -> WER
(SURVEY.md §7 steps 3-5)."""
import tempfile
from pathlib import Path

import pytest

from joeys2t_tpu.checkpoints import load_checkpoint
from joeys2t_tpu.helpers import make_model_dir
from joeys2t_tpu.training import train

REF_SPEECH = Path("/root/reference/test/data/speech")
needs_ref = pytest.mark.skipif(not REF_SPEECH.is_dir(), reason="reference fixtures absent")


def s2t_cfg(tmp: Path) -> dict:
    return {
        "name": "s2t-e2e",
        "task": "S2T",
        "model_dir": (tmp / "model").as_posix(),
        "use_cuda": False,
        "random_seed": 42,
        "data": {
            "train": (REF_SPEECH / "test").as_posix(),
            "dev": (REF_SPEECH / "test").as_posix(),
            "test": (REF_SPEECH / "test").as_posix(),
            "dataset_type": "speech",
            "src": {
                "lang": "en", "level": "frame", "num_freq": 80,
                "min_length": 10, "max_length": 3000,
                "tokenizer_type": "speech",
                "tokenizer_cfg": {
                    "specaugment": {"freq_mask_n": 1, "freq_mask_f": 5,
                                    "time_mask_n": 1, "time_mask_t": 10,
                                    "time_mask_p": 1.0},
                    "cmvn": {"norm_means": True, "norm_vars": True, "before": True},
                },
            },
            "trg": {
                "lang": "en", "level": "char", "lowercase": True,
                "max_length": 120,
                "voc_file": (REF_SPEECH / "char.txt").as_posix(),
            },
            "special_symbols": {
                "unk_token": "<unk>", "unk_id": 0, "pad_token": "<pad>",
                "pad_id": 1, "bos_token": "<s>", "bos_id": 2,
                "eos_token": "</s>", "eos_id": 3,
            },
        },
        "testing": {
            "n_best": 1, "beam_size": 1, "beam_alpha": 1.0, "batch_size": 4,
            "batch_type": "sentence",
            # reference transcripts are up to ~120 chars; 32 used to truncate
            # every hypothesis and inflate WER (fixed per VERDICT r1 item 5)
            "max_output_length": 130,
            "eval_metrics": ["wer"],
            "sacrebleu_cfg": {"tokenize": "13a", "lowercase": True},
        },
        "training": {
            "optimizer": "adamw",
            "adam_betas": [0.9, 0.98],
            "scheduling": "warmupinversesquareroot",
            "learning_rate": 1.0e-3,
            "learning_rate_min": 1.0e-6,
            "learning_rate_warmup": 10,
            "clip_grad_norm": 10.0,
            "batch_size": 4,
            "batch_type": "sentence",
            "batch_multiplier": 2,
            "normalization": "batch",
            "epochs": 1,
            "validation_freq": 1,
            "logging_freq": 1,
            "early_stopping_metric": "wer",
            "shuffle": True,
            "print_valid_sents": [0],
            "keep_best_ckpts": 2,
            "label_smoothing": 0.1,
            "loss": "crossentropy-ctc",
            "ctc_weight": 0.3,
        },
        "model": {
            "initializer": "xavier_uniform",
            "encoder": {
                "type": "transformer", "num_layers": 2, "num_heads": 2,
                "embeddings": {"embedding_dim": 80},
                "hidden_size": 32, "ff_size": 64, "dropout": 0.1,
                "subsample": True, "conv_kernel_sizes": [5, 5],
                "conv_channels": 32, "in_channels": 80, "layer_norm": "pre",
            },
            "decoder": {
                "type": "transformer", "num_layers": 2, "num_heads": 2,
                "embeddings": {"embedding_dim": 32, "scale": True, "dropout": 0.1},
                "hidden_size": 32, "ff_size": 64, "dropout": 0.1,
                "layer_norm": "pre",
            },
        },
    }


@needs_ref
def test_s2t_train_validate_test():
    tmp = Path(tempfile.mkdtemp())
    cfg = s2t_cfg(tmp)
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=False)
    model_dir = Path(cfg["model_dir"])

    assert (model_dir / "latest.ckpt").is_symlink()
    assert (model_dir / "trg_vocab.txt").is_file()
    # validations.txt rows carry wer scores
    lines = (model_dir / "validations.txt").read_text().strip().split("\n")
    assert any("wer" in ln for ln in lines)
    ckpt = load_checkpoint(model_dir / "latest.ckpt")
    assert ckpt["stats_state"]["steps"] >= 1
    # decoded test hypotheses exist
    assert (model_dir / "best.hyps.test").is_file()


@needs_ref
def test_s2t_conformer_train():
    """Conformer encoder (conv module + dual FFN, joeynmt/encoders.py:376-445)
    trains end-to-end through the same S2T pipeline: one epoch + validation
    + checkpointing must succeed with finite losses."""
    tmp = Path(tempfile.mkdtemp())
    cfg = s2t_cfg(tmp)
    cfg["model"]["encoder"]["type"] = "conformer"
    cfg["model"]["encoder"]["depthwise_conv_kernel_size"] = 5
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    model_dir = Path(cfg["model_dir"])
    assert (model_dir / "latest.ckpt").is_symlink()
    lines = (model_dir / "validations.txt").read_text().strip().split("\n")
    assert any("wer" in ln for ln in lines)


@needs_ref
def test_s2t_transfer_partial_init():
    """load_encoder from a previous checkpoint (ST transfer semantics,
    joeynmt/training.py:294-309)."""
    tmp = Path(tempfile.mkdtemp())
    cfg = s2t_cfg(tmp)
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    ckpt_path = (Path(cfg["model_dir"]) / "latest.ckpt").resolve()

    import copy

    cfg2 = copy.deepcopy(s2t_cfg(tmp))
    cfg2["model_dir"] = (tmp / "model2").as_posix()
    cfg2["training"]["load_encoder"] = ckpt_path.as_posix()
    cfg2["training"]["epochs"] = 1
    make_model_dir(Path(cfg2["model_dir"]))
    train(cfg2, skip_test=True)
    assert (Path(cfg2["model_dir"]) / "latest.ckpt").exists()


@needs_ref
def test_s2t_beam_wer_eval_protocol():
    """Full eval protocol end-to-end (VERDICT r1 item 5): overfit the tiny
    S2T model on the 10 reference wavs, then run the *test-mode* path —
    beam k=5 + GNMT length penalty + corpus WER — through prediction.test()
    and assert the WER, replicating the librispeech_960h.yaml protocol
    (/root/reference/configs/librispeech_960h.yaml,
    /root/reference/joeynmt/metrics.py:110-131)."""
    from joeys2t_tpu.config import parse_global_args
    from joeys2t_tpu.prediction import predict, prepare, test as run_test

    tmp = Path(tempfile.mkdtemp())
    cfg = s2t_cfg(tmp)
    cfg["training"].update(epochs=400, validation_freq=500, logging_freq=100,
                           learning_rate=2.0e-3, learning_rate_warmup=30)
    cfg["model"]["encoder"].update(hidden_size=64, ff_size=128,
                                   conv_channels=64)
    cfg["model"]["decoder"].update(hidden_size=64, ff_size=128)
    cfg["model"]["decoder"]["embeddings"]["embedding_dim"] = 64
    # overfitting run: no SpecAugment noise
    del cfg["data"]["src"]["tokenizer_cfg"]["specaugment"]
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)

    # beam k=5 with length penalty, librispeech_960h.yaml-style
    cfg["testing"].update(beam_size=5, beam_alpha=1.0)

    # 1) the real CLI test-mode path writes hypotheses per split
    out_prefix = (tmp / "out").as_posix()
    run_test(cfg, output_path=out_prefix)
    hyp_file = Path(f"{out_prefix}.test")
    assert hyp_file.is_file()
    assert len(hyp_file.read_text().strip().split("\n")) == 10

    # 2) assert corpus WER through the same predict() engine
    args = parse_global_args(cfg, rank=0, mode="test")
    model, spec, params, loss_fn, _, _, test_data = prepare(
        args, rank=0, mode="test")
    test_data.reset_indices(random_subset=-1)
    scores, _, hyp, _, _, _ = predict(
        params=params, model=model, spec=spec, data=test_data,
        loss_fn=loss_fn, compute_loss=False, normalization="batch",
        num_workers=0, args=args.test)
    assert "wer" in scores
    # overfit on 10 utterances: calibrated run reached WER ~56 after 400
    # epochs (untrained ~100+, truncated-decode ~195); 80 bounds flakiness
    # while still catching truncation/protocol regressions
    assert scores["wer"] < 80.0, scores
    assert all(len(h) > 0 for h in hyp)
