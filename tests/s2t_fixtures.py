# coding: utf-8
"""Shared tiny-S2T config + one session-scoped trained snapshot.

Several e2e modules (test_s2t_e2e, test_serving) need "a trained tiny S2T
model on the 10 reference wavs". Training one takes ~40-60s on the 1-core
CPU mesh (mostly jit compiles), so the suite trains it ONCE per session via
the `trained_s2t` fixture in conftest.py and every consumer reuses the
snapshot directory read-only (VERDICT r4 #8: share trained-model fixtures
across e2e modules).
"""
from pathlib import Path

REF_SPEECH = Path("/root/reference/test/data/speech")


def s2t_cfg(tmp: Path) -> dict:
    """Tiny S2T config over the 10 reference LibriSpeech wavs."""
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
