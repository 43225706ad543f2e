#!/usr/bin/env python
# coding: utf-8
"""Measure int8-decode-cache quality drift on a TRAINED flagship model.

The int8 serving knob's parity tests run at tiny dims; this decodes a
real trained checkpoint (the synthetic-ASR flagship run,
configs/synthetic_asr.yaml) over its held-out test split with bf16 vs
int8 caches and reports WER + hypothesis agreement — the measurement a
deployment would gate on.

Usage: python -u scripts/probe_int8_quality.py [model_dir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import yaml

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from joeys2t_tpu.config import parse_global_args
from joeys2t_tpu.prediction import predict, prepare


def decode_test(cfg):
    args = parse_global_args(cfg, rank=0, mode="test")
    model, spec, params, loss_fn, _, _, test_data = prepare(
        args, rank=0, mode="test")
    test_data.reset_indices(random_subset=-1)
    scores, _, hyps, _, _, _ = predict(
        params=params, model=model, spec=spec, data=test_data,
        loss_fn=loss_fn, compute_loss=False, normalization="batch",
        num_workers=0, args=args.test)
    return scores, hyps


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else "models/synthetic_asr"
    cfg = yaml.safe_load(Path("configs/synthetic_asr.yaml").read_text())
    cfg["model_dir"] = model_dir
    cfg["testing"]["load_model"] = str(Path(model_dir) / "best.ckpt")

    results = {}
    for label, flags in [("bf16", {}),
                         ("cross_int8", {"cache_cross_int8": True}),
                         ("cross+self_int8", {"cache_cross_int8": True,
                                              "cache_self_int8": True})]:
        for k in ("cache_cross_int8", "cache_self_int8"):
            cfg["model"].pop(k, None)
        cfg["model"].update(flags)
        scores, hyps = decode_test(cfg)
        results[label] = (scores["wer"], hyps)
        base = results["bf16"][1]
        agree = sum(h == b for h, b in zip(hyps, base)) / len(hyps)
        print(f"{label}: test WER {scores['wer']:.2f}  "
              f"(hyp agreement vs bf16 {agree:.3f})", flush=True)


if __name__ == "__main__":
    main()
