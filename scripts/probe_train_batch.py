#!/usr/bin/env python
# coding: utf-8
"""Probe: train-step throughput vs batch size (and remat) after the
round-3 step work (CTC-from-logits, patch-matmul subsampler, flat-layout
flash attention).

The round-2 sweep found B=128 the per-chip sweet spot with B=256
regressing under HBM pressure — but that was with ~90ms of since-removed
overhead in the step. Bigger batches mean bigger matmul tiles (the
remaining MFU lever per docs/benchmarks_s2t.md), so re-sweep.

Usage: python -u scripts/probe_train_batch.py [B ...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build, _s2t_model_cfg
from bench import _train_step_throughput
from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.vocabulary import Vocabulary


def build(remat: bool):
    vocab = Vocabulary([f"tok{i}" for i in range(5000)], SpecialSymbols())
    cfg = _s2t_model_cfg()
    if remat:
        cfg["remat"] = True
    return build_model(cfg, src_vocab=None, trg_vocab=vocab,
                       compute_dtype=jnp.bfloat16)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [128, 192, 256]
    model, spec = _build()
    b0, n_frames = 4, 1000
    src = jnp.zeros((b0, n_frames, 80), jnp.float32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, src,
        jnp.ones((b0, 8), jnp.int32), jnp.full((b0,), n_frames, jnp.int32),
        None, jnp.ones((b0, 1, 8), bool), deterministic=True)["params"]
    for bs in batches:
        for remat in (False, True):
            m, _ = build(remat)
            try:
                r = _train_step_throughput(m, spec, params, batch_size=bs)
                print(f"B={bs} remat={remat}: {r}", flush=True)
            except Exception as e:
                print(f"B={bs} remat={remat}: FAILED {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
