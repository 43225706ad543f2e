#!/usr/bin/env python
# coding: utf-8
"""Probe: CONFORMER train-step throughput vs batch size (and remat).

The conformer is the better-converging flagship recipe (16L paper-macaron
+ layerscale, 132M params — docs/benchmarks_s2t.md "Conformer
from-scratch run"), but the transformer sweep's B=192 sweet spot does not
transfer: the conformer carries ~40% more parameters and the conv modules
add activation pressure per layer. At B=128 the step does NOT fit 16GB
HBM — XLA's rematerializer kicks in (.remat fusions in the trace) and the
backend pages (wall 4519ms vs 215ms device-busy, scripts/profile_train.py
--encoder conformer). This sweep finds the honest per-chip operating
point.

Usage: python -u scripts/probe_conformer_train.py [B ...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _s2t_model_cfg
from bench import _bench_train_step
from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.vocabulary import Vocabulary


def build(remat: bool):
    vocab = Vocabulary([f"tok{i}" for i in range(5000)], SpecialSymbols())
    cfg = _s2t_model_cfg()
    cfg["encoder"].update(type="conformer", macaron="paper", layerscale=0.1,
                          depthwise_conv_kernel_size=31)
    if remat:
        cfg["remat"] = True
    return build_model(cfg, src_vocab=None, trg_vocab=vocab,
                       compute_dtype=jnp.bfloat16)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [48, 64, 96, 128]
    model, spec = build(remat=False)
    b0, n_frames = 2, 16
    src = jnp.zeros((b0, n_frames, 80), jnp.float32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, src,
        jnp.ones((b0, 8), jnp.int32), jnp.full((b0,), n_frames, jnp.int32),
        None, jnp.ones((b0, 1, 8), bool), deterministic=True)["params"]
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"conformer params: {n/1e6:.1f}M", flush=True)
    for bs in batches:
        for remat in (False, True):
            m, _ = build(remat)
            try:
                r = _bench_train_step(m, spec, params, batch_size=bs)
                print(f"B={bs} remat={remat}: {r}", flush=True)
            except Exception as e:
                print(f"B={bs} remat={remat}: FAILED {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
