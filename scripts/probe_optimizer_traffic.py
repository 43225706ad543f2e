#!/usr/bin/env python
# coding: utf-8
"""Probe: does cutting optimizer-state HBM traffic move the flagship train
step? (VERDICT r3 item 2's last unmeasured lever.)

Three optimizer variants on the B=192 flagship step, same model/params:
  adamw-fp32   — the bench baseline (2 fp32 moments: ~2 x 95M x 4B r/w per step)
  adamw-bf16mu — optax mu_dtype=bfloat16 (first moment halved)
  adafactor    — factored second moments, no first moment (state ~= vectors)

Usage: python -u scripts/probe_optimizer_traffic.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from __graft_entry__ import _build
from bench import _init_flagship_params, _train_step_throughput
from joeys2t_tpu.optim import build_optimizer


def main():
    model, spec = _build()
    params = _init_flagship_params(model)
    variants = {
        "adamw-fp32": optax.adamw(1e-4),
        "adamw-bf16mu": optax.adamw(1e-4, mu_dtype=jnp.bfloat16),
        "adafactor": build_optimizer(
            {"optimizer": "adafactor", "learning_rate": 1e-4}),
    }
    for name, tx in variants.items():
        r = _train_step_throughput(model, spec, params, batch_size=192, tx=tx)
        print(f"{name}: {r}", flush=True)


if __name__ == "__main__":
    main()
