#!/usr/bin/env python
# coding: utf-8
"""Probe: per-dispatch vs scan-fused train stepping at the bench config.

The bench (and the production loop) dispatches one jitted train step per
batch; over the axon tunnel each dispatch carries host/RPC overhead that
the deferred-metrics pipeline may not fully hide. Fusing K steps into ONE
dispatch with lax.scan measures the pure device limit — if the gap is
real, `training: steps_per_dispatch` becomes a worthwhile production knob.

Usage: python -u scripts/probe_scan_dispatch.py [batch] [K]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from __graft_entry__ import _build
from bench import _init_flagship_params
from joeys2t_tpu.losses import XentCTCLoss


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_frames, trg_len = 1000, 48

    model, spec = _build()
    params = _init_flagship_params(model)
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch,), n_frames, jnp.int32)
    trg = jnp.asarray(
        rng.randint(4, 1000, size=(batch, trg_len)).astype(np.int32))
    trg_input, trg_out = trg[:, :-1], trg[:, 1:]
    trg_mask = jnp.ones((batch, 1, trg_len - 1), bool)
    trg_length = jnp.full((batch,), trg_len - 1, jnp.int32)
    loss_fn = XentCTCLoss(pad_index=spec.pad_index, bos_index=spec.bos_index,
                          smoothing=0.1, ctc_weight=0.3)
    tx = optax.adamw(1e-4)
    params = jax.tree.map(jnp.copy, params)
    opt_state = tx.init(params)

    def loss(p, dummy):
        logits, ctc_logits, out_mask = model.apply(
            {"params": p}, src + dummy, trg_input, src_length, None,
            trg_mask, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        total, _, _ = loss_fn(lp, trg=trg_out, trg_length=trg_length,
                              src_mask=out_mask, ctc_logits=ctc_logits)
        return total / batch

    def one_step(params, opt_state, dummy):
        l, grads = jax.value_and_grad(loss)(params, dummy)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    # A: per-dispatch (the bench's measurement)
    step_a = jax.jit(one_step, donate_argnums=(0, 1))
    p, o, l = step_a(params, opt_state, jnp.float32(0))
    np.asarray(l)
    best_a = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(k):
            p, o, l = step_a(p, o, jnp.float32(i) * 1e-9)
        np.asarray(l)
        best_a = min(best_a, (time.perf_counter() - t0) / k)

    # B: K steps fused in one dispatch via lax.scan
    @partial(jax.jit, donate_argnums=(0, 1))
    def steps_scan(params, opt_state, dummies):
        def body(carry, dummy):
            params, opt_state = carry
            params, opt_state, l = one_step(params, opt_state, dummy)
            return (params, opt_state), l

        (params, opt_state), ls = jax.lax.scan(body, (params, opt_state),
                                               dummies)
        return params, opt_state, ls

    dummies = jnp.arange(k, dtype=jnp.float32) * 1e-9
    p, o, ls = steps_scan(p, o, dummies)
    np.asarray(ls[-1])
    best_b = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        p, o, ls = steps_scan(p, o, dummies)
        np.asarray(ls[-1])
        best_b = min(best_b, (time.perf_counter() - t0) / k)

    for name, per in [("per-dispatch", best_a), ("scan-fused", best_b)]:
        print(f"{name}: {per*1e3:.1f} ms/step = "
              f"{batch*10.0/per:.0f} audio-sec/s/chip", flush=True)


if __name__ == "__main__":
    main()
