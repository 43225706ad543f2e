#!/usr/bin/env python
# coding: utf-8
"""End-to-end library drive (see .claude/skills/verify): train a tiny MT
transformer on a synthetic copy task on the virtual CPU mesh, assert the
loss collapses and KV-cached greedy decode reproduces the source."""
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp
import optax

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.vocabulary import Vocabulary
from joeys2t_tpu.models import build_model
from joeys2t_tpu.losses import XentLoss
from joeys2t_tpu.search import transformer_greedy


def main():
    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    dims = {"num_layers": 2, "num_heads": 4, "hidden_size": 64,
            "ff_size": 128, "dropout": 0.0,
            "embeddings": {"embedding_dim": 64}}
    cfg = {"encoder": {"type": "transformer", **dims},
           "decoder": {"type": "transformer", **dims}}
    model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
    rng = np.random.RandomState(0)
    B, T = 32, 10

    def make_batch():
        seq = rng.randint(4, 34, size=(B, T))
        trg = np.concatenate([np.full((B, 1), spec.bos_index), seq,
                              np.full((B, 1), spec.eos_index)], 1)
        return (seq.astype(np.int32), trg[:, :-1].astype(np.int32),
                trg[:, 1:].astype(np.int32))

    src, ti, to = make_batch()
    src_len = jnp.full((B,), T, jnp.int32)
    src_mask = jnp.ones((B, 1, T), bool)
    trg_mask = jnp.ones((B, 1, ti.shape[1]), bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(src),
                        jnp.asarray(ti), src_len, src_mask,
                        trg_mask)["params"]
    loss_fn = XentLoss(pad_index=spec.pad_index, smoothing=0.0)
    tx = optax.adam(1e-3)
    ost = tx.init(params)

    @jax.jit
    def step(p, ost, src, ti, to):
        def l(p):
            logits, _, _ = model.apply({"params": p}, src, ti, src_len,
                                       src_mask, trg_mask, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return loss_fn(lp, trg=to)[0] / B

        v, g = jax.value_and_grad(l)(p)
        u, ost = tx.update(g, ost, p)
        return optax.apply_updates(p, u), ost, v

    first = None
    for i in range(400):
        src, ti, to = make_batch()
        params, ost, v = step(params, ost, jnp.asarray(src), jnp.asarray(ti),
                              jnp.asarray(to))
        if first is None:
            first = float(v)
    print(f"loss: {first:.2f} -> {float(v):.3f}")
    assert float(v) < first * 0.4, "loss did not collapse on the copy task"

    enc_out, _, enc_mask = model.apply({"params": params}, jnp.asarray(src),
                                       src_len, src_mask, method="encode")
    out, _, _ = transformer_greedy(params, model, spec, enc_out, enc_mask,
                                   max_output_length=T + 2)
    acc = float((out[:, :T] == src).mean())
    print(f"greedy copy acc: {acc:.3f}")
    assert acc > 0.5, acc
    print("VERIFY OK")


if __name__ == "__main__":
    main()
