# coding: utf-8
"""Sharded (orbax) checkpointing: params saved from a tensor-parallel mesh
restore with their shardings intact and identical values — the scale path
where the pickle checkpoint's host gather would not fit."""
from pathlib import Path

import jax
import numpy as np
import pytest

from joeys2t_tpu.checkpoints import load_sharded, save_sharded
from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.parallel import get_mesh
from joeys2t_tpu.parallel.tp import shard_params_tp
from joeys2t_tpu.vocabulary import Vocabulary

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >= 4 virtual devices")


def test_tp_sharded_round_trip(tmp_path: Path):
    import jax.numpy as jnp

    vocab = Vocabulary([f"t{i}" for i in range(20)], SpecialSymbols())
    cfg = {"encoder": {"type": "transformer", "num_layers": 1, "num_heads": 2,
                       "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                       "embeddings": {"embedding_dim": 16, "scale": True},
                       "layer_norm": "pre"},
           "decoder": {"type": "transformer", "num_layers": 1, "num_heads": 2,
                       "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                       "embeddings": {"embedding_dim": 16, "scale": True},
                       "layer_norm": "pre"}}
    model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 4), jnp.int32),
        jnp.ones((1, 3), jnp.int32), jnp.full((1,), 4, jnp.int32),
        jnp.ones((1, 1, 4), bool), jnp.ones((1, 1, 3), bool))["params"]
    ctx = get_mesh(n_devices=4, model_parallel=2)
    sharded = shard_params_tp(params, ctx)

    save_sharded(tmp_path / "ckpt", sharded)
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        sharded)
    restored = load_sharded(tmp_path / "ckpt", template)

    q = restored["encoder"]["layer_0"]["src_src_att"]["q_layer"]["kernel"]
    from jax.sharding import PartitionSpec as P
    assert q.sharding.spec == P(None, "model")
    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
