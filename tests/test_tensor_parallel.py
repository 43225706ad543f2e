# coding: utf-8
"""Tensor parallelism over the `model` mesh axis: sharded params must produce
the same loss/gradients as replicated execution (GSPMD inserts the
collectives; capability beyond the reference, SURVEY.md §2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.parallel import get_mesh
from joeys2t_tpu.parallel.tp import shard_params_tp, tp_param_shardings
from joeys2t_tpu.vocabulary import Vocabulary

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >= 4 virtual devices")


def build():
    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    cfg = {
        "attention_impl": "xla",  # flash kernel not yet shard_map-aware
        "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
        "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
    }
    return build_model(cfg, src_vocab=vocab, trg_vocab=vocab)


def test_tp_matches_replicated():
    model, spec = build()
    b, s, t = 4, 6, 5
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(4, 30, size=(b, s)), jnp.int32)
    trg_input = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    trg = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    src_mask = jnp.ones((b, 1, s), bool)
    trg_mask = jnp.ones((b, 1, t), bool)
    src_len = jnp.full((b,), s, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]

    def loss(p):
        logits, _, _ = model.apply({"params": p}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], axis=-1))

    base_loss, base_grads = jax.value_and_grad(loss)(params)

    # 2-way data x 2-way model parallel
    ctx = get_mesh(n_devices=4, model_parallel=2)
    tp_params = shard_params_tp(params, ctx)
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss))(tp_params)

    np.testing.assert_allclose(float(base_loss), float(tp_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(base_grads), jax.tree.leaves(tp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tp_with_sequence_parallel_matches():
    """sequence_parallel=True adds residual-stream sharding constraints along
    the sequence dim over `model` (Megatron SP); results must be unchanged."""
    from joeys2t_tpu.parallel import set_default_mesh

    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    cfg = {
        "attention_impl": "xla",
        "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
        "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
    }
    model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
    model_sp, _ = build_model(dict(cfg, sequence_parallel=True),
                              src_vocab=vocab, trg_vocab=vocab)
    assert model_sp.encoder.sequence_parallel

    b, s, t = 4, 8, 6  # seq dims divisible by tp=2
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randint(4, 30, size=(b, s)), jnp.int32)
    trg_input = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    trg = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    src_mask = jnp.ones((b, 1, s), bool)
    trg_mask = jnp.ones((b, 1, t), bool)
    src_len = jnp.full((b,), s, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]

    def loss(m):
        def f(p):
            logits, _, _ = m.apply({"params": p}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], axis=-1))
        return f

    base_loss, base_grads = jax.value_and_grad(loss(model))(params)

    ctx = get_mesh(n_devices=4, model_parallel=2)
    set_default_mesh(ctx)
    try:
        tp_params = shard_params_tp(params, ctx)
        sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss(model_sp)))(tp_params)
    finally:
        set_default_mesh(None)
    np.testing.assert_allclose(float(base_loss), float(sp_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(base_grads), jax.tree.leaves(sp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tp_shardings_structure():
    model, spec = build()
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 4), jnp.int32),
        jnp.ones((1, 3), jnp.int32), jnp.full((1,), 4, jnp.int32),
        jnp.ones((1, 1, 4), bool), jnp.ones((1, 1, 3), bool))["params"]
    ctx = get_mesh(n_devices=4, model_parallel=2)
    shardings = tp_param_shardings(params, ctx)
    from jax.sharding import PartitionSpec as P

    flat = jax.tree_util.tree_leaves_with_path(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))
    specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
    # attention qkv column-sharded, attention output row-sharded
    assert specs["['encoder']['layer_0']['src_src_att']['q_layer']['kernel']"] \
        == P(None, "model")
    assert specs["['encoder']['layer_0']['src_src_att']['output_layer']['kernel']"] \
        == P("model", None)
    # ffn dense1 column, dense2 row
    assert specs["['encoder']['layer_0']['feed_forward']['dense1']['kernel']"] \
        == P(None, "model")
    assert specs["['encoder']['layer_0']['feed_forward']['dense2']['kernel']"] \
        == P("model", None)
    # embeddings + norms replicated
    assert specs["['src_embed']['lut']['embedding']"] == P()
    assert specs["['encoder']['layer_0']['layer_norm']['scale']"] == P()


def test_search_under_mesh_matches_unsharded():
    """Greedy and beam search with an installed data-parallel mesh (inputs
    dim-0 sharded, GSPMD propagating through the decode while_loop — the
    multi-chip serving path) must produce exactly the unsharded results,
    including the beam-shared cross-cache layout (B untiled vs B*K self)."""
    import numpy as np

    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.parallel.mesh import get_mesh, set_default_mesh
    from joeys2t_tpu.search import beam_search, greedy
    from joeys2t_tpu.vocabulary import Vocabulary

    vocab = Vocabulary([f"t{i}" for i in range(20)], SpecialSymbols())
    side = {"type": "transformer", "num_layers": 2, "num_heads": 2,
            "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
            "embeddings": {"embedding_dim": 16, "scale": True},
            "layer_norm": "pre"}
    model, spec = build_model({"encoder": dict(side), "decoder": dict(side)},
                              src_vocab=vocab, trg_vocab=vocab)
    b, s = 8, 7  # divides the 4-device data axis
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randint(4, 24, size=(b, s)), jnp.int32)
    src_mask = jnp.ones((b, 1, s), bool)
    params = model.init({"params": jax.random.PRNGKey(2)}, src,
                        jnp.ones((b, 3), jnp.int32),
                        jnp.full((b,), s, jnp.int32), src_mask,
                        jnp.ones((b, 1, 3), bool))["params"]
    enc, _, _ = model.apply({"params": params}, src,
                            jnp.full((b,), s, jnp.int32), src_mask,
                            method="encode")

    # the reference runs must be genuinely unsharded — clear any default
    # mesh a previously-run test (e.g. a TrainManager) left installed
    set_default_mesh(None)
    g_ref, _, _ = greedy(params, model, spec, enc, None, src_mask, 12)
    b_ref, bs_ref, _ = beam_search(params, model, spec, enc, None, src_mask,
                                   3, 12, alpha=1.0, n_best=1,
                                   return_prob="hyp")

    ctx = get_mesh(n_devices=4, model_parallel=1)
    set_default_mesh(ctx)
    try:
        sharded_enc = jax.device_put(enc, ctx.data_sharding)
        sharded_mask = jax.device_put(src_mask, ctx.data_sharding)
        with ctx.mesh:
            g_sh, _, _ = greedy(params, model, spec, sharded_enc, None,
                                sharded_mask, 12)
            b_sh, bs_sh, _ = beam_search(params, model, spec, sharded_enc,
                                         None, sharded_mask, 3, 12,
                                         alpha=1.0, n_best=1,
                                         return_prob="hyp")
    finally:
        set_default_mesh(None)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_sh))
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_sh))
    np.testing.assert_allclose(np.asarray(bs_ref), np.asarray(bs_sh),
                               atol=1e-5)
