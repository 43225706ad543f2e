# coding: utf-8
"""Mixture-of-experts FFN (modules.py MoEFeedForward) + expert parallelism:
expert-sharded execution over the `model` mesh axis must match replicated
execution exactly. Capability beyond the reference (SURVEY.md §2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.parallel import get_mesh
from joeys2t_tpu.parallel.tp import shard_params_tp, tp_param_shardings
from joeys2t_tpu.vocabulary import Vocabulary

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >= 4 virtual devices")


def moe_cfg(num_experts=4):
    return {
        "attention_impl": "xla",
        "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "num_experts": num_experts,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
        "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
    }


def build(num_experts=4):
    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    return build_model(moe_cfg(num_experts), src_vocab=vocab, trg_vocab=vocab)


def make_inputs(b=4, s=6, t=5):
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randint(4, 30, size=(b, s)), jnp.int32),
            jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32),
            jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32),
            jnp.ones((b, 1, s), bool), jnp.ones((b, 1, t), bool),
            jnp.full((b,), s, jnp.int32))


def test_moe_forward_and_training_signal():
    model, spec = build()
    src, trg_input, trg, src_mask, trg_mask, src_len = make_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]
    ff = params["encoder"]["layer_0"]["feed_forward"]
    assert ff["w1"].shape == (4, 16, 32) and "router" in ff

    def loss(p):
        logits, _, _ = model.apply({"params": p}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], -1))

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    # router receives gradient (top-1 dispatch is scaled by its probability)
    router_grad = g["encoder"]["layer_0"]["feed_forward"]["router"]["kernel"]
    assert float(jnp.abs(router_grad).max()) > 0


def test_expert_parallel_matches_replicated():
    model, spec = build()
    src, trg_input, trg, src_mask, trg_mask, src_len = make_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]

    def loss(p):
        logits, _, _ = model.apply({"params": p}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], -1))

    base_loss, base_grads = jax.value_and_grad(loss)(params)

    ctx = get_mesh(n_devices=4, model_parallel=2)  # 2 experts per device
    shardings = tp_param_shardings(params, ctx)
    spec_w1 = shardings["encoder"]["layer_0"]["feed_forward"]["w1"].spec
    assert spec_w1 == P("model", None, None)
    # router replicated
    assert shardings["encoder"]["layer_0"]["feed_forward"]["router"]["kernel"] \
        .spec == P()

    ep_params = shard_params_tp(params, ctx)
    ep_loss, ep_grads = jax.jit(jax.value_and_grad(loss))(ep_params)
    np.testing.assert_allclose(float(base_loss), float(ep_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(base_grads), jax.tree.leaves(ep_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_moe_learns_on_copy_signal():
    """A couple of adam steps must reduce the loss (experts + router learn)."""
    import optax

    model, spec = build(num_experts=2)
    src, trg_input, trg, src_mask, trg_mask, src_len = make_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            logits, _, _ = model.apply({"params": p}, src, trg_input, src_len,
                                       src_mask, trg_mask, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], -1))

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    losses = []
    for _ in range(8):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_moe_load_balance_aux_loss():
    """Switch aux loss (arXiv:2101.03961 eq. 4) is sown under "aux_loss";
    value is E*sum(f*p) >= 1.0, == 1.0 only at perfectly uniform routing."""
    model, spec = build(num_experts=4)
    src, trg_input, trg, src_mask, trg_mask, src_len = make_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]
    out, mutated = model.apply({"params": params}, src, trg_input, src_len,
                               src_mask, trg_mask, deterministic=True,
                               mutable=["aux_loss"])
    leaves = jax.tree.leaves(mutated["aux_loss"])
    assert len(leaves) >= 1
    aux = float(sum(jnp.sum(jnp.asarray(v)) for v in leaves))
    assert aux >= 1.0 - 1e-5

    # the aux term must carry gradient into the router
    def aux_only(p):
        _, mut = model.apply({"params": p}, src, trg_input, src_len,
                             src_mask, trg_mask, deterministic=True,
                             mutable=["aux_loss"])
        return sum(jnp.sum(jnp.asarray(v))
                   for v in jax.tree.leaves(mut["aux_loss"]))

    g = jax.grad(aux_only)(params)
    router_g = g["encoder"]["layer_0"]["feed_forward"]["router"]["kernel"]
    assert float(jnp.abs(router_g).max()) > 0

    # without the mutable collection, sow is a no-op: plain apply unchanged
    logits, _, _ = model.apply({"params": params}, src, trg_input, src_len,
                               src_mask, trg_mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out[0]),
                               rtol=1e-6)
