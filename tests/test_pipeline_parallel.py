# coding: utf-8
"""GPipe-style pipeline parallelism (joeys2t_tpu/parallel/pp.py): pipelined
execution over a `pipe` mesh axis must match running the layer stack
sequentially — forward and gradients. Capability beyond the reference
(SURVEY.md §2.3: the reference is data-parallel only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from joeys2t_tpu.models.modules import TransformerEncoderLayer
from joeys2t_tpu.parallel.pp import pipeline_apply, stack_layer_params

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >= 4 virtual devices")

H, FF, HEADS, L = 16, 32, 2, 8
B, S_LEN = 8, 6


def make_stack():
    layer = TransformerEncoderLayer(size=H, ff_size=FF, num_heads=HEADS,
                                    dropout=0.0, layer_norm_position="pre")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S_LEN, H).astype(np.float32))
    mask = jnp.ones((B, 1, S_LEN), bool)
    per_layer = [
        layer.init(jax.random.PRNGKey(i), x, mask, True)["params"]
        for i in range(L)
    ]

    def layer_fn(p, h, m):
        return layer.apply({"params": p}, h, m, True)

    return layer, layer_fn, per_layer, x, mask


def sequential(layer_fn, per_layer, x, mask):
    for p in per_layer:
        x = layer_fn(p, x, mask)
    return x


def test_pipeline_matches_sequential():
    _, layer_fn, per_layer, x, mask = make_stack()
    want = sequential(layer_fn, per_layer, x, mask)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    stacked = stack_layer_params(per_layer)
    got = pipeline_apply(layer_fn, stacked, x, 4, mesh, "pipe", mask)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_pipeline_microbatch_counts():
    _, layer_fn, per_layer, x, mask = make_stack()
    want = sequential(layer_fn, per_layer, x, mask)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    stacked = stack_layer_params(per_layer)
    for m in (1, 2, 8):  # including degenerate single microbatch
        got = pipeline_apply(layer_fn, stacked, x, m, mesh, "pipe", mask)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-5, err_msg=f"m={m}")


def test_pipeline_gradients_match():
    """The GPipe backward schedule falls out of autodiff through ppermute."""
    _, layer_fn, per_layer, x, mask = make_stack()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    stacked = stack_layer_params(per_layer)

    def loss_seq(stacked_p):
        per = [jax.tree.map(lambda a: a[i], stacked_p) for i in range(L)]
        return jnp.sum(sequential(layer_fn, per, x, mask) ** 2)

    def loss_pipe(stacked_p):
        return jnp.sum(
            pipeline_apply(layer_fn, stacked_p, x, 4, mesh, "pipe", mask) ** 2)

    g_seq = jax.grad(loss_seq)(stacked)
    g_pipe = jax.grad(loss_pipe)(stacked)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pipe)):
        # float32 reduction-order noise through the pipeline collectives
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-4)
