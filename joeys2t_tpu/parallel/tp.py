# coding: utf-8
"""
Tensor-parallel parameter sharding over the mesh's `model` axis.

The reference has no tensor parallelism (SURVEY.md §2.3); this extends the
same (data, model) mesh the dp path uses. Megatron-style layout:
  - attention q/k/v kernels: shard the head (output) dim    -> P(None, "model")
  - attention output kernel: shard the input dim            -> P("model", None)
  - FFN dense1 kernel: shard the hidden (output) dim        -> P(None, "model")
  - FFN dense2 kernel: shard the input dim                  -> P("model", None)
  - biases of column-sharded layers: shard                  -> P("model")
  - everything else (embeddings, norms, convs, output head) replicated

With these placements jit/GSPMD inserts the two all-reduces per layer
(after attention output and after FFN) automatically — no collective code.
Activations stay sharded batch-wise over `data` at the same time (2-D
parallelism).
"""
from typing import Dict

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from joeys2t_tpu.parallel.mesh import MeshContext
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_COLUMN_SHARDED = ("k_layer", "v_layer", "q_layer", "dense1")
_ROW_SHARDED = ("output_layer", "dense2")


def _spec_for(path_names, leaf) -> P:
    """PartitionSpec for one param leaf based on its module path."""
    parent = path_names[-2] if len(path_names) >= 2 else ""
    name = path_names[-1]
    # MoE expert weights (modules.py MoEFeedForward): shard the leading
    # expert dim -> expert parallelism; router stays replicated
    if name in ("w1", "b1", "w2", "b2") and "feed_forward" in path_names:
        return P(*(("model",) + (None,) * (leaf.ndim - 1)))
    # attention output_layer is row-sharded; the decoder's vocab output_layer
    # (direct child of decoder) stays replicated (vocab dim is tiny vs ICI cost)
    in_attention = any("att" in p for p in path_names)
    if parent in _COLUMN_SHARDED and name == "kernel" and leaf.ndim == 2:
        return P(None, "model")
    if parent in _COLUMN_SHARDED and name == "bias":
        return P("model")
    if parent in _ROW_SHARDED and name == "kernel" and leaf.ndim == 2:
        if parent == "dense2" or in_attention:
            return P("model", None)
    return P()


def tp_param_shardings(params: Dict, ctx: MeshContext) -> Dict:
    """NamedSharding pytree for tensor-parallel parameter placement."""
    def to_sharding(path, leaf):
        names = [p.key for p in path]
        return NamedSharding(ctx.mesh, _spec_for(names, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_tp(params: Dict, ctx: MeshContext) -> Dict:
    """Place params with tensor-parallel shardings (replicated over `data`)."""
    tp = ctx.mesh.shape["model"]
    if tp <= 1:
        return ctx.replicate_tree(params)
    shardings = tp_param_shardings(params, ctx)
    n_sharded = sum(
        1 for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.spec != P(), shardings,
                         is_leaf=lambda x: isinstance(x, NamedSharding))) if s)
    logger.info("Tensor parallel over %d devices: %d sharded param tensors", tp,
                n_sharded)
    return jax.device_put(params, shardings)
