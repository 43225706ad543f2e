# coding: utf-8
"""
Custom parameter initialization (counterpart of joeynmt/initialization.py).

Operates on the flax param pytree (pure function: params in, params out)
instead of in-place torch mutation. Supports xavier_uniform / xavier_normal /
uniform / normal / zeros for weights, embeddings and biases, plus the DeepNet
alpha/beta scheme (joeynmt/initialization.py:63-76). The reference's
``xavier_uniform_n_`` gate-splitting hack (initialization.py:44-60) is not
needed: flax RNN cells keep per-gate matrices separate, so plain xavier per
matrix already has the intended fan semantics.
"""
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from joeys2t_tpu.config import ConfigurationError
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def compute_alpha_beta(num_enc_layers: int, num_dec_layers: int) -> Dict[str, Dict]:
    """DeepNet alpha/beta (joeynmt/initialization.py:63-76)."""
    return {
        "alpha": {
            "encoder": 0.81 * (num_enc_layers**4 * num_dec_layers)**(1 / 16),
            "decoder": (3 * num_dec_layers)**(1 / 4),
        },
        "beta": {
            "encoder": 0.87 * (num_enc_layers**4 * num_dec_layers)**(-1 / 16),
            "decoder": (12 * num_dec_layers)**(-1 / 4),
        },
    }


def _fans(shape) -> tuple:
    """fan_in/fan_out matching torch._calculate_fan_in_and_fan_out.

    flax Dense kernel: (in, out). flax Conv kernel: (k..., in, out) with
    receptive field folded into both fans (like torch convs)."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def _make_init(name: str, scale: float, gain: float):
    """joeynmt/initialization.py:154-169."""
    scale = float(scale)
    assert scale > 0.0, "incorrect init_weight"
    name = name.lower()

    if name == "xavier_uniform":
        def fn(key, p):
            fan_in, fan_out = _fans(p.shape)
            a = gain * math.sqrt(6.0 / (fan_in + fan_out))
            return jax.random.uniform(key, p.shape, p.dtype, -a, a)
    elif name == "xavier_normal":
        def fn(key, p):
            fan_in, fan_out = _fans(p.shape)
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
            return std * jax.random.normal(key, p.shape, p.dtype)
    elif name == "uniform":
        def fn(key, p):
            return jax.random.uniform(key, p.shape, p.dtype, -scale, scale)
    elif name == "normal":
        def fn(key, p):
            return scale * jax.random.normal(key, p.shape, p.dtype)
    elif name == "zeros":
        def fn(key, p):
            del key
            return jnp.zeros_like(p)
    else:
        raise ConfigurationError("Unknown initializer.")
    return fn


def initialize_model(params: Dict, cfg: dict, src_padding_idx: int,
                     trg_padding_idx: int, rng_key) -> Dict:
    """Re-initialize a flax param tree per the `model` config section
    (joeynmt/initialization.py:79-236). Returns a new pytree."""
    gain = float(cfg.get("init_gain", 1.0))
    init = cfg.get("initializer", "xavier_uniform")
    if init == "xavier":
        init = "xavier_uniform"
        logger.warning("`xavier` option is obsolete. Please use `xavier_uniform`, instead.")
    init_weight = float(cfg.get("init_weight", 0.01))

    embed_init = cfg.get("embed_initializer", "xavier_uniform")
    if embed_init == "xavier":
        embed_init = "xavier_uniform"
    embed_init_weight = float(cfg.get("embed_init_weight", 0.01))
    embed_gain = float(cfg.get("embed_init_gain", 1.0))

    bias_init = cfg.get("bias_initializer", "zeros")
    bias_init_weight = float(cfg.get("bias_init_weight", 0.01))

    deepnet = {}
    if (init == "xavier_normal"
            and cfg.get("encoder", {}).get("type", "transformer") == "transformer"
            and cfg.get("decoder", {}).get("type", "transformer") == "transformer"):
        deepnet = compute_alpha_beta(cfg["encoder"]["num_layers"],
                                     cfg["decoder"]["num_layers"])

    init_fn = _make_init(init, init_weight, gain)
    embed_init_fn = _make_init(embed_init, embed_init_weight, embed_gain)
    bias_init_fn = _make_init(bias_init, bias_init_weight, gain)

    flat = traverse_util.flatten_dict(params)
    new_flat = {}
    keys = jax.random.split(rng_key, max(len(flat), 1))
    for i, (path, p) in enumerate(sorted(flat.items())):
        name = "/".join(str(s) for s in path)
        key = keys[i]
        if "embed" in name and path[-1] == "embedding":
            new_p = embed_init_fn(key, p)
        elif path[-1] == "bias":
            new_p = bias_init_fn(key, p)
        elif p.ndim > 1:
            if init == "xavier_normal" and deepnet and (
                    "feed_forward" in name or "v_layer" in name or "output_layer" in name):
                # DeepNet beta gain (joeynmt/initialization.py:196-207)
                beta = 1.0
                if "encoder" in name:
                    beta = deepnet["beta"]["encoder"]
                elif "decoder" in name:
                    beta = deepnet["beta"]["decoder"]
                new_p = _make_init("xavier_normal", init_weight, beta)(key, p)
            else:
                new_p = init_fn(key, p)
        else:
            new_p = p  # e.g. LayerNorm scale stays at its default (ones)
        new_flat[path] = new_p

    # zero out padding-row embeddings (joeynmt/initialization.py:212-215)
    for path in list(new_flat.keys()):
        name = "/".join(str(s) for s in path)
        if path[-1] == "embedding":
            pad_idx = src_padding_idx if "src_embed" in name else trg_padding_idx
            new_flat[path] = new_flat[path].at[pad_idx].set(0.0)

    return traverse_util.unflatten_dict(new_flat)
