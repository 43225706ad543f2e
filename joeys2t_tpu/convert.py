# coding: utf-8
"""
Convert reference (joeynmt/joeys2t torch) checkpoints into flax param trees.

Lets users load the published hub models (hubconf.py:110-290: librispeech
960h/100h ASR, MuST-C ASR/MT/ST, IWSLT/WMT MT) into this framework. Name
mapping (torch module path -> flax tree path):

  {src,trg}_embed.lut.weight            -> {src,trg}_embed/lut/embedding
  encoder.layers.N.*                    -> encoder/layer_N/*
  *.{k,v,q,output}_layer.weight         -> */kernel (transposed)
  *.feed_forward.pwff_layer.{0,3}       -> */feed_forward/dense{1,2}
  *.layer_norm.{weight,bias}            -> */layer_norm/{scale,bias}
  encoder.subsampler.conv_layers.N      -> encoder/subsampler/conv_N
                                           (conv weight (out,in,k)->(k,in,out))
  decoder.{output,ctc_output}_layer     -> decoder/{output,ctc_output}_layer
  *.rnn.weight_ih_l{k}[_reverse] etc.   -> gate-split flax GRU/LSTM cells
                                           (_convert_rnn_cell; bias pairs
                                           summed where redundant)
  conv_module.batch_norm.*              -> batch_norm_{scale,bias,mean,var}
                                           (inference-form BN, conformer)
"""
from typing import Dict

import numpy as np

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """Convert a joeynmt model_state dict (name -> tensor/ndarray) into the
    flax param tree of the equivalent Seq2SeqModel."""
    tree: Dict = {}
    rnn_groups: Dict = {}
    for name, tensor in state_dict.items():
        value = np.asarray(getattr(tensor, "numpy", lambda: tensor)())
        parts = name.split(".")
        if "rnn" in parts:
            # torch nn.GRU/nn.LSTM flat tensors; gate-split after the loop
            # (bias pairs must be combined)
            side = parts[0]  # encoder | decoder
            leaf = parts[-1]  # e.g. weight_ih_l0_reverse
            reverse = leaf.endswith("_reverse")
            if reverse:
                leaf = leaf[: -len("_reverse")]
            kind, layer = leaf.rsplit("_l", 1)
            rnn_groups.setdefault((side, int(layer), reverse), {})[kind] = value
            continue
        if parts[-1] == "num_batches_tracked":  # BN bookkeeping, not needed
            continue
        if "pe" in parts and parts[-1] == "pe":
            # sinusoidal positional-encoding buffer: a constant table we
            # recompute (models/modules.py sinusoidal_pe), not a parameter
            continue

        if parts[0] in ("src_embed", "trg_embed") and parts[1] == "lut":
            _set(tree, (parts[0], "lut", "embedding"), value)
            continue

        assert parts[0] in ("encoder", "decoder"), name
        path = [parts[0]]
        i = 1
        while i < len(parts):
            p = parts[i]
            if p == "layers":
                path.append(f"layer_{parts[i + 1]}")
                i += 2
                continue
            if p == "pwff_layer":
                idx = parts[i + 1]
                path.append({"0": "dense1", "3": "dense2"}[idx])
                i += 2
                continue
            if p == "conv_layers":
                path.append(f"conv_{parts[i + 1]}")
                i += 2
                continue
            if p == "batch_norm":
                # conformer BN (transformer_layers.py:448) -> inference-form
                # params on ConvolutionModule (norm_type="batchnorm")
                leaf = {"weight": "batch_norm_scale", "bias": "batch_norm_bias",
                        "running_mean": "batch_norm_mean",
                        "running_var": "batch_norm_var"}[parts[i + 1]]
                path.append(leaf)
                i += 2
                continue
            if p in ("weight", "bias"):
                is_norm = path[-1].endswith("layer_norm") or path[-1] == "norm"
                is_pointwise = path[-1].startswith("pointwise_conv")
                if p == "weight":
                    if is_norm:
                        path.append("scale")
                    elif is_pointwise:
                        # torch Conv1d k=1 (out, in, 1) -> flax Dense (in, out)
                        value = value[:, :, 0].T
                        path.append("kernel")
                    elif value.ndim == 2:  # Linear: (out, in) -> (in, out)
                        value = value.T
                        path.append("kernel")
                    elif value.ndim == 3:  # Conv1d: (out, in, k) -> (k, in, out)
                        value = np.transpose(value, (2, 1, 0))
                        path.append("kernel")
                    else:
                        path.append("kernel")
                else:
                    path.append("bias")
                i += 1
                continue
            path.append(p)
            i += 1
        _set(tree, tuple(path), value)

    for (side, layer, reverse), g in rnn_groups.items():
        _convert_rnn_cell(tree, side, layer, reverse, g)
    return tree


def _convert_rnn_cell(tree: Dict, side: str, layer: int, reverse: bool,
                      g: Dict) -> None:
    """Split torch nn.GRU/nn.LSTM flat layer tensors into flax cell params.

    torch packs gates row-wise: GRU [r; z; n] (each H rows), LSTM
    [i; f; g; o]. flax GRUCell/OptimizedLSTMCell keep one Dense per gate
    and drop the redundant second bias on the sigmoid gates, so the torch
    bias pairs are summed where both act pre-activation (exact identity:
    sigma(x + b1 + b2) = sigma(x + (b1+b2))); the GRU candidate keeps
    b_hn inside the r-gated term like torch does."""
    w_ih, w_hh = g["weight_ih"], g["weight_hh"]
    b_ih = g.get("bias_ih")
    b_hh = g.get("bias_hh")
    h = w_hh.shape[1]
    n_gates = w_ih.shape[0] // h
    assert n_gates in (3, 4), (side, layer, w_ih.shape)

    def rows(mat, i):
        return mat[i * h:(i + 1) * h]

    if side == "encoder":
        cell_path = (f"{'bwd' if reverse else 'fwd'}_l{layer}", "cell_0")
    else:
        cell_path = ("rnn", f"cell_{layer}")
    base = (side,) + cell_path

    if n_gates == 3:  # GRU: gates r, z, n
        for i, gate in enumerate("rzn"):
            _set(tree, base + (f"i{gate}", "kernel"), rows(w_ih, i).T)
            _set(tree, base + (f"h{gate}", "kernel"), rows(w_hh, i).T)
        if b_ih is not None:
            _set(tree, base + ("ir", "bias"), rows(b_ih, 0) + rows(b_hh, 0))
            _set(tree, base + ("iz", "bias"), rows(b_ih, 1) + rows(b_hh, 1))
            _set(tree, base + ("in", "bias"), rows(b_ih, 2))
            _set(tree, base + ("hn", "bias"), rows(b_hh, 2))
    else:  # LSTM: gates i, f, g, o
        for i, gate in enumerate("ifgo"):
            _set(tree, base + (f"i{gate}", "kernel"), rows(w_ih, i).T)
            _set(tree, base + (f"h{gate}", "kernel"), rows(w_hh, i).T)
            if b_ih is not None:
                _set(tree, base + (f"h{gate}", "bias"),
                     rows(b_ih, i) + rows(b_hh, i))


def flax_to_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (for interoperability checks and exporting)."""
    out = {}

    def walk(node, path):
        for key, value in node.items():
            if isinstance(value, dict):
                walk(value, path + [key])
            else:
                out["|".join(path + [key])] = np.asarray(value)

    walk(params, [])

    converted = {}
    rnn_cells: Dict = {}
    for flat_name, value in out.items():
        parts = flat_name.split("|")

        # RNN cells: collect per-gate Dense params, reassemble below
        cell_key = _rnn_cell_key(parts)
        if cell_key is not None:
            side, layer, reverse, gate, leaf = cell_key
            rnn_cells.setdefault((side, layer, reverse), {})[(gate, leaf)] = value
            continue

        name_parts = []
        for p in parts[:-1]:
            if p.startswith("layer_") and p[6:].isdigit():
                name_parts.extend(["layers", p[6:]])
            elif p == "dense1":
                name_parts.extend(["pwff_layer", "0"])
            elif p == "dense2":
                name_parts.extend(["pwff_layer", "3"])
            elif p.startswith("conv_") and p[5:].isdigit():
                name_parts.extend(["conv_layers", p[5:]])
            else:
                name_parts.append(p)
        leaf = parts[-1]
        is_pointwise = name_parts and name_parts[-1].startswith("pointwise_conv")
        if leaf.startswith("batch_norm_"):
            # inference-form conformer BN -> torch nn.BatchNorm1d tensors
            name_parts.append("batch_norm")
            name_parts.append({"batch_norm_scale": "weight",
                               "batch_norm_bias": "bias",
                               "batch_norm_mean": "running_mean",
                               "batch_norm_var": "running_var"}[leaf])
        elif leaf == "embedding":
            name_parts.append("weight")
        elif leaf == "scale":
            name_parts.append("weight")
        elif leaf == "kernel":
            if is_pointwise:  # flax Dense (in, out) -> torch Conv1d (out, in, 1)
                value = value.T[:, :, None]
            elif value.ndim == 2:
                value = value.T
            elif value.ndim == 3:
                value = np.transpose(value, (2, 1, 0))
            name_parts.append("weight")
        else:
            name_parts.append(leaf)
        converted[".".join(name_parts)] = value

    for (side, layer, reverse), gates in rnn_cells.items():
        _export_rnn_cell(converted, side, layer, reverse, gates)
    return converted


def _rnn_cell_key(parts):
    """Match flax RNN cell paths: encoder|fwd_lK|cell_0|ir|kernel,
    encoder|bwd_lK|cell_0|..., decoder|rnn|cell_K|... Returns
    (side, layer, reverse, gate, leaf) or None."""
    if len(parts) != 5:
        return None
    side, mid, cell, gate, leaf = parts
    if not cell.startswith("cell_") or len(gate) != 2 or gate[0] not in "ih":
        return None
    if mid == "rnn":
        return side, int(cell[5:]), False, gate, leaf
    if mid.startswith(("fwd_l", "bwd_l")) and mid[5:].isdigit():
        return side, int(mid[5:]), mid.startswith("bwd"), gate, leaf
    return None


def _export_rnn_cell(converted: Dict, side: str, layer: int, reverse: bool,
                     gates: Dict) -> None:
    """Reassemble flax GRU/LSTM cell params into torch nn.GRU/nn.LSTM flat
    tensors. Inverse of _convert_rnn_cell up to the bias split: the summed
    sigmoid-gate bias pairs are exported as bias_ih with bias_hh zeroed
    (except the GRU candidate's b_hn, which is uniquely recoverable), which
    is behavior-identical in torch (round-trip-exact forward)."""
    gru = ("ir", "kernel") in gates
    order = "rzn" if gru else "ifgo"
    w_ih = np.concatenate([gates[(f"i{g}", "kernel")].T for g in order], axis=0)
    w_hh = np.concatenate([gates[(f"h{g}", "kernel")].T for g in order], axis=0)
    h = w_hh.shape[1]
    suffix = f"l{layer}" + ("_reverse" if reverse else "")
    prefix = f"{side}.rnn."
    converted[prefix + f"weight_ih_{suffix}"] = w_ih
    converted[prefix + f"weight_hh_{suffix}"] = w_hh
    zeros = np.zeros(h, w_ih.dtype)
    if gru:
        if ("ir", "bias") in gates:
            b_ih = np.concatenate([gates[("ir", "bias")], gates[("iz", "bias")],
                                   gates[("in", "bias")]])
            b_hh = np.concatenate([zeros, zeros, gates[("hn", "bias")]])
            converted[prefix + f"bias_ih_{suffix}"] = b_ih
            converted[prefix + f"bias_hh_{suffix}"] = b_hh
    else:
        if ("hi", "bias") in gates:
            b_ih = np.concatenate([gates[(f"h{g}", "bias")] for g in order])
            converted[prefix + f"bias_ih_{suffix}"] = b_ih
            converted[prefix + f"bias_hh_{suffix}"] = np.concatenate(
                [zeros] * 4)


def load_torch_checkpoint(path, allow_pickle: bool = False) -> Dict:
    """Load a torch-format reference checkpoint and convert model params.

    Tries the safe ``weights_only=True`` loader first (tensors only, no
    arbitrary pickle execution). Reference training checkpoints also carry
    scheduler/iterator state that needs full unpickling; that path runs only
    with explicit ``allow_pickle=True`` opt-in.
    """
    import pickle

    import torch

    from pathlib import Path as _Path

    if not _Path(path).is_file():
        raise FileNotFoundError(path)
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError) as e:
        # torch raises UnpicklingError/RuntimeError when the safe loader
        # hits non-tensor pickled state; anything else (corrupt file, IO)
        # propagates rather than steering users toward the unsafe flag
        if not allow_pickle:
            raise RuntimeError(
                f"{path} needs full (unsafe) unpickling to load; pass "
                f"allow_pickle=True if you trust its source.") from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["model_state"] if "model_state" in ckpt else ckpt
    params = torch_state_dict_to_flax(
        {k: v.cpu().numpy() for k, v in state_dict.items()})
    return {
        "model_state": params,
        "optimizer_state": None,
        "scheduler_state": None,
        "train_iter_state": None,
        "stats_state": ckpt.get("stats_state"),
    }
