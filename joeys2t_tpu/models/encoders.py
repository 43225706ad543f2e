# coding: utf-8
"""
Encoders (TPU-native counterpart of joeynmt/encoders.py).

TransformerEncoder (joeynmt/encoders.py:175-308) and ConformerEncoder
(joeynmt/encoders.py:376-445) with the Conv1d/GLU audio subsampler
(joeynmt/encoders.py:311-373). Static-shape masks replace the reference's
DataParallel "repad" hack (encoders.py:290-298) — under pjit all shards see
the same padded length by construction.
"""
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from joeys2t_tpu.models.modules import (
    Conv1dSubsampler,
    ConformerEncoderLayer,
    TransformerEncoderLayer,
    sinusoidal_pe,
)


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Bool validity mask (B, 1, max_len); True at valid frames."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None])[:, None, :]


class TransformerEncoder(nn.Module):
    """Transformer encoder with optional conv subsampling for S2T."""

    hidden_size: int = 512
    ff_size: int = 2048
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    emb_dropout: float = 0.1
    layer_norm_position: str = "pre"  # joeynmt/encoders.py:215 default
    activation: str = "relu"
    alpha: float = 1.0
    # S2T conv subsampler (joeynmt/encoders.py:231-239)
    subsample: bool = False
    in_channels: int = 80
    conv_channels: int = 512
    conv_kernel_sizes: Sequence[int] = (3, 3)
    pad_index: int = 1
    # final layer norm exists iff layer_norm == "pre" (joeynmt/encoders.py:223-226)
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # rematerialize layer activations in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(layers) less activation memory, enabling
    # larger batches / longer audio per chip. No reference equivalent.
    remat: bool = False
    # Megatron-style sequence parallelism: shard the residual stream along
    # the sequence dim over the `model` mesh axis (parallel/mesh.py
    # sp_constraint). Only meaningful with tensor parallelism enabled.
    sequence_parallel: bool = False
    # > 0 swaps each layer's FFN for a top-1 routed mixture of experts
    # (modules.py MoEFeedForward); shard experts over `model` for ep.
    num_experts: int = 0

    @property
    def output_size(self) -> int:
        return self.hidden_size

    def setup(self):
        # static_argnums counts the module as arg 0: (module, x, mask, det)
        layer_cls = (nn.remat(TransformerEncoderLayer, static_argnums=(3,))
                     if self.remat else TransformerEncoderLayer)
        self.layers = [
            layer_cls(
                size=self.hidden_size, ff_size=self.ff_size, num_heads=self.num_heads,
                dropout=self.dropout, alpha=self.alpha,
                layer_norm_position=self.layer_norm_position,
                activation=self.activation, dtype=self.dtype,
                attn_impl=self.attn_impl, num_experts=self.num_experts,
                name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.emb_dropout_layer = nn.Dropout(rate=self.emb_dropout)
        if self.layer_norm_position == "pre":
            self.final_layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                                 name="layer_norm")
        if self.subsample:
            self.subsampler = Conv1dSubsampler(
                in_channels=self.in_channels, mid_channels=self.conv_channels,
                out_channels=self.hidden_size, kernel_sizes=tuple(self.conv_kernel_sizes),
                dtype=self.dtype, name="subsampler")

    def __call__(
        self,
        src_embed: jnp.ndarray,  # (B, T, E): embedded tokens (MT) or fbank (S2T)
        src_length: jnp.ndarray,  # (B,)
        mask: Optional[jnp.ndarray] = None,  # (B, 1, T) bool; None for S2T
        src_prompt_embed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """Returns (output (B, T', H), None, mask (B, 1, T'))."""
        if self.subsample:
            src_embed, src_length = self.subsampler(src_embed, src_length)
        if mask is None:
            # reconstruct mask from (subsampled) lengths (joeynmt/encoders.py:270-271)
            mask = lengths_to_mask(src_length, src_embed.shape[1])

        pe = sinusoidal_pe(src_embed.shape[1], src_embed.shape[2]).astype(src_embed.dtype)
        x = src_embed + pe[None, :, :]
        if src_prompt_embed is not None:  # joeynmt/encoders.py:274-275
            x = x + src_prompt_embed
        x = self.emb_dropout_layer(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        # Pad the sequence ONCE to a lane-aligned multiple of 128 so the
        # per-layer flash-attention calls don't each re-pad K/V (those pads
        # measured 5.75ms/step of the B=128 flagship train step, ~96 pad
        # ops). Padded frames are masked keys — attention ignores them —
        # and the position-wise garbage they accumulate is sliced off below.
        # Audio path only (post-subsample S is large); MT sequences are
        # short and MoE routing must not see padded tokens.
        mask_out = mask
        s_orig = x.shape[1]
        pad_s = ((-s_orig) % 128
                 if (self.subsample and s_orig > 128 and self.num_experts == 0)
                 else 0)
        if pad_s:
            x = jnp.pad(x, ((0, 0), (0, pad_s), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_s)))

        for layer in self.layers:
            if self.sequence_parallel:
                from joeys2t_tpu.parallel.mesh import sp_constraint

                x = sp_constraint(x)
            # positional call: deterministic is a static argnum under remat
            x = layer(x, mask, deterministic)
        if self.layer_norm_position == "pre":
            x = self.final_layer_norm(x).astype(self.dtype)
        if pad_s:
            x = x[:, :s_orig]
        return x, None, mask_out

    # ------------------------------------------------- pipeline-parallel split
    def pre_layers(
        self,
        src_embed: jnp.ndarray,
        src_length: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        src_prompt_embed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``__call__``'s prologue up to (excluding) the layer stack. Used by
        the GPipe pipeline path (training._loss_and_metrics_pp), which runs
        the homogeneous layer stack via parallel.pp.pipeline_apply instead of
        the sequential loop. No lane padding here — microbatch splitting owns
        the shapes. Returns (x, mask)."""
        if self.subsample:
            src_embed, src_length = self.subsampler(src_embed, src_length)
        if mask is None:
            mask = lengths_to_mask(src_length, src_embed.shape[1])
        pe = sinusoidal_pe(src_embed.shape[1],
                           src_embed.shape[2]).astype(src_embed.dtype)
        x = src_embed + pe[None, :, :]
        if src_prompt_embed is not None:
            x = x + src_prompt_embed
        x = self.emb_dropout_layer(x, deterministic=deterministic)
        return x.astype(self.dtype), mask

    def post_layers(self, x: jnp.ndarray) -> jnp.ndarray:
        """``__call__``'s epilogue after the layer stack (final layer norm)."""
        if self.layer_norm_position == "pre":
            x = self.final_layer_norm(x).astype(self.dtype)
        return x


class ConformerEncoder(nn.Module):
    """Conformer encoder (joeynmt/encoders.py:376-445); always subsamples."""

    hidden_size: int = 512
    ff_size: int = 2048
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    emb_dropout: float = 0.1
    layer_norm_position: str = "pre"
    alpha: float = 1.0
    depthwise_conv_kernel_size: int = 31
    in_channels: int = 80
    conv_channels: int = 512
    conv_kernel_sizes: Sequence[int] = (3, 3)
    pad_index: int = 1
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False  # see TransformerEncoder.remat
    sequence_parallel: bool = False  # see TransformerEncoder.sequence_parallel
    conv_norm_type: str = "layernorm"  # "batchnorm" for converted reference ckpts
    # "reference" for converted checkpoints (bit-compatible with the torch
    # original, incl. its 1.5x-per-macaron-FF stream amplification);
    # "paper" (arXiv:2005.08100) for training from scratch — the reference
    # form diverges at depth (see modules.ConformerEncoderLayer.macaron)
    macaron: str = "reference"
    # LayerScale init (arXiv:2103.17239) for deep from-scratch stacks;
    # 0.0 = off (see modules.ConformerEncoderLayer.layerscale_init)
    layerscale_init: float = 0.0

    @property
    def output_size(self) -> int:
        return self.hidden_size

    def setup(self):
        layer_cls = (nn.remat(ConformerEncoderLayer, static_argnums=(3,))
                     if self.remat else ConformerEncoderLayer)
        self.layers = [
            layer_cls(
                size=self.hidden_size, ff_size=self.ff_size, num_heads=self.num_heads,
                dropout=self.dropout, alpha=self.alpha,
                layer_norm_position=self.layer_norm_position,
                depthwise_conv_kernel_size=self.depthwise_conv_kernel_size,
                dtype=self.dtype, attn_impl=self.attn_impl,
                conv_norm_type=self.conv_norm_type, macaron=self.macaron,
                layerscale_init=self.layerscale_init, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.linear = nn.Dense(self.hidden_size, dtype=self.dtype, name="linear")
        self.emb_dropout_layer = nn.Dropout(rate=self.emb_dropout)
        self.subsampler = Conv1dSubsampler(
            in_channels=self.in_channels, mid_channels=self.conv_channels,
            out_channels=self.hidden_size, kernel_sizes=tuple(self.conv_kernel_sizes),
            dtype=self.dtype, name="subsampler")

    def __call__(
        self,
        src_embed: jnp.ndarray,
        src_length: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        src_prompt_embed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        del src_prompt_embed  # S2T encoder has no prompts
        x, src_length = self.subsampler(src_embed, src_length)
        mask = lengths_to_mask(src_length, x.shape[1])

        pe = sinusoidal_pe(x.shape[1], x.shape[2]).astype(x.dtype)
        x = x + pe[None, :, :]
        x = self.linear(x)
        x = self.emb_dropout_layer(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        for layer in self.layers:
            if self.sequence_parallel:
                from joeys2t_tpu.parallel.mesh import sp_constraint

                x = sp_constraint(x)
            # positional call: deterministic is a static argnum under remat
            x = layer(x, mask, deterministic)
        return x, None, mask

    # ------------------------------------------------- pipeline-parallel split
    def pre_layers(
        self,
        src_embed: jnp.ndarray,
        src_length: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        src_prompt_embed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``__call__``'s prologue up to (excluding) the conformer layer
        stack, for the GPipe pipeline path (same contract as
        TransformerEncoder.pre_layers). Returns (x, mask)."""
        del src_prompt_embed  # S2T encoder has no prompts
        del mask  # always reconstructed from subsampled lengths
        x, src_length = self.subsampler(src_embed, src_length)
        mask = lengths_to_mask(src_length, x.shape[1])
        pe = sinusoidal_pe(x.shape[1], x.shape[2]).astype(x.dtype)
        x = x + pe[None, :, :]
        x = self.linear(x)
        x = self.emb_dropout_layer(x, deterministic=deterministic)
        return x.astype(self.dtype), mask

    def post_layers(self, x: jnp.ndarray) -> jnp.ndarray:
        """``__call__``'s epilogue: the conformer stack has no final norm
        (each layer ends with its own), so this is the identity."""
        return x
