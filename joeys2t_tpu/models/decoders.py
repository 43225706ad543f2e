# coding: utf-8
"""
Transformer decoder (TPU-native counterpart of joeynmt/decoders.py:498-635).

Two execution paths:
  - ``__call__``: full-sequence teacher-forced forward (training / scoring),
    with the CTC head over encoder states (joeynmt/decoders.py:560-565,622-623)
  - ``init_cache`` + ``decode_step``: KV-cached single-token decoding for
    search. The reference re-decodes the full prefix every step
    (joeynmt/search.py:240-253); here cross-attention K/V are projected once
    and self-attention K/V live in fixed-size ring buffers, giving O(L) decode
    instead of O(L^2) full-layer recompute.
"""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from joeys2t_tpu.models.modules import (
    TransformerDecoderLayer,
    sinusoidal_pe,
    subsequent_mask,
)


class TransformerDecoder(nn.Module):
    """Masked transformer decoder with optional CTC output layer."""

    num_layers: int = 4
    num_heads: int = 8
    hidden_size: int = 512
    ff_size: int = 2048
    dropout: float = 0.1
    emb_dropout: float = 0.1
    vocab_size: int = 1
    layer_norm_position: str = "post"  # joeynmt/decoders.py:543 default
    activation: str = "relu"
    alpha: float = 1.0
    # CTC head over encoder output (set for S2T; joeynmt/model.py:452-454)
    ctc_layer: bool = False
    # tied softmax: caller passes the embedding table to project with
    tied_softmax: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # opt-in int8 storage for the precomputed cross-attention K/V cache:
    # halves the dominant HBM traffic of the decode loop (the cross cache is
    # re-read every step); per-(head, channel) symmetric scales, dequantized
    # inside the Pallas decode-attention kernel (in VMEM — no extra HBM
    # round-trip). No reference equivalent (serving optimization).
    cache_cross_int8: bool = False
    # opt-in int8 self-attention ring buffer: per-(b, h, position) scales
    # written slot-by-slot as tokens are emitted.
    cache_self_int8: bool = False
    remat: bool = False  # jax.checkpoint per layer; see encoders.py
    sequence_parallel: bool = False  # see encoders.py / parallel/mesh.py

    @property
    def output_size(self) -> int:
        return self.vocab_size

    def setup(self):
        # static_argnums counts the module as arg 0:
        # (module, x, memory, src_mask, trg_mask, return_attention, det)
        layer_cls = (nn.remat(TransformerDecoderLayer, static_argnums=(5, 6))
                     if self.remat else TransformerDecoderLayer)
        self.layers = [
            layer_cls(
                size=self.hidden_size, ff_size=self.ff_size, num_heads=self.num_heads,
                dropout=self.dropout, alpha=self.alpha,
                layer_norm_position=self.layer_norm_position,
                activation=self.activation, dtype=self.dtype,
                attn_impl=self.attn_impl, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.emb_dropout_layer = nn.Dropout(rate=self.emb_dropout)
        if self.layer_norm_position == "pre":
            self.final_layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                                 name="layer_norm")
        if not self.tied_softmax:
            self.output_layer = nn.Dense(self.vocab_size, use_bias=False,
                                         dtype=self.dtype, name="output_layer")
        if self.ctc_layer:
            self.ctc_output_layer = nn.Dense(self.vocab_size, use_bias=False,
                                             dtype=self.dtype, name="ctc_output_layer")

    def _project_output(self, x: jnp.ndarray) -> jnp.ndarray:
        # With tied_softmax the parent model projects the hidden states onto the
        # shared embedding table (joeynmt/model.py:482-490); return hidden as-is.
        if self.tied_softmax:
            return x
        return self.output_layer(x)

    # -------------------------------------------------------------- full pass
    def __call__(
        self,
        trg_embed: jnp.ndarray,  # (B, T, E) embedded target inputs
        encoder_output: jnp.ndarray,  # (B, S, H)
        src_mask: Optional[jnp.ndarray],  # (B, 1, S) bool
        trg_mask: jnp.ndarray,  # (B, 1, T) bool padding mask
        trg_prompt_embed: Optional[jnp.ndarray] = None,
        return_attention: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], None, Optional[jnp.ndarray]]:
        """Returns (logits, hidden, cross_att, None, ctc_logits)
        (joeynmt/decoders.py:567-625)."""
        assert trg_mask is not None, "trg_mask required for Transformer"
        t = trg_embed.shape[1]
        pe = sinusoidal_pe(t, trg_embed.shape[2]).astype(trg_embed.dtype)
        x = trg_embed + pe[None, :, :]
        if trg_prompt_embed is not None:  # joeynmt/decoders.py:600-601
            x = x + trg_prompt_embed
        x = self.emb_dropout_layer(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        # (B, 1, T) & causal (1, T, T) -> (B, T, T) (joeynmt/decoders.py:604)
        full_trg_mask = trg_mask & subsequent_mask(t)

        att = None
        last = len(self.layers) - 1
        for i, layer in enumerate(self.layers):
            if self.sequence_parallel:
                from joeys2t_tpu.parallel.mesh import sp_constraint

                x = sp_constraint(x)
            # positional: return_attention/deterministic are static under remat
            x, layer_att = layer(
                x, encoder_output, src_mask, full_trg_mask,
                (return_attention and i == last), deterministic)
            if layer_att is not None:
                att = layer_att

        if self.layer_norm_position == "pre":
            x = self.final_layer_norm(x).astype(self.dtype)

        out = self._project_output(x)
        ctc_out = self.ctc_output_layer(encoder_output) if self.ctc_layer else None
        return out, x, att, None, ctc_out

    # --------------------------------------------- pipeline-parallel split
    def pre_layers(
        self,
        trg_embed: jnp.ndarray,
        trg_mask: jnp.ndarray,
        trg_prompt_embed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``__call__``'s prologue up to (excluding) the layer stack: PE +
        prompt embedding + embedding dropout + causal mask. The GPipe path
        (training._loss_and_metrics_pp) runs the stack via
        parallel.pp.pipeline_apply. Returns (x, full_trg_mask)."""
        assert trg_mask is not None, "trg_mask required for Transformer"
        t = trg_embed.shape[1]
        pe = sinusoidal_pe(t, trg_embed.shape[2]).astype(trg_embed.dtype)
        x = trg_embed + pe[None, :, :]
        if trg_prompt_embed is not None:
            x = x + trg_prompt_embed
        x = self.emb_dropout_layer(x, deterministic=deterministic)
        return x.astype(self.dtype), trg_mask & subsequent_mask(t)

    def post_layers(self, x: jnp.ndarray, encoder_output: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """``__call__``'s epilogue after the layer stack: final norm, output
        projection, CTC head. Returns (logits-or-hidden, ctc_logits)."""
        if self.layer_norm_position == "pre":
            x = self.final_layer_norm(x).astype(self.dtype)
        out = self._project_output(x)
        ctc_out = self.ctc_output_layer(encoder_output) if self.ctc_layer else None
        return out, ctc_out

    # ------------------------------------------------------------ decode path
    def init_cache(self, encoder_output: jnp.ndarray, max_len: int,
                   cache_dtype: Any = None,
                   src_valid: Optional[jnp.ndarray] = None,
                   ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Build the decode cache: precomputed cross K/V per layer + zeroed
        self-attention ring buffers of length ``max_len``.

        Layout is (B, H, S, D): per-head K/V slabs are contiguous, which the
        Pallas decode-attention kernel streams directly
        (ops/decode_attention.py) and the einsum fallback contracts without
        transposes.

        ``src_valid`` ((B, S) bool) marks real source positions; int8
        quantization scales exclude padded frames (garbage encoder outputs
        there would otherwise inflate the per-channel abs-max and waste
        precision on the positions that matter)."""
        cache_dtype = cache_dtype or self.dtype
        b = encoder_output.shape[0]
        head_size = self.hidden_size // self.num_heads
        cache = {}

        def quantize(x):  # (B, H, S, Dh) -> int8 values + (B, H, Dh) scales
            xf = x.astype(jnp.float32)
            xs = xf if src_valid is None else jnp.where(
                src_valid[:, None, :, None], xf, 0.0)
            scale = jnp.max(jnp.abs(xs), axis=2, keepdims=True) / 127.0 + 1e-8
            q = jnp.clip(jnp.round(xf / scale), -127, 127)
            return q.astype(jnp.int8), scale[:, :, 0, :].astype(jnp.float32)

        for i, layer in enumerate(self.layers):
            ck, cv = layer.precompute_cross_kv(encoder_output)  # (B, S, H, D)
            ck = jnp.swapaxes(ck, 1, 2)  # (B, H, S, D)
            cv = jnp.swapaxes(cv, 1, 2)
            if self.cache_cross_int8:
                ck_q, ck_s = quantize(ck)
                cv_q, cv_s = quantize(cv)
                cross = {"cross_k": ck_q, "cross_k_scale": ck_s,
                         "cross_v": cv_q, "cross_v_scale": cv_s}
            else:
                cross = {"cross_k": ck.astype(cache_dtype),
                         "cross_v": cv.astype(cache_dtype)}
            shape = (b, self.num_heads, max_len, head_size)
            if self.cache_self_int8:
                own = {
                    "self_k": jnp.zeros(shape, jnp.int8),
                    "self_v": jnp.zeros(shape, jnp.int8),
                    "self_k_scale": jnp.zeros(shape[:3], jnp.float32),
                    "self_v_scale": jnp.zeros(shape[:3], jnp.float32),
                }
            else:
                own = {
                    "self_k": jnp.zeros(shape, cache_dtype),
                    "self_v": jnp.zeros(shape, cache_dtype),
                }
            cache[f"layer_{i}"] = {**cross, **own}
        return cache

    def decode_step(
        self,
        trg_embed_t: jnp.ndarray,  # (B, 1, E) embedded current input token
        index: jnp.ndarray,  # scalar int32 position of this token
        cache: Dict[str, Dict[str, jnp.ndarray]],
        src_mask: Optional[jnp.ndarray],
        trg_prompt_embed_t: Optional[jnp.ndarray] = None,
        return_attention: bool = False,
        beam_k: int = 1,
        ancestry: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict, Optional[jnp.ndarray]]:
        """One decode step. Returns (logits (B, 1, V), new_cache, cross_att).

        ``beam_k``: see Seq2SeqModel.decode_step (beam-shared cross caches).
        ``ancestry``: lazy beam-reorder map (modules.step_self_ancestry)."""
        size = trg_embed_t.shape[2]
        max_len = cache["layer_0"]["self_k"].shape[2]  # (B, H, S_max, Dh)
        pe = sinusoidal_pe(max_len, size).astype(trg_embed_t.dtype)
        pe_t = jax.lax.dynamic_slice(pe, (index, 0), (1, size))
        x = trg_embed_t + pe_t[None, :, :]
        if trg_prompt_embed_t is not None:
            x = x + trg_prompt_embed_t
        x = x.astype(self.dtype)

        att = None
        last = len(self.layers) - 1
        new_cache = {}
        for i, layer in enumerate(self.layers):
            x, layer_cache, layer_att = layer.decode_step(
                x, cache[f"layer_{i}"], index, src_mask,
                return_attention=(return_attention and i == last),
                beam_k=beam_k, ancestry=ancestry)
            new_cache[f"layer_{i}"] = layer_cache
            if layer_att is not None:
                att = layer_att

        if self.layer_norm_position == "pre":
            x = self.final_layer_norm(x).astype(self.dtype)

        logits = self._project_output(x)
        return logits, new_cache, att
