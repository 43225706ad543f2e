# coding: utf-8
"""
Transformer / Conformer building blocks as flax.linen modules.

TPU-native redesign of joeynmt/transformer_layers.py:17-565. Differences from
the reference are architectural, not behavioral:
  - pure functional modules (params as pytrees), jit/vmap/pjit friendly
  - explicit KV-cache decode path (`step_self` / `step_cross`) instead of the
    reference's full-prefix re-decode per step (joeynmt/search.py:240-253)
  - softmax/layernorm accumulate in float32, matmuls run in the configured
    compute dtype (bfloat16 on TPU) feeding the MXU
Math contracts kept: q scaled by 1/sqrt(head_dim), additive -inf masking,
residual scale `alpha` (DeepNet), pre/post layer-norm placement, LayerNorm
eps=1e-6, sinusoidal positional encoding (interleaved sin/cos, max_len 5000).
"""
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Large negative value used for masking attention logits. Finite (instead of
# the reference's -inf) so fully-masked rows yield uniform-but-ignored softmax
# outputs rather than NaNs that would poison gradients through XLA fusions.
NEG_INF = -1e9


def build_activation(activation: str = "relu") -> Callable:
    """Activation map (joeynmt/builders.py:24-41)."""
    if activation == "relu":
        return nn.relu
    if activation == "gelu":
        return nn.gelu
    if activation == "tanh":
        return jnp.tanh
    if activation == "swish":
        return nn.silu
    raise ValueError(
        "Invalid activation function. Valid options: 'relu', 'gelu', 'tanh', 'swish'.")


def sinusoidal_pe(length: int, size: int) -> jnp.ndarray:
    """Sinusoidal positional encoding table, shape (length, size).

    Interleaved sin (even dims) / cos (odd dims), wavelengths 10000^(2i/d)
    (joeynmt/transformer_layers.py:181-199).
    """
    if size % 2 != 0:
        raise ValueError(
            f"Cannot use sin/cos positional encoding with odd dim (got dim={size})")
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, size, 2, dtype=jnp.float32) * -(math.log(10000.0) / size))
    pe = jnp.zeros((length, size), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class MultiHeadedAttention(nn.Module):
    """Multi-head attention (joeynmt/transformer_layers.py:17-115).

    Exposes three extra entry points for fast autoregressive decoding:
      - ``project_kv``: precompute per-head K/V (for cross-attention caching)
      - ``step_self``: single-step self-attention with a KV ring buffer
      - ``step_cross``: single-step cross-attention against cached K/V
    """

    num_heads: int
    size: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # 'auto': first-party Pallas flash kernel on TPU for eligible shapes
    # (deterministic, key-padding mask only); 'xla': einsum path; 'flash': force
    attn_impl: str = "auto"

    def setup(self):
        assert self.size % self.num_heads == 0
        self.head_size = self.size // self.num_heads
        dense = lambda name: nn.Dense(self.size, dtype=self.dtype, name=name)
        self.k_layer = dense("k_layer")
        self.v_layer = dense("v_layer")
        self.q_layer = dense("q_layer")
        self.output_layer = dense("output_layer")
        self.attn_dropout = nn.Dropout(rate=self.dropout)

    # ------------------------------------------------------------------ utils
    def _split_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, size) -> (B, T, H, Dh)"""
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.head_size)

    def _merge_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, Dh) -> (B, T, size)"""
        b, t, _, _ = x.shape
        return x.reshape(b, t, self.size)

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-head key/value projections, shape (B, T, H, Dh) each."""
        return self._split_heads(self.k_layer(x)), self._split_heads(self.v_layer(x))

    def _attend(
        self,
        q: jnp.ndarray,  # (B, Tq, H, Dh)
        k: jnp.ndarray,  # (B, Tk, H, Dh)
        v: jnp.ndarray,  # (B, Tk, H, Dh)
        mask: Optional[jnp.ndarray],  # bool, broadcastable to (B, H, Tq, Tk)
        deterministic: bool,
        return_weights: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        q = q / math.sqrt(self.head_size)
        # (B, H, Tq, Tk) — contraction on MXU, accumulate fp32
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)  # fp32
        probs = self.attn_dropout(weights.astype(self.dtype), deterministic=deterministic)
        context = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = self.output_layer(self._merge_heads(context))
        if return_weights:
            # average over heads (joeynmt/transformer_layers.py:109-114)
            return out, jnp.mean(weights, axis=1)
        return out, None

    # ------------------------------------------------------------ full-length
    def __call__(
        self,
        k: jnp.ndarray,
        v: jnp.ndarray,
        q: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        return_weights: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Full-sequence attention.

        :param mask: bool, (B, 1, Tk) key mask or (B, Tq, Tk) full mask
        """
        if self._use_flash(q, k, mask, deterministic, return_weights):
            # FLAT path: the kernel takes the Dense outputs (B, T, E)
            # directly — heads are 128-aligned column bands sliced inside
            # VMEM, so no head-split reshape (and no tile-change copy)
            # appears in the graph (r3 profile: ~0.1ms x 3 operands x layer)
            from joeys2t_tpu.ops.flash_attention import (mha_flash_flat,
                                                         mha_flash_sharded)

            q_f = self.q_layer(q)
            k_f = self.k_layer(k)
            v_f = self.v_layer(k)
            key_valid = None if mask is None else mask[:, 0, :]
            dropout_rate, seed = 0.0, None
            if not deterministic and self.dropout > 0:
                # in-kernel attention dropout; seed drawn from the flax rng
                dropout_rate = self.dropout
                key = self.make_rng("dropout")
                seed = jax.random.key_data(key).ravel()[0].astype(jnp.int32)
            sm = 1.0 / math.sqrt(self.head_size)
            context = None
            if jax.device_count() > 1 and self.attn_impl != "flash":
                # GSPMD: shard_map the kernel over the installed mesh.
                # Explicit attn_impl='flash' bypasses this — it is the
                # documented override for calling attention inside a
                # user-managed shard_map, where nesting another shard_map
                # over the same mesh axes would fail at trace time.
                context = mha_flash_sharded(q_f, k_f, v_f, self.num_heads,
                                            key_valid, sm,
                                            dropout_rate=dropout_rate,
                                            seed=seed)
            if context is None:
                context = mha_flash_flat(q_f, k_f, v_f, self.num_heads,
                                         key_valid, sm,
                                         dropout_rate=dropout_rate, seed=seed)
            out = self.output_layer(context.astype(self.dtype))
            return out, None

        k_h, v_h = self.project_kv(k)
        q_h = self._split_heads(self.q_layer(q))

        if mask is not None:
            mask = mask[:, None, :, :]  # add head dim -> (B, 1, 1|Tq, Tk)
        return self._attend(q_h, k_h, v_h, mask, deterministic, return_weights)

    def _use_flash(self, q, k, mask, deterministic, return_weights) -> bool:
        """q/k are the raw (B, T, size) inputs (pre-projection)."""
        if self.attn_impl == "xla" or return_weights:
            return False
        if mask is not None and not (mask.ndim == 3 and mask.shape[1] == 1):
            return False  # causal/full masks take the einsum path
        from joeys2t_tpu.ops.flash_attention import supported

        if not supported(q.shape[1], k.shape[1], self.head_size,
                         self.dtype, num_heads=self.num_heads):
            return False
        if self.attn_impl == "flash":
            return True
        import jax

        if jax.default_backend() != "tpu":
            return False
        if jax.device_count() == 1:
            return True
        # 'auto' under GSPMD multi-chip sharding: a pallas_call has no SPMD
        # partitioning rule, so flash stays on only when an installed mesh
        # lets us shard_map it explicitly (batch over data, heads over
        # model) — see ops.flash_attention.mha_flash_sharded. Otherwise the
        # einsum path shards cleanly. Explicit attn_impl="flash" overrides
        # (e.g. inside a user-managed shard_map).
        from joeys2t_tpu.ops.flash_attention import _flash_shard_specs
        from joeys2t_tpu.parallel.mesh import get_default_mesh

        ctx = get_default_mesh()
        return ctx is not None and _flash_shard_specs(
            ctx.mesh, q.shape[0], self.num_heads) is not None

    # ------------------------------------------------------------- decode ops
    def _use_decode_kernel(self) -> bool:
        """Pallas decode-attention kernel gate (ops/decode_attention.py).

        Opt-in via attn_impl='decode_kernel': in isolated marginal-loop
        benchmarks the kernel streams the caches faster than XLA's einsums
        (0.25ms vs 0.41ms per cross layer at B=256), but inside the decode
        while_loop it measured ~40% slower end-to-end (RTFx 3720 vs 6527;
        even restricted to the loop-INVARIANT cross caches it reached only
        4380) — the custom-call boundary itself breaks XLA's loop
        scheduling/fusion, independent of carried-buffer copies.
        The default einsum path on the (B, H, S, D) layout is the fast one."""
        if self.attn_impl != "decode_kernel":
            return False
        import jax

        return jax.default_backend() == "tpu" and jax.device_count() == 1

    def _decode_einsum(self, q_h, k, v, bias, k_scale, v_scale,
                       scale_layout=None, return_weights=False):
        """Fallback decode attention on (B, H, S, D) caches with optional
        int8 dequant. q_h: (B, 1, H, D); bias: (B, S) additive."""
        # int8 caches: never materialize a dequantized K/V copy — fold the
        # scales into the small per-step tensors instead (q / scores for K,
        # weights / context for V), leaving only the int8->dtype convert on
        # the cache read itself.
        q_h = q_h / math.sqrt(self.head_size)
        if k.dtype == jnp.int8 and scale_layout != "position":
            # per-channel (B, H, D) scale runs along the contracted dim of
            # the score einsum — exact to fold into q
            q_h = q_h * k_scale[:, None, :, :].astype(q_h.dtype)
        scores = jnp.einsum("bqhd,bhkd->bhqk", q_h, k.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        if k.dtype == jnp.int8 and scale_layout == "position":
            scores = scores * k_scale[:, :, None, :]  # (B, H, S) per-position
        scores = scores + bias[:, None, None, :]
        probs = jax.nn.softmax(scores, axis=-1)  # f32, rows sum to 1
        weights = probs
        if v.dtype == jnp.int8 and scale_layout == "position":
            # fold the per-position V scale into the (tiny) weights tensor;
            # `probs` stays un-scaled so returned attention maps remain
            # probabilities
            weights = weights * v_scale[:, :, None, :]
        ctx = jnp.einsum("bhqk,bhkd->bqhd", weights.astype(self.dtype),
                         v.astype(self.dtype))
        if v.dtype == jnp.int8 and scale_layout != "position":
            ctx = ctx * v_scale[:, None, :, :].astype(ctx.dtype)
        out = self.output_layer(self._merge_heads(ctx))
        if return_weights:
            return out, jnp.mean(probs, axis=1)
        return out, None

    def step_self(
        self,
        q: jnp.ndarray,  # (B, 1, size)
        cache_k: jnp.ndarray,  # (B, H, S_max, Dh), bf16/f32 or int8
        cache_v: jnp.ndarray,
        index: jnp.ndarray,  # scalar int32: current position
        k_scale: Optional[jnp.ndarray] = None,  # (B, H, S_max) when int8
        v_scale: Optional[jnp.ndarray] = None,
    ):
        """One self-attention decode step with KV ring-buffer update.

        Returns (output (B, 1, size), new_k, new_v, new_k_scale, new_v_scale).
        """
        from joeys2t_tpu.ops.decode_attention import (decode_attention,
                                                      quantize_per_position)

        k_h, v_h = self.project_kv(q)  # (B, 1, H, Dh)
        k_h = jnp.swapaxes(k_h, 1, 2)  # (B, H, 1, Dh)
        v_h = jnp.swapaxes(v_h, 1, 2)
        if cache_k.dtype == jnp.int8:
            k_q, k_s = quantize_per_position(k_h)
            v_q, v_s = quantize_per_position(v_h)
            cache_k = jax.lax.dynamic_update_slice(cache_k, k_q,
                                                   (0, 0, index, 0))
            cache_v = jax.lax.dynamic_update_slice(cache_v, v_q,
                                                   (0, 0, index, 0))
            k_scale = jax.lax.dynamic_update_slice(k_scale, k_s, (0, 0, index))
            v_scale = jax.lax.dynamic_update_slice(v_scale, v_s, (0, 0, index))
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_h.astype(cache_k.dtype), (0, 0, index, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_h.astype(cache_v.dtype), (0, 0, index, 0))

        q_h = self._split_heads(self.q_layer(q))  # (B, 1, H, Dh)
        b = q_h.shape[0]
        s_max = cache_k.shape[2]
        valid = jnp.arange(s_max) <= index
        bias = jnp.broadcast_to(
            jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, :],
            (b, s_max))
        if self._use_decode_kernel():
            ctx = decode_attention(
                q_h[:, 0].astype(self.dtype), cache_k, cache_v, bias,
                k_scale, v_scale, sm_scale=1.0 / math.sqrt(self.head_size),
                scale_layout=None if k_scale is None else "position")
            out = self.output_layer(ctx.reshape(b, 1, -1).astype(self.dtype))
        else:
            out, _ = self._decode_einsum(q_h, cache_k, cache_v, bias,
                                         k_scale, v_scale,
                                         scale_layout="position")
        return out, cache_k, cache_v, k_scale, v_scale

    def step_self_ancestry(
        self,
        q: jnp.ndarray,  # (B*K, 1, size)
        cache_k: jnp.ndarray,  # (B*K, H, S_max, Dh) bf16/f32 or int8
        cache_v: jnp.ndarray,
        index: jnp.ndarray,  # scalar int32 current position
        ancestry: jnp.ndarray,  # (B, K, S_max) int32 parent rows in [0, K)
        k_scale: Optional[jnp.ndarray] = None,  # (B*K, H, S_max) when int8
        v_scale: Optional[jnp.ndarray] = None,
    ):
        """Beam self-attention WITHOUT the physical per-step cache reorder.

        The classic formulation permutes the (B*K, H, S, D) ring buffers by
        the selected parent rows every step — measured at 38% of beam wall
        time (docs/benchmarks_s2t.md), and it is a pure HBM copy: read+write
        of both buffers on top of the attention's own read. Here rows stay
        where they were written and a (B, K, S) ancestry map says which
        physical row holds each position of each beam's history. Scores are
        computed against ALL K stored rows — the matvec is HBM-bound on the
        cache read, so the K x extra MXU flops are free — and the ancestry
        select happens on the tiny (B, K, K, H, S) score tensor:

          S_all[b,k,j,h,s] = q[b,k,h,:] . K[b,j,h,s,:]
          scores[b,k,h,s]  = S_all[b,k,anc[b,k,s],h,s]      (one-hot sum)
          ctx[b,k,h,:]     = sum_s p[b,k,h,s] V[b,anc[b,k,s],h,s,:]

        Per step this reads the caches once (no write-back), vs read + full
        read/write for the physical reorder — 3x less self-cache traffic.
        Exact same math as reorder-then-attend. Returns (out, new_k, new_v,
        new_k_scale, new_v_scale); the caller updates the ancestry map after
        top-k selection.

        int8 ring buffers compose with the ancestry map because their
        per-position scales are stored per PHYSICAL row: both the int8
        values and their scales are read through the same ``anc[b,k,s]``
        index, so scales travel with the rows they quantized. The K-scale
        folds into ``s_all`` (per contracted position) and the V-scale into
        the tiny masked-probability tensor, matching ``_decode_einsum``'s
        "position" layout — no dequantized cache copy is materialized.
        """
        bk, h_heads, s_max, dh = cache_k.shape
        kb = ancestry.shape[1]
        b = bk // kb
        is_int8 = cache_k.dtype == jnp.int8

        k_h, v_h = self.project_kv(q)  # (B*K, 1, H, Dh)
        k_h = jnp.swapaxes(k_h, 1, 2)
        v_h = jnp.swapaxes(v_h, 1, 2)
        if is_int8:
            from joeys2t_tpu.ops.decode_attention import quantize_per_position
            k_q, k_s = quantize_per_position(k_h)
            v_q, v_s = quantize_per_position(v_h)
            cache_k = jax.lax.dynamic_update_slice(cache_k, k_q,
                                                   (0, 0, index, 0))
            cache_v = jax.lax.dynamic_update_slice(cache_v, v_q,
                                                   (0, 0, index, 0))
            k_scale = jax.lax.dynamic_update_slice(k_scale, k_s, (0, 0, index))
            v_scale = jax.lax.dynamic_update_slice(v_scale, v_s, (0, 0, index))
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_h.astype(cache_k.dtype), (0, 0, index, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_h.astype(cache_v.dtype), (0, 0, index, 0))

        q_h = self._split_heads(self.q_layer(q))  # (B*K, 1, H, Dh)
        qk = (q_h[:, 0].reshape(b, kb, self.num_heads, self.head_size)
              / math.sqrt(self.head_size))
        ck = cache_k.reshape(b, kb, self.num_heads, s_max, dh)
        cv = cache_v.reshape(b, kb, self.num_heads, s_max, dh)

        s_all = jnp.einsum("bkhd,bjhsd->bkjhs", qk.astype(self.dtype),
                           ck.astype(self.dtype),
                           preferred_element_type=jnp.float32)
        if is_int8:
            # (B*K, H, S) -> (B, 1[k], J, H, S): per-position K scale along
            # the contracted dim, indexed by the same physical row j
            s_all = s_all * k_scale.reshape(b, kb, h_heads, s_max)[:, None]
        onehot = (ancestry[:, :, None, :]
                  == jnp.arange(kb, dtype=ancestry.dtype)[None, None, :, None]
                  )  # (B, K, J, S)
        scores = jnp.sum(s_all * onehot[:, :, :, None, :], axis=2)  # (B,K,H,S)
        valid = jnp.arange(s_max) <= index
        scores = jnp.where(valid[None, None, None, :], scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)  # (B, K, H, S) f32
        p_masked = p[:, :, None, :, :] * onehot[:, :, :, None, :]  # (B,K,J,H,S)
        if is_int8:
            p_masked = p_masked * v_scale.reshape(b, kb, h_heads,
                                                  s_max)[:, None]
        ctx = jnp.einsum("bkjhs,bjhsd->bkhd", p_masked.astype(self.dtype),
                         cv.astype(self.dtype))
        out = self.output_layer(
            ctx.reshape(bk, 1, self.size).astype(self.dtype))
        return out, cache_k, cache_v, k_scale, v_scale

    def step_cross(
        self,
        q: jnp.ndarray,  # (B*K, 1, size)
        k_h: jnp.ndarray,  # precomputed (B, H, S, Dh), bf16/f32 or int8
        v_h: jnp.ndarray,
        mask: Optional[jnp.ndarray],  # (B, 1, S) bool
        k_scale: Optional[jnp.ndarray] = None,  # (B, H, Dh) when int8
        v_scale: Optional[jnp.ndarray] = None,
        return_weights: bool = False,
        beam_k: int = 1,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """One cross-attention decode step against precomputed K/V.

        With ``beam_k > 1`` the queries carry B*K rows but K/V stay at B:
        each batch element's beams share its (never-rewritten) cross cache,
        reading it from HBM once instead of K times per step."""
        from joeys2t_tpu.ops.decode_attention import decode_attention

        q_h = self._split_heads(self.q_layer(q))  # (B*K, 1, H, Dh)
        b, s = k_h.shape[0], k_h.shape[2]
        if mask is None:
            bias = jnp.zeros((b, s), jnp.float32)
        else:
            bias = jnp.where(mask[:, 0, :], 0.0, NEG_INF).astype(jnp.float32)

        if beam_k > 1:
            assert q_h.shape[0] == b * beam_k, (q_h.shape, b, beam_k)
            assert not return_weights  # beam search never returns attention
            qk = (q_h[:, 0].reshape(b, beam_k, self.num_heads, self.head_size)
                  / math.sqrt(self.head_size))
            if k_h.dtype == jnp.int8:
                # fold the per-channel (B, H, D) scales into q / context so no
                # dequantized K/V copy is ever materialized — the whole point
                # of int8 here is saving cache HBM traffic in the beam case
                qk = qk * k_scale[:, None, :, :].astype(qk.dtype)
            scores = jnp.einsum("bkhd,bhsd->bkhs", qk, k_h.astype(self.dtype),
                                preferred_element_type=jnp.float32)
            scores = scores + bias[:, None, None, :]
            weights = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bkhs,bhsd->bkhd", weights.astype(self.dtype),
                             v_h.astype(self.dtype))
            if v_h.dtype == jnp.int8:
                ctx = ctx * v_scale[:, None, :, :].astype(ctx.dtype)
            out = self.output_layer(
                ctx.reshape(b * beam_k, 1, self.size).astype(self.dtype))
            return out, None

        if self._use_decode_kernel() and not return_weights:
            ctx = decode_attention(
                q_h[:, 0].astype(self.dtype), k_h, v_h, bias,
                k_scale, v_scale, sm_scale=1.0 / math.sqrt(self.head_size),
                scale_layout=None if k_scale is None else "channel")
            return self.output_layer(
                ctx.reshape(b, 1, -1).astype(self.dtype)), None
        return self._decode_einsum(q_h, k_h, v_h, bias, k_scale, v_scale,
                                   scale_layout="channel",
                                   return_weights=return_weights)


class PositionwiseFeedForward(nn.Module):
    """Position-wise feed-forward layer (joeynmt/transformer_layers.py:118-168)."""

    input_size: int
    ff_size: int
    dropout: float = 0.1
    alpha: float = 1.0
    layer_norm_position: str = "post"
    activation: str = "relu"
    dtype: Any = jnp.float32

    def setup(self):
        assert self.layer_norm_position in {"pre", "post"}
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")
        self.dense1 = nn.Dense(self.ff_size, dtype=self.dtype, name="dense1")
        self.dense2 = nn.Dense(self.input_size, dtype=self.dtype, name="dense2")
        self.dropout1 = nn.Dropout(rate=self.dropout)
        self.dropout2 = nn.Dropout(rate=self.dropout)
        self.act = build_activation(self.activation)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        if self.layer_norm_position == "pre":
            x = self.layer_norm(x).astype(self.dtype)
        x = self.dense1(x)
        x = self.act(x)
        x = self.dropout1(x, deterministic=deterministic)
        x = self.dense2(x)
        x = self.dropout2(x, deterministic=deterministic)
        x = x + self.alpha * residual
        if self.layer_norm_position == "post":
            x = self.layer_norm(x).astype(self.dtype)
        return x


class MoEFeedForward(nn.Module):
    """Mixture-of-experts position-wise FFN (switch-style top-1 routing).

    Capability beyond the reference (which has no MoE): E expert FFNs with
    a learned router; each token is processed by its argmax expert, scaled
    by the router probability (Switch Transformer, arXiv:2101.03961). The
    expert weight tensors carry a leading expert dim, so sharding them over
    the `model` mesh axis (parallel/tp.py) yields expert parallelism: each
    device computes its local experts, and the expert-contracting einsum
    turns into a GSPMD all-reduce. Dense dispatch (every expert sees every
    token, masked) — compiler-friendly static shapes instead of sort/scatter.
    Residual/LayerNorm placement mirrors PositionwiseFeedForward."""

    input_size: int
    ff_size: int
    num_experts: int
    dropout: float = 0.1
    alpha: float = 1.0
    layer_norm_position: str = "post"
    activation: str = "relu"
    dtype: Any = jnp.float32

    def setup(self):
        assert self.layer_norm_position in {"pre", "post"}
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                       name="layer_norm")
        self.router = nn.Dense(self.num_experts, use_bias=False,
                               dtype=jnp.float32, name="router")
        init = nn.initializers.lecun_normal()
        e, h, f = self.num_experts, self.input_size, self.ff_size
        self.w1 = self.param("w1", init, (e, h, f))
        self.b1 = self.param("b1", nn.initializers.zeros, (e, f))
        self.w2 = self.param("w2", init, (e, f, h))
        self.b2 = self.param("b2", nn.initializers.zeros, (e, h))
        self.dropout1 = nn.Dropout(rate=self.dropout)
        self.dropout2 = nn.Dropout(rate=self.dropout)
        self.act = build_activation(self.activation)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 token_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        if self.layer_norm_position == "pre":
            x = self.layer_norm(x).astype(self.dtype)
        gates = jax.nn.softmax(self.router(x.astype(jnp.float32)), axis=-1)
        top1 = jnp.argmax(gates, axis=-1)  # (B, T)
        one_hot = jax.nn.one_hot(top1, self.num_experts, dtype=jnp.float32)
        # Switch Transformer load-balance auxiliary loss (arXiv:2101.03961
        # eq. 4): E * sum_e(dispatch-fraction_e * mean-router-prob_e) over
        # REAL tokens only (``token_valid`` (B, T) masks padding — pad
        # routing must not skew the dispatch statistics). Minimised at
        # uniform routing (value 1.0); collected via sow so it is a no-op
        # unless the caller applies with mutable=["aux_loss"] (the train
        # step folds it into the objective).
        if token_valid is not None:
            w = token_valid.astype(jnp.float32)[..., None]  # (B, T, 1)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            f = jnp.sum(one_hot * w, axis=(0, 1)) / denom
            p = jnp.sum(gates * w, axis=(0, 1)) / denom
        else:
            f = jnp.mean(one_hot, axis=(0, 1))   # fraction routed per expert
            p = jnp.mean(gates, axis=(0, 1))     # mean router prob per expert
        self.sow("aux_loss", "moe_load_balance",
                 self.num_experts * jnp.sum(f * p))
        # (B, T, E): router prob of the selected expert, zero elsewhere
        dispatch = (one_hot
                    * jnp.max(gates, axis=-1, keepdims=True)).astype(self.dtype)

        w1 = self.w1.astype(self.dtype)
        w2 = self.w2.astype(self.dtype)
        h = jnp.einsum("bth,ehf->btef", x, w1) + self.b1.astype(self.dtype)
        h = self.act(h)
        h = self.dropout1(h, deterministic=deterministic)
        y = jnp.einsum("btef,efh->bteh", h, w2) + self.b2.astype(self.dtype)
        # contract the expert dim -> with expert-sharded weights GSPMD
        # inserts the expert-parallel all-reduce here
        y = jnp.einsum("bteh,bte->bth", y, dispatch)
        y = self.dropout2(y, deterministic=deterministic)
        y = y + self.alpha * residual
        if self.layer_norm_position == "post":
            y = self.layer_norm(y).astype(self.dtype)
        return y


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN (joeynmt/transformer_layers.py:216-289).

    ``num_experts > 0`` swaps the FFN for a MoEFeedForward (top-1 routed)."""

    size: int
    ff_size: int
    num_heads: int
    dropout: float = 0.1
    alpha: float = 1.0
    layer_norm_position: str = "post"
    activation: str = "relu"
    dtype: Any = jnp.float32
    num_experts: int = 0
    attn_impl: str = "auto"

    def setup(self):
        assert self.layer_norm_position in {"pre", "post"}
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")
        self.src_src_att = MultiHeadedAttention(
            num_heads=self.num_heads, size=self.size, dropout=self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, name="src_src_att")
        if self.num_experts > 0:
            self.feed_forward = MoEFeedForward(
                input_size=self.size, ff_size=self.ff_size,
                num_experts=self.num_experts, dropout=self.dropout,
                alpha=self.alpha, layer_norm_position=self.layer_norm_position,
                activation=self.activation, dtype=self.dtype,
                name="feed_forward")
        else:
            self.feed_forward = PositionwiseFeedForward(
                input_size=self.size, ff_size=self.ff_size, dropout=self.dropout,
                alpha=self.alpha, layer_norm_position=self.layer_norm_position,
                activation=self.activation, dtype=self.dtype, name="feed_forward")
        self.dropout_layer = nn.Dropout(rate=self.dropout)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        residual = x
        if self.layer_norm_position == "pre":
            x = self.layer_norm(x).astype(self.dtype)
        x, _ = self.src_src_att(x, x, x, mask, deterministic=deterministic)
        x = self.dropout_layer(x, deterministic=deterministic) + self.alpha * residual
        if self.layer_norm_position == "post":
            x = self.layer_norm(x).astype(self.dtype)
        if self.num_experts > 0:
            # MoE routing statistics must not count padding tokens
            token_valid = None if mask is None else mask[:, 0, :]
            return self.feed_forward(x, deterministic=deterministic,
                                     token_valid=token_valid)
        return self.feed_forward(x, deterministic=deterministic)


class TransformerDecoderLayer(nn.Module):
    """Masked self-attention + cross-attention + FFN
    (joeynmt/transformer_layers.py:292-407)."""

    size: int
    ff_size: int
    num_heads: int
    dropout: float = 0.1
    alpha: float = 1.0
    layer_norm_position: str = "post"
    activation: str = "relu"
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        assert self.layer_norm_position in {"pre", "post"}
        self.trg_trg_att = MultiHeadedAttention(
            num_heads=self.num_heads, size=self.size, dropout=self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, name="trg_trg_att")
        self.src_trg_att = MultiHeadedAttention(
            num_heads=self.num_heads, size=self.size, dropout=self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, name="src_trg_att")
        self.feed_forward = PositionwiseFeedForward(
            input_size=self.size, ff_size=self.ff_size, dropout=self.dropout,
            alpha=self.alpha, layer_norm_position=self.layer_norm_position,
            activation=self.activation, dtype=self.dtype, name="feed_forward")
        self.x_layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="x_layer_norm")
        self.dec_layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="dec_layer_norm")
        self.dropout_layer = nn.Dropout(rate=self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        src_mask: Optional[jnp.ndarray],
        trg_mask: Optional[jnp.ndarray],
        return_attention: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        # 1. target-target self-attention
        residual = x
        if self.layer_norm_position == "pre":
            x = self.x_layer_norm(x).astype(self.dtype)
        h1, _ = self.trg_trg_att(x, x, x, mask=trg_mask, deterministic=deterministic)
        h1 = self.dropout_layer(h1, deterministic=deterministic) + self.alpha * residual
        if self.layer_norm_position == "post":
            h1 = self.x_layer_norm(h1).astype(self.dtype)

        # 2. source-target cross-attention
        h1_residual = h1
        if self.layer_norm_position == "pre":
            h1 = self.dec_layer_norm(h1).astype(self.dtype)
        h2, att = self.src_trg_att(memory, memory, h1, mask=src_mask,
                                   return_weights=return_attention,
                                   deterministic=deterministic)
        h2 = self.dropout_layer(h2, deterministic=deterministic) + self.alpha * h1_residual
        if self.layer_norm_position == "post":
            h2 = self.dec_layer_norm(h2).astype(self.dtype)

        out = self.feed_forward(h2, deterministic=deterministic)
        return out, att

    # ------------------------------------------------------------- decode ops
    def precompute_cross_kv(self, memory: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project encoder memory to per-head cross-attention K/V once."""
        return self.src_trg_att.project_kv(memory)

    def decode_step(
        self,
        x: jnp.ndarray,  # (B, 1, size)
        cache: dict,  # {'self_k','self_v','cross_k','cross_v'}
        index: jnp.ndarray,
        src_mask: Optional[jnp.ndarray],
        return_attention: bool = False,
        beam_k: int = 1,
        ancestry: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict, Optional[jnp.ndarray]]:
        """Single decode step with cached self/cross K/V.

        ``beam_k > 1``: x and the self caches carry B*K rows while the
        cross caches/src_mask stay at B (beam-shared cross attention).
        ``ancestry`` ((B, K, S) parent-row map): self-attention resolves
        beam reordering lazily instead of the caller physically permuting
        the ring buffers (step_self_ancestry)."""
        residual = x
        if self.layer_norm_position == "pre":
            x = self.x_layer_norm(x).astype(self.dtype)
        if ancestry is not None:
            h1, new_k, new_v, new_ks, new_vs = \
                self.trg_trg_att.step_self_ancestry(
                    x, cache["self_k"], cache["self_v"], index, ancestry,
                    k_scale=cache.get("self_k_scale"),
                    v_scale=cache.get("self_v_scale"))
        else:
            h1, new_k, new_v, new_ks, new_vs = self.trg_trg_att.step_self(
                x, cache["self_k"], cache["self_v"], index,
                k_scale=cache.get("self_k_scale"),
                v_scale=cache.get("self_v_scale"))
        cache = {**cache, "self_k": new_k, "self_v": new_v}
        if new_ks is not None:
            cache.update(self_k_scale=new_ks, self_v_scale=new_vs)
        h1 = h1 + self.alpha * residual
        if self.layer_norm_position == "post":
            h1 = self.x_layer_norm(h1).astype(self.dtype)

        h1_residual = h1
        if self.layer_norm_position == "pre":
            h1 = self.dec_layer_norm(h1).astype(self.dtype)
        h2, att = self.src_trg_att.step_cross(
            h1, cache["cross_k"], cache["cross_v"], src_mask,
            k_scale=cache.get("cross_k_scale"),
            v_scale=cache.get("cross_v_scale"),
            return_weights=return_attention, beam_k=beam_k)
        h2 = h2 + self.alpha * h1_residual
        if self.layer_norm_position == "post":
            h2 = self.dec_layer_norm(h2).astype(self.dtype)

        out = self.feed_forward(h2, deterministic=True)
        return out, cache, att


class ConvolutionModule(nn.Module):
    """Conformer convolution block (joeynmt/transformer_layers.py:410-475).

    ``norm_type`` selects the post-depthwise-conv normalization:

    - "layernorm" (default, TPU-first choice for fresh training): batch
      statistics are hostile to pjit sharding and padded batches; layer
      statistics keep the module shard-agnostic. Capability-equivalent to
      the reference, not bit-identical.
    - "batchnorm": inference-form BatchNorm1d with stored running stats
      ((x - mean) / sqrt(var + 1e-5) * scale + bias, torch BN.eval()
      semantics) so converted reference conformer checkpoints
      (joeynmt/transformer_layers.py:448 nn.BatchNorm1d) reproduce their
      published outputs exactly. Stats stay frozen during fine-tuning —
      there is no cross-batch statistics update (by design: shard-
      agnostic); train new models with "layernorm" instead.
    """

    hidden_size: int
    channels: int
    depthwise_kernel_size: int
    dropout: float
    dtype: Any = jnp.float32
    norm_type: str = "layernorm"

    def setup(self):
        assert (self.depthwise_kernel_size - 1) % 2 == 0, \
            "kernel_size should be a odd number for 'SAME' padding"
        assert self.norm_type in {"layernorm", "batchnorm"}, self.norm_type
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")
        self.pointwise_conv1 = nn.Dense(2 * self.channels, dtype=self.dtype,
                                        name="pointwise_conv1")
        self.depthwise_conv = nn.Conv(
            features=self.channels,
            kernel_size=(self.depthwise_kernel_size,),
            strides=(1,),
            padding=[((self.depthwise_kernel_size - 1) // 2,) * 2],
            feature_group_count=self.channels,
            dtype=self.dtype,
            name="depthwise_conv")
        if self.norm_type == "batchnorm":
            self.bn_scale = self.param("batch_norm_scale",
                                       nn.initializers.ones, (self.channels,))
            self.bn_bias = self.param("batch_norm_bias",
                                      nn.initializers.zeros, (self.channels,))
            self.bn_mean = self.param("batch_norm_mean",
                                      nn.initializers.zeros, (self.channels,))
            self.bn_var = self.param("batch_norm_var",
                                     nn.initializers.ones, (self.channels,))
        else:
            self.norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")
        self.pointwise_conv2 = nn.Dense(self.hidden_size, dtype=self.dtype,
                                        name="pointwise_conv2")
        self.dropout_layer = nn.Dropout(rate=self.dropout)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: (B, T, C)
        x = self.layer_norm(x).astype(self.dtype)
        x = self.pointwise_conv1(x)  # (B, T, 2*channels)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU over channel dim
        x = self.depthwise_conv(x)
        if self.norm_type == "batchnorm":
            # running stats are frozen (torch BN.eval()): no gradient flows
            # into them, and optim._decay_mask excludes them from weight decay
            mean = jax.lax.stop_gradient(self.bn_mean.astype(jnp.float32))
            var = jax.lax.stop_gradient(self.bn_var.astype(jnp.float32))
            inv = jax.lax.rsqrt(var + 1e-5)
            x = ((x.astype(jnp.float32) - mean) * inv
                 * self.bn_scale + self.bn_bias).astype(self.dtype)
        else:
            x = self.norm(x).astype(self.dtype)
        x = nn.hard_swish(x)  # reference uses nn.Hardswish (transformer_layers.py:449)
        x = self.pointwise_conv2(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        return x


class ConformerEncoderLayer(nn.Module):
    """Conformer block (joeynmt/transformer_layers.py:478-565)."""

    size: int = 512
    ff_size: int = 2048
    num_heads: int = 4
    dropout: float = 0.1
    depthwise_conv_kernel_size: int = 31
    alpha: float = 1.0
    layer_norm_position: str = "pre"
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    conv_norm_type: str = "layernorm"
    # "reference" reproduces the torch original bit-for-bit (required for
    # checkpoint conversion): its macaron step is 0.5*PFF(x) + x where PFF
    # already contains the residual, i.e. x <- 1.5x + 0.5*ff_core(LN(x)) —
    # the stream is amplified ~1.5x per macaron FF, growing exponentially
    # with depth (measured: encoder-output std 1.0e0 -> 1.4e3 over 16
    # layers at init), which makes deep conformers untrainable from
    # scratch (loss diverges within 200 steps; the reference publishes no
    # trained conformer). "paper" is the arXiv:2005.08100 form,
    # x <- x + 0.5*ff_core(LN(x)) — use it for training new models.
    macaron: str = "reference"
    # LayerScale (arXiv:2103.17239): per-channel learnable scale on each
    # sublayer's delta, initialized small, so the deep stack is
    # near-identity at init and the encoder output stays input-correlated
    # long enough for CTC/cross-attention to latch. 0.0 = off (default;
    # keeps the param tree conversion-compatible). Requires macaron="paper"
    # (the reference macaron folds the residual into PFF, so the sublayer
    # delta is not separable there).
    layerscale_init: float = 0.0

    def setup(self):
        assert self.layer_norm_position in {"pre", "post"}
        assert self.macaron in {"reference", "paper"}, self.macaron
        if self.macaron == "paper":
            # the half-step recovery below (0.5*(PFF(x) - alpha*x)) assumes
            # PFF returns core + alpha*x, which is only the PRE-norm form;
            # post-norm PFF returns LN(core + alpha*x) and the recovered
            # "core" would be silently wrong math
            assert self.layer_norm_position == "pre", \
                "macaron='paper' requires layer_norm='pre'"
        if self.layerscale_init > 0.0:
            assert self.macaron == "paper", \
                "layerscale needs macaron='paper' (separable sublayer delta)"
            ls = nn.initializers.constant(self.layerscale_init)
            self.ls_ff1 = self.param("ls_ff1", ls, (self.size,))
            self.ls_att = self.param("ls_att", ls, (self.size,))
            self.ls_conv = self.param("ls_conv", ls, (self.size,))
            self.ls_ff2 = self.param("ls_ff2", ls, (self.size,))
        ff = lambda name: PositionwiseFeedForward(
            input_size=self.size, ff_size=self.ff_size, dropout=self.dropout,
            alpha=self.alpha, layer_norm_position=self.layer_norm_position,
            dtype=self.dtype, name=name)
        self.initial_feed_forward = ff("initial_feed_forward")
        self.final_feed_forward = ff("final_feed_forward")
        self.src_att_layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                               name="src_att_layer_norm")
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                             name="final_layer_norm")
        self.src_src_att = MultiHeadedAttention(
            num_heads=self.num_heads, size=self.size, dropout=self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, name="src_src_att")
        self.conv_module = ConvolutionModule(
            hidden_size=self.size, channels=self.size,
            depthwise_kernel_size=self.depthwise_conv_kernel_size,
            dropout=self.dropout, dtype=self.dtype,
            norm_type=self.conv_norm_type, name="conv_module")
        self.src_att_dropout = nn.Dropout(rate=self.dropout)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        ls_on = self.layerscale_init > 0.0

        residual = x
        x = self.initial_feed_forward(x, deterministic=deterministic)
        if self.macaron == "paper":
            # PFF returns ff_core + alpha*x; recover the half-step on the
            # core alone: residual + 0.5*(PFF(x) - alpha*residual)
            delta = 0.5 * (x - self.alpha * residual)
            x = residual + (self.ls_ff1.astype(delta.dtype) * delta if ls_on else delta)
        else:
            x = 0.5 * x + residual

        residual = x
        if self.layer_norm_position == "pre":
            x = self.src_att_layer_norm(x).astype(self.dtype)
        x, _ = self.src_src_att(x, x, x, mask, deterministic=deterministic)
        delta = self.src_att_dropout(x, deterministic=deterministic)
        x = (self.ls_att.astype(delta.dtype) * delta if ls_on else delta) + self.alpha * residual
        if self.layer_norm_position == "post":
            x = self.src_att_layer_norm(x).astype(self.dtype)

        residual = x
        x = self.conv_module(x, deterministic=deterministic)
        x = (self.ls_conv.astype(x.dtype) * x if ls_on else x) + self.alpha * residual

        residual = x
        if self.layer_norm_position == "pre" and self.macaron != "paper":
            # reference quirk kept for parity: this outer LN feeds a PFF
            # that pre-norms again (double normalization of the final FF
            # input, joeynmt/transformer_layers.py:558-562)
            x = self.final_layer_norm(x).astype(self.dtype)
        x = self.final_feed_forward(x, deterministic=deterministic)
        if self.macaron == "paper":
            # exact half-step on the FF core (PFF pre-norms internally),
            # then the block-final LayerNorm per arXiv:2005.08100
            delta = 0.5 * (x - self.alpha * residual)
            x = residual + (self.ls_ff2.astype(delta.dtype) * delta if ls_on else delta)
            x = self.final_layer_norm(x).astype(self.dtype)
        else:
            x = 0.5 * x + residual
            if self.layer_norm_position == "post":
                x = self.final_layer_norm(x).astype(self.dtype)
        return x


def subsequent_mask(size: int) -> jnp.ndarray:
    """Lower-triangular causal mask, bool (1, size, size)
    (joeynmt/helpers.py:81-90)."""
    return jnp.tril(jnp.ones((1, size, size), dtype=bool))


class _PatchConv1d(nn.Module):
    """Stride-2 1-D convolution expressed as a patch-extraction + one MXU
    matmul instead of ``lax.conv_general_dilated``.

    XLA's conv lowering for these (B, T, C) stride-2 shapes fragments into
    ~150 small convolution_add fusions per train step and measured 26ms of
    the 167ms flagship step (~8x above the ~3.3ms matmul-equivalent
    roofline). K strided slices + concat + a single
    (B*T', K*Cin) x (K*Cin, Cout) dot keeps the FLOPs on the MXU in one
    pass. Parameters are named/shaped identically to flax ``nn.Conv``
    (kernel (K, Cin, Cout), bias (Cout,)) so checkpoints and torch
    conversion are unaffected."""

    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, Cin)
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = k // 2
        t_out = (x.shape[1] + 2 * pad - k) // 2 + 1
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0))).astype(self.dtype)
        # tap j of the kernel sees input positions j, j+2, j+4, ...
        taps = [jax.lax.slice_in_dim(xp, j, j + 2 * (t_out - 1) + 1, stride=2,
                                     axis=1) for j in range(k)]
        patches = jnp.concatenate(taps, axis=-1)  # (B, T', K*Cin)
        w = kernel.astype(self.dtype).reshape(k * cin, self.features)
        return patches @ w + bias.astype(self.dtype)


class Conv1dSubsampler(nn.Module):
    """Stride-2 Conv1d stack with GLU non-linearity for audio subsampling
    (joeynmt/encoders.py:311-373; fairseq s2t_transformer).

    Input (B, T, in_channels) -> output (B, T', out_channels) with
    T' = prod over kernels of floor((T + 2*(k//2) - k) / 2 + 1).
    """

    in_channels: int
    mid_channels: int
    out_channels: int
    kernel_sizes: Sequence[int] = (3, 3)
    dtype: Any = jnp.float32

    def setup(self):
        n = len(self.kernel_sizes)
        convs = []
        for i, k in enumerate(self.kernel_sizes):
            out_ch = self.mid_channels if i < n - 1 else self.out_channels * 2
            convs.append(
                _PatchConv1d(
                    features=out_ch,
                    kernel_size=k,
                    dtype=self.dtype,
                    name=f"conv_{i}",
                ))
        self.conv_layers = convs

    @staticmethod
    def get_out_seq_lens(in_seq_lens: jnp.ndarray, kernel_sizes: Sequence[int]) -> jnp.ndarray:
        """Output-length formula (joeynmt/encoders.py:348-352)."""
        out = in_seq_lens.astype(jnp.float32)
        for k in kernel_sizes:
            out = jnp.floor((out + 2 * (k // 2) - (k - 1) - 1) / 2 + 1)
        return out.astype(jnp.int32)

    def __call__(self, x: jnp.ndarray,
                 src_length: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        for conv in self.conv_layers:
            x = conv(x)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(b)  # GLU (torch glu(dim=channel))
        out_lens = self.get_out_seq_lens(src_length, self.kernel_sizes)
        return x, out_lens
