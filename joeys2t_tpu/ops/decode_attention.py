# coding: utf-8
"""
Pallas TPU kernel for single-position (autoregressive decode) attention.

The decode hot loop is HBM-bandwidth-bound on reading the KV caches
(SURVEY.md §3.3 hot path; reference recomputes the full prefix instead,
joeynmt/search.py:240-253). XLA's per-layer einsums at decode sizes reach
only ~190-340 GB/s on v5e and its int8 path materializes a dequantized
bf16 copy (measured slower than bf16). This kernel streams each (batch)
slab of K/V through VMEM once per step:

  grid (B,):  per head h:  scores_h = K[b,h] @ q[b,h]   (MXU matvec, f32)
              p = softmax(scores + bias)                (VPU, f32)
              per head h:  ctx_h    = p_h @ V[b,h]      (MXU)

and dequantizes int8 caches on the VPU *in VMEM* — int8 halves the HBM
traffic with zero extra memory round-trips. Cache layout is (B, H, S, D):
per-head K/V slabs are contiguous 2-D (S, D) tiles, which Mosaic lowers
directly (lane dim D=head_size, sublane dim S). Two scale layouts:

  - per-channel (B, H, D): cross-attention cache quantized over source
    positions once at init_cache; scales fold into q (for K) and into the
    output (for V) — zero per-element dequant work.
  - per-position (B, H, S): self-attention ring buffer quantized slot by
    slot as tokens are emitted; scales fold into the (S,) score/prob
    vectors — O(H*S) work, no (S, D)-sized dequant.

Returns the attention context per head, (B, H, D); the output projection
stays outside (it is weight traffic, shared across implementations).
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, bias_ref, ks_ref, vs_ref, o_ref, *,
            sm_scale: float, scale_layout: str, num_heads: int, bb: int):
    """A block of bb batch rows: q (bb,H,D) x K/V (bb,H,S,D) -> ctx (bb,H,D).

    The (bb*H) per-row matvecs are batched into TWO MXU matmuls per program
    via a block-diagonal formulation (64 tiny matvecs leave the kernel
    compute-bound; one (bb*H*S, D) x (D, bb*H) dot is HBM-bound again):

      G        = K_flat @ Q^T          (bb*H*S, bb*H) — extra columns wasted
      scores_r = G[r, r // S]          (diagonal-block select, VPU gather)
      P_bd     = block_diag(softmax)   (bb*H, bb*H*S) masked broadcast
      ctx      = P_bd @ V_flat         (bb*H, D)

    Dots run in bf16 on the MXU with f32 accumulation (a f32 dot would be
    8x slower); int8 caches are upcast to bf16 on the VPU in VMEM (no HBM
    round-trip)."""
    s = k_ref.shape[2]
    d = k_ref.shape[3]

    q = q_ref[...].astype(jnp.float32) * sm_scale  # (bb, H, D)
    if scale_layout == "channel":
        q = q * ks_ref[...].astype(jnp.float32)  # fold K scales into q
    q = q.astype(jnp.bfloat16)

    for h in range(num_heads):  # H is small (4-16); static unroll
        k = k_ref[:, h].astype(jnp.float32)  # (bb, S, D)
        # scores[b, s'] = k[b, s'] . q[b] — a matvec is 1 flop/byte, so the
        # VPU multiply+lane-reduce is as fast as an MXU dot here and avoids
        # Mosaic's unsupported thin-matmul shapes
        scores = jnp.sum(k * q[:, h][:, None, :].astype(jnp.float32),
                         axis=-1)  # (bb, S)

        if scale_layout == "position":
            scores = scores * ks_ref[:, h].astype(jnp.float32)

        scores = scores + bias_ref[:, 0].astype(jnp.float32)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (bb, S) f32

        if scale_layout == "position":
            p = p * vs_ref[:, h].astype(jnp.float32)

        # ctx[b, d'] = sum_s p[b, s] * v[b, s, d'] — sublane reduce
        ctx = jnp.sum(v_ref[:, h].astype(jnp.float32) * p[:, :, None],
                      axis=1)  # (bb, D)

        if scale_layout == "channel":
            ctx = ctx * vs_ref[:, h].astype(jnp.float32)

        o_ref[:, h] = ctx.astype(o_ref.dtype)


def _kernel_loop(q_ref, k_ref, v_ref, bias_ref, ks_ref, vs_ref, o_ref, *,
                 sm_scale: float, scale_layout: str, num_heads: int, bb: int):
    """Reference per-head-matvec variant (kept for comparison/debugging)."""
    for b in range(bb):
        bias = bias_ref[b].astype(jnp.float32)  # (1, S)
        for h in range(num_heads):  # H is small (4-16); static unroll
            q = q_ref[b, h][None, :].astype(jnp.float32) * sm_scale  # (1, D)
            if scale_layout == "channel":
                # fold per-channel K scales into q: scores = (q*ks) . k_i8
                q = q * ks_ref[b, h].astype(jnp.float32)  # (1, D)

            k = k_ref[b, h]  # (S, D) bf16 or int8
            # scores[s] = sum_d q[d] * k[s, d]
            scores = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, S)

            if scale_layout == "position":
                scores = scores * ks_ref[b, h].astype(jnp.float32)[None, :]

            scores = scores + bias
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)  # (1, S) f32

            if scale_layout == "position":
                p = p * vs_ref[b, h].astype(jnp.float32)[None, :]

            # ctx[d] = sum_s p[s] * v[s, d]
            ctx = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[b, h].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, D)

            if scale_layout == "channel":
                ctx = ctx * vs_ref[b, h].astype(jnp.float32)

            o_ref[b, h] = ctx[0].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret",
                                             "batch_block", "scale_layout"))
def decode_attention(
    q: jnp.ndarray,  # (B, H, D)
    k: jnp.ndarray,  # (B, H, S, D) bf16/f32 or int8
    v: jnp.ndarray,  # (B, H, S, D)
    bias: jnp.ndarray,  # (B, S) additive mask, 0 or NEG_INF
    k_scale: Optional[jnp.ndarray] = None,  # (B,H,D) | (B,H,S) | None
    v_scale: Optional[jnp.ndarray] = None,
    *,
    sm_scale: float = 1.0,
    interpret: bool = False,
    batch_block: int = 8,
    scale_layout: Optional[str] = None,  # "channel" | "position"; inferred
                                         # from shapes if omitted (ambiguous
                                         # when S == D — pass it then)
) -> jnp.ndarray:
    """Single-step attention context (B, H, D) with fused int8 dequant."""
    b, h, s, d = k.shape
    bb = batch_block
    # VMEM budget: the K+V slabs (plus the kernel's per-head f32 upcast
    # temporaries) must fit in ~16MB of VMEM. At the default bb=8 a long
    # source (S~2-3k, H=8, D=64, bf16) would stage ~24MB and fail to
    # compile — shrink the batch block until the slabs fit.
    slab_bytes = 2 * h * s * d * jnp.dtype(k.dtype).itemsize  # K+V per row
    while bb > 1 and bb * slab_bytes > 8 * 1024 * 1024:
        bb //= 2
    while b % bb != 0:  # batch must tile evenly; fall back to smaller blocks
        bb //= 2
    if k_scale is None:
        scale_layout = "none"
        # dummy refs so the kernel signature is uniform
        k_scale = jnp.ones((b, h, d), q.dtype)
        v_scale = jnp.ones((b, h, d), q.dtype)
    elif scale_layout is None:
        assert s != d, "S == D: pass scale_layout explicitly"
        scale_layout = "channel" if k_scale.shape == (b, h, d) else "position"
    if scale_layout == "channel":
        assert k_scale.shape == (b, h, d), k_scale.shape
    elif scale_layout == "position":
        assert k_scale.shape == (b, h, s), k_scale.shape
    assert v_scale is not None and v_scale.shape == k_scale.shape

    last = d if scale_layout in ("channel", "none") else s
    scale_spec = pl.BlockSpec((bb, h, last), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, sm_scale=sm_scale,
                               scale_layout=scale_layout, num_heads=h, bb=bb)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, s, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, s, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, S): trailing block dims must be divisible by (8, 128)
            # or equal to the array dims (Mosaic tiling constraint)
            pl.BlockSpec((bb, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((bb, h, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * h * d,
            bytes_accessed=k.nbytes + v.nbytes + q.nbytes,
            transcendentals=b * s * h),
        interpret=interpret,
    )(q, k, v, bias[:, None, :], k_scale, v_scale)


def quantize_per_position(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8-quantize (..., S, D) with one scale per (..., s) slot.

    Used for the self-attention ring buffer: each new slot is quantized
    when written, independently of the others."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0 + 1e-8
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)
