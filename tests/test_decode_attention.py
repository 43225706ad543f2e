# coding: utf-8
"""Pallas decode-attention kernel vs the einsum reference (interpret mode on
the CPU backend; the same kernel compiles on TPU). Covers bf16, int8 with
per-channel scales (cross cache) and int8 with per-position scales (self
ring buffer). Cache layout: (B, H, S, D)."""
import numpy as np

import jax.numpy as jnp

from joeys2t_tpu.ops.decode_attention import (NEG_INF, decode_attention,
                                              quantize_per_position)


def einsum_reference(q, k, v, bias, sm_scale):
    """(B,H,D) x (B,H,S,D) -> (B,H,D), f32 math."""
    qf = q.astype(np.float32) * sm_scale
    scores = np.einsum("bhd,bhsd->bhs", qf, k.astype(np.float32))
    scores = scores + bias[:, None, :]
    m = scores.max(-1, keepdims=True)
    p = np.exp(scores - m)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhs,bhsd->bhd", p, v.astype(np.float32))


def make_inputs(b=4, s=40, h=4, d=128, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, h, d).astype(np.float32)
    k = rng.randn(b, h, s, d).astype(np.float32)
    v = rng.randn(b, h, s, d).astype(np.float32)
    lengths = rng.randint(s // 2, s + 1, size=(b,))
    bias = np.where(np.arange(s)[None, :] < lengths[:, None], 0.0,
                    NEG_INF).astype(np.float32)
    return q, k, v, bias


class TestDecodeAttention:
    def test_bf16_matches_einsum(self):
        q, k, v, bias = make_inputs()
        out = decode_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias),
            sm_scale=0.125, interpret=True)
        ref = einsum_reference(
            np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32),
            np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32),
            np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32),
            bias, 0.125)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   atol=2e-2, rtol=2e-2)

    def test_int8_per_channel_scales(self):
        """Cross-attention cache quantization: scale per (b, h, d) channel."""
        q, k, v, bias = make_inputs(seed=1)
        ks = (np.abs(k).max(axis=2) / 127.0 + 1e-8)  # (B, H, D)
        vs = (np.abs(v).max(axis=2) / 127.0 + 1e-8)
        k_i8 = np.clip(np.round(k / ks[:, :, None, :]), -127, 127).astype(np.int8)
        v_i8 = np.clip(np.round(v / vs[:, :, None, :]), -127, 127).astype(np.int8)

        out = decode_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k_i8),
            jnp.asarray(v_i8), jnp.asarray(bias),
            jnp.asarray(ks, jnp.float32), jnp.asarray(vs, jnp.float32),
            sm_scale=0.125, interpret=True)
        # reference on the dequantized cache: quantization error excluded
        ref = einsum_reference(
            np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32),
            k_i8.astype(np.float32) * ks[:, :, None, :],
            v_i8.astype(np.float32) * vs[:, :, None, :],
            bias, 0.125)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   atol=3e-2, rtol=3e-2)

    def test_int8_per_position_scales(self):
        """Self-attention ring buffer quantization: scale per (b, h, s)."""
        q, k, v, bias = make_inputs(seed=2)
        k_i8, ks = quantize_per_position(jnp.asarray(k))  # scales (B, H, S)
        v_i8, vs = quantize_per_position(jnp.asarray(v))

        out = decode_attention(
            jnp.asarray(q, jnp.bfloat16), k_i8, v_i8, jnp.asarray(bias),
            ks, vs, sm_scale=0.125, interpret=True)
        ref = einsum_reference(
            np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32),
            np.asarray(k_i8, np.float32) * np.asarray(ks)[..., None],
            np.asarray(v_i8, np.float32) * np.asarray(vs)[..., None],
            bias, 0.125)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   atol=3e-2, rtol=3e-2)

    def test_quantize_per_position_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 7, 32), jnp.float32)
        q, s = quantize_per_position(x)
        assert q.dtype == jnp.int8 and s.shape == (2, 4, 7)
        deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
        np.testing.assert_allclose(deq, np.asarray(x), atol=2e-2)

    def test_masked_positions_ignored(self):
        """Fully-masked tail positions must not affect the context."""
        q, k, v, bias = make_inputs(b=2, s=16, seed=4)
        bias[:, 8:] = NEG_INF
        out1 = decode_attention(jnp.asarray(q, jnp.bfloat16),
                                jnp.asarray(k, jnp.bfloat16),
                                jnp.asarray(v, jnp.bfloat16),
                                jnp.asarray(bias), sm_scale=1.0,
                                interpret=True)
        k2, v2 = k.copy(), v.copy()
        k2[:, :, 8:] = 99.0
        v2[:, :, 8:] = -99.0
        out2 = decode_attention(jnp.asarray(q, jnp.bfloat16),
                                jnp.asarray(k2, jnp.bfloat16),
                                jnp.asarray(v2, jnp.bfloat16),
                                jnp.asarray(bias), sm_scale=1.0,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out1, np.float32),
                                   np.asarray(out2, np.float32), atol=1e-3)
