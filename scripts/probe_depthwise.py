#!/usr/bin/env python
# coding: utf-8
"""Probe: depthwise-conv formulation for the conformer conv module.

The conformer train profile (scripts/profile_train.py --encoder
conformer) shows ~56.6ms/step of conv-category time at B=128 — the
grouped `lax.conv_general_dilated` (feature_group_count=C) does not map
to the MXU, and its TPU lowering is a candidate for replacement. A
depthwise conv is K shifted multiply-adds over the (B, T, C) activation:

    out[b, t, c] = sum_k x[b, t+k-K//2, c] * w[k, c]

formulated as K static slices of a padded x, each fused into one
elementwise FMA loop by XLA (VPU-bound, reads x ~once if fusion holds).

Variants, 8-layer dependent chain inside one jit (amortizes the ~1ms
axon dispatch floor):
  grouped : flax-style nn.Conv lowering (lax.conv feature_group_count=C)
  fma     : K shifted multiply-adds on padded x

Run on the real TPU:  python scripts/probe_depthwise.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LAYERS = 8
C = 512
K = 31


def materialize(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "size")]
    if leaves:
        np.asarray(min(leaves, key=lambda a: a.size))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    materialize(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    materialize(out)
    return (time.perf_counter() - start) / iters


def run(B, T):
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C), dt)
    # one (K, C) kernel per layer (same layout flax stores: (K, 1, C))
    ws = [jnp.asarray(rng.randn(K, C) * 0.1, dt) for _ in range(LAYERS)]

    pad = K // 2

    def conv_grouped(x, w):
        return jax.lax.conv_general_dilated(
            x, w[:, None, :], window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=C)

    def conv_fma(x, w):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        out = jnp.zeros_like(x)
        for k in range(K):
            out = out + xp[:, k:k + x.shape[1], :] * w[k]
        return out

    def chain(conv):
        def f(x, ws):
            for w in ws:
                x = conv(x, w) * 0.1 + x
            return x.sum()
        return f

    grouped = jax.jit(chain(conv_grouped))
    fma = jax.jit(chain(conv_fma))
    g_grouped = jax.jit(jax.grad(chain(conv_grouped), argnums=(0, 1)))
    g_fma = jax.jit(jax.grad(chain(conv_fma), argnums=(0, 1)))

    # numerics agree
    a = np.asarray(conv_grouped(x[:2, :64], ws[0]), np.float32)
    b = np.asarray(conv_fma(x[:2, :64], ws[0]), np.float32)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)

    per = 1e3 / LAYERS
    print(f"B={B} T={T} (ms/layer, {LAYERS}-layer chain)")
    print(f"  fwd   grouped {timeit(grouped, x, ws) * per:7.3f}   "
          f"fma {timeit(fma, x, ws) * per:7.3f}")
    print(f"  f+b   grouped {timeit(g_grouped, x, ws) * per:7.3f}   "
          f"fma {timeit(g_fma, x, ws) * per:7.3f}", flush=True)


if __name__ == "__main__":
    for b, t in ((64, 250), (128, 250), (192, 250)):
        run(b, t)
