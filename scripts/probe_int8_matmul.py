# coding: utf-8
"""Probe: do int8 x int8 -> int32 GEMMs beat bf16 at the train shapes?

v5e's MXU has a 394 TOP/s int8 path vs 197 TFLOP/s bf16
(jax-ml.github.io/scaling-book hardware tables) — the one documented lever
left for train-step MFU past ~46% at E=512 (docs/benchmarks_s2t.md
"Roofline statement": further gains need bigger tiles or lower precision,
not op-level surgery). Before building a quantized-training knob, measure
whether XLA actually reaches the int8 MXU path at our shapes, and what
dynamic (in-graph) activation quantization costs on top.

Variants, each a LAYERS-deep dependent FFN chain (E->F->E) inside one jit
so the ~1ms axon dispatch floor amortizes:
  bf16      — baseline: both dots bf16 (the production step today)
  int8-pre  — both operands pre-quantized int8, int32 accum (upper bound;
              real training still pays weight quantization once per step)
  int8-dyn  — weights pre-quantized; activations quantized IN-GRAPH per
              row (abs-max -> int8) before each dot, output rescaled to
              bf16 (the realistic forward-pass cost)

Run on the real TPU:  python scripts/probe_int8_matmul.py
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
E, F = 512, 2048


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


def _quant_rowwise(x):
    """Symmetric per-row abs-max int8 quantization; returns (q, scale)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (amax / 127.0 + 1e-8).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def run(M):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, E), jnp.bfloat16)
    w1 = [jnp.asarray(rng.randn(E, F) * 0.02, jnp.bfloat16)
          for _ in range(LAYERS)]
    w2 = [jnp.asarray(rng.randn(F, E) * 0.02, jnp.bfloat16)
          for _ in range(LAYERS)]

    def q_w(w):
        qw, sw = _quant_rowwise(w.T.astype(jnp.float32))  # per-out-channel
        return qw.T, sw.T  # (in, out) int8, (1, out) f32

    w1q = [q_w(w) for w in w1]
    w2q = [q_w(w) for w in w2]
    xq, xs = _quant_rowwise(x)

    @jax.jit
    def bf16_chain(x, w1, w2):
        for a, b in zip(w1, w2):
            h = x @ a
            x = (h @ b) * jnp.bfloat16(0.1)
        return x.sum()

    @jax.jit
    def int8_pre_chain(xq, w1q, w2q):
        # dependent int8 chain: requantize between layers with a fixed
        # scale (cost identical across layers; keeps operands int8)
        for (a, sa), (b, sb) in zip(w1q, w2q):
            h32 = jax.lax.dot_general(
                xq, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            hq = jnp.clip(h32 >> 7, -127, 127).astype(jnp.int8)
            o32 = jax.lax.dot_general(
                hq, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            xq = jnp.clip(o32 >> 7, -127, 127).astype(jnp.int8)
        return xq.sum()

    @jax.jit
    def int8_dyn_chain(x, w1q, w2q):
        for (a, sa), (b, sb) in zip(w1q, w2q):
            q, s = _quant_rowwise(x)
            h32 = jax.lax.dot_general(
                q, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = (h32.astype(jnp.float32) * s * sa).astype(jnp.bfloat16)
            q2, s2 = _quant_rowwise(h)
            o32 = jax.lax.dot_general(
                q2, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = (o32.astype(jnp.float32) * s2 * sb).astype(jnp.bfloat16)
        return x.sum()

    flops = 2.0 * M * E * F * 2 * LAYERS  # 2 dots per layer
    print(f"M={M} ({LAYERS}-layer E={E}<->F={F} FFN chain):")
    for name, fn, args in [
            ("bf16    ", bf16_chain, (x, w1, w2)),
            ("int8-pre", int8_pre_chain, (xq, w1q, w2q)),
            ("int8-dyn", int8_dyn_chain, (x, w1q, w2q)),
    ]:
        t = timeit(fn, *args)
        print(f"  {name} {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")


def main():
    run(48000)  # encoder train rows: B=192 x T=250
    run(12288)  # decoder train rows: B=192 x 64
    run(8000)   # eval encode rows: B=32 x 250


if __name__ == "__main__":
    main()
