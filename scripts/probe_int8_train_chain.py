# coding: utf-8
"""Probe: full fwd+bwd FFN chain, bf16 vs int8 GEMMs (the training case).

probe_int8_matmul.py showed int8 fwd GEMMs reach 250 TOP/s (1.57x bf16)
pre-quantized but only +11% with in-graph per-row dynamic quantization at
the encoder shape. Training spends 2/3 of its GEMM FLOPs in the backward
(dgrad + wgrad), so the decision needs the fwd+bwd number.

Variants (LAYERS-deep dependent E->F->E FFN chain, grad wrt weights):
  bf16       — production today
  int8-dyn   — custom_vjp Dense: fwd int8 (per-tensor dynamic scales),
               dgrad int8 (quantized dy), wgrad int8. Straight-through
               estimator: gradients flow as if the quantization were
               identity.
  int8-fwd   — int8 forward only, bf16 backward (the conservative knob)

Per-tensor scales keep every contraction dimension scale-free (per-row
scales cannot factor out of the wgrad contraction over M).

Run on the real TPU:  python scripts/probe_int8_train_chain.py
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


def _q(t):
    """Per-tensor symmetric abs-max int8 quantization."""
    s = (jnp.max(jnp.abs(t)).astype(jnp.float32) / 127.0 + 1e-8)
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _dot8(a, b):
    qa, sa = _q(a)
    qb, sb = _q(b)
    o = jax.lax.dot_general(qa, qb, (((a.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (o.astype(jnp.float32) * (sa * sb)).astype(a.dtype)


@jax.custom_vjp
def dense8(x, w):
    return _dot8(x, w)


def _dense8_fwd(x, w):
    return _dot8(x, w), (x, w)


def _dense8_bwd(res, dy):
    x, w = res
    dx = _dot8(dy, w.T)          # dgrad int8
    dw = _dot8(x.T, dy)          # wgrad int8
    return dx, dw


dense8.defvjp(_dense8_fwd, _dense8_bwd)


@jax.custom_vjp
def dense8_fwd_only(x, w):
    return _dot8(x, w)


def _d8f_fwd(x, w):
    return _dot8(x, w), (x, w)


def _d8f_bwd(res, dy):
    x, w = res
    return dy @ w.T, x.T @ dy    # bf16 backward


dense8_fwd_only.defvjp(_d8f_fwd, _d8f_bwd)


def run(M):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, E), jnp.bfloat16)
    w1 = [jnp.asarray(rng.randn(E, F) * 0.02, jnp.bfloat16)
          for _ in range(LAYERS)]
    w2 = [jnp.asarray(rng.randn(F, E) * 0.02, jnp.bfloat16)
          for _ in range(LAYERS)]

    def chain(dot):
        def loss(ws, x):
            w1, w2 = ws
            for a, b in zip(w1, w2):
                h = jax.nn.relu(dot(x, a))
                x = dot(h, b) * jnp.bfloat16(0.1) + x
            return x.astype(jnp.float32).sum()
        return jax.jit(jax.grad(loss))

    flops = 6.0 * M * E * F * 2 * LAYERS  # fwd+bwd, 2 dots/layer
    print(f"M={M} ({LAYERS}-layer E={E}<->F={F} FFN chain, fwd+bwd):")
    for name, dot in [("bf16    ", lambda a, b: a @ b),
                      ("int8-dyn", dense8),
                      ("int8-fwd", dense8_fwd_only)]:
        t = timeit(chain(dot), (w1, w2), x)
        print(f"  {name} {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")


def main():
    run(48000)  # encoder train rows: B=192 x T=250
    run(12288)  # decoder train rows: B=192 x 64


if __name__ == "__main__":
    main()
