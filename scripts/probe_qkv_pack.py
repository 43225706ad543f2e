# coding: utf-8
"""Probe: is a packed QKV projection (one [E, 3E] dot) faster than three
separate [E, E] dots at train shapes?

The r3 train-step decomposition (docs/benchmarks_s2t.md) shows attention
QKV/output projections at 42.5ms of the 140ms B=192 step — ~2.7x the naive
matmul roofline, vs ~1.5x for the FFN dots. Candidate explanations: the
input activations are read 3x (once per dot), and per-dot overheads.
Packing q/k/v kernels into one (E, 3E) weight reads the input once.

Measurement: a 16-layer dependent chain runs INSIDE one jit so the ~1ms
axon dispatch floor amortizes (a single-op jit through the tunnel times
the dispatch, not the kernel). q+k+v are folded back to E between layers
so the chain stays dependent and the fold cost is identical across
variants.

Run on the real TPU:  python scripts/probe_qkv_pack.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LAYERS = 16
E = 512


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


def run(B, S):
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, E), dt)
    ws = [tuple(jnp.asarray(rng.randn(E, E) * 0.02, dt) for _ in range(3))
          for _ in range(LAYERS)]
    wp = [jnp.concatenate(w3, axis=1) for w3 in ws]

    @jax.jit
    def three(x, ws):
        for (wq, wk, wv) in ws:
            q = x @ wq
            k = x @ wk
            v = x @ wv
            x = (q + k + v) * 0.1
        return x.sum()

    @jax.jit
    def packed(x, wp):
        for w in wp:
            qkv = x @ w
            q = qkv[..., :E]
            k = qkv[..., E:2 * E]
            v = qkv[..., 2 * E:]
            x = (q + k + v) * 0.1
        return x.sum()

    g_three = jax.jit(jax.grad(three, argnums=1))
    g_packed = jax.jit(jax.grad(packed, argnums=1))

    print(f"B={B} S={S}, {LAYERS}-layer chain (per-layer us):")
    for name, fn, args in [
            ("three fwd ", three, (x, ws)),
            ("packed fwd", packed, (x, wp)),
            ("three  f+b", g_three, (x, ws)),
            ("packed f+b", g_packed, (x, wp)),
    ]:
        t = timeit(fn, *args, iters=20)
        print(f"  {name} {t*1e3:8.2f} ms total  {t/LAYERS*1e6:7.1f} us/layer")


def main():
    run(192, 250)   # encoder train shape
    run(192, 64)    # decoder train shape
    run(32, 250)    # eval encode shape


if __name__ == "__main__":
    main()
