#!/usr/bin/env python
# coding: utf-8
"""Honest decode-attention micro-benchmark: run the op N times inside ONE
jit with a q->ctx->q data dependency (no CSE, no per-call dispatch), and
report the marginal per-iteration time from two loop lengths. This is the
cost the decode while_loop actually pays per step."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from joeys2t_tpu.ops.decode_attention import decode_attention


def materialize(out):
    np.asarray(jax.tree.leaves(out)[0])


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    materialize(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    materialize(out)
    return (time.perf_counter() - start) / iters


def marginal(loop_fn, n_lo=2, n_hi=12):
    # loop count is a traced argument: ONE compile per variant
    t_lo = timeit(lambda: loop_fn(n_lo))
    t_hi = timeit(lambda: loop_fn(n_hi))
    print(json.dumps({"t_lo_ms": round(t_lo * 1e3, 3),
                      "t_hi_ms": round(t_hi * 1e3, 3)}), flush=True)
    return (t_hi - t_lo) / (n_hi - n_lo)


N_LAYERS = 8  # loop body cycles 8 distinct caches like the real decoder:
# a single cache could be pinned VMEM-resident across loop iterations,
# which inflates apparent bandwidth beyond HBM peak


def run(tag, b, s, h, d):
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.randn(b, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(N_LAYERS, b, h, s, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(N_LAYERS, b, h, s, d), jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.float32)
    kf = k.astype(jnp.float32)
    ks = (jnp.max(jnp.abs(kf), axis=3) / 127.0 + 1e-8).astype(jnp.float32)
    vs = (jnp.max(jnp.abs(v.astype(jnp.float32)), axis=3) / 127.0
          + 1e-8).astype(jnp.float32)
    k8 = jnp.clip(jnp.round(kf / ks[..., None, :]), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v.astype(jnp.float32) / vs[..., None, :]),
                  -127, 127).astype(jnp.int8)

    def xla_step(q, k, v):
        scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias[:, None, :]
        p = jax.nn.softmax(scores, -1).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhsd->bhd", p, v)

    def mk_loop(step):
        @jax.jit
        def f(q, n):
            def body(_, q):
                return step(q)
            q = jax.lax.fori_loop(0, n, body, q)
            return q.astype(jnp.float32).sum()
        return lambda n: f(q0, n)

    def layers(step_1l):
        def step(q):
            for li in range(N_LAYERS):
                ctx = step_1l(q, li)
                q = q + 0.0001 * ctx.astype(q.dtype)
            return q
        return step

    variants = {
        "xla_bf16": layers(lambda q, li: xla_step(q, k[li], v[li])),
        "pallas_bf16": layers(lambda q, li: decode_attention(
            q, k[li], v[li], bias, sm_scale=1.0)),
        "pallas_int8": layers(lambda q, li: decode_attention(
            q, k8[li], v8[li], bias, ks[li], vs[li], sm_scale=1.0,
            scale_layout="channel")),
    }
    gb = {"xla_bf16": (k.nbytes + v.nbytes),
          "pallas_bf16": (k.nbytes + v.nbytes),
          "pallas_int8": (k8.nbytes + v8.nbytes)}
    out = {"bench": tag, "b": b, "s": s}
    import os
    only = os.environ.get("BENCH_VARIANT")
    for name, step in variants.items():
        if only and name != only:
            continue
        t = marginal(mk_loop(step))  # per full 8-layer pass
        out[f"{name}_ms"] = round(t * 1e3, 3)
        out[f"{name}_GBps"] = round(gb[name] / t / 1e9, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import os
    tag = os.environ.get("BENCH_TAG", "both")
    if tag in ("cross", "both"):
        run("cross", 256, 250, 4, 128)
    if tag in ("self", "both"):
        run("self", 256, 97, 4, 128)
