#!/usr/bin/env python
# coding: utf-8
"""Benchmark the Pallas decode-attention kernel vs the XLA einsum path at
bench shapes (B=256, cross S=250, self S=97). All timings include ~1ms
remote-dispatch floor; compare relative values."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from joeys2t_tpu.ops.decode_attention import decode_attention, NEG_INF


def materialize(out):
    np.asarray(jax.tree.leaves(out)[0])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    materialize(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    materialize(out)
    return (time.perf_counter() - start) / iters


def run(tag, b, s, h, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.float32)
    kb = k.astype(jnp.float32)

    @jax.jit
    def einsum_path(q, k, v, bias):
        scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias[:, None, :]
        p = jax.nn.softmax(scores, -1).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhsd->bhd", p, v)

    t_e = timeit(einsum_path, q, k.astype(jnp.bfloat16),
                 v.astype(jnp.bfloat16), bias)
    t_p = timeit(lambda *a: decode_attention(*a, sm_scale=1.0), q, k, v, bias)

    # int8 per-channel
    ks = jnp.max(jnp.abs(kb), axis=2) / 127.0 + 1e-8  # (B, H, D)
    vs = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=2) / 127.0 + 1e-8
    k8 = jnp.clip(jnp.round(kb / ks[:, :, None, :]), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v.astype(jnp.float32) / vs[:, :, None, :]),
                  -127, 127).astype(jnp.int8)
    t_p8 = timeit(lambda *a: decode_attention(*a, sm_scale=1.0),
                  q, k8, v8, bias, ks.astype(jnp.float32),
                  vs.astype(jnp.float32))

    gb = (k.nbytes + v.nbytes) / 1e9
    print(json.dumps({
        "bench": tag, "b": b, "s": s,
        "einsum_ms": round(t_e * 1e3, 3),
        "pallas_bf16_ms": round(t_p * 1e3, 3),
        "pallas_int8_ms": round(t_p8 * 1e3, 3),
        "kv_GB": round(gb, 4),
    }))


if __name__ == "__main__":
    run("cross", 256, 250, 4, 128)
    run("self", 256, 97, 4, 128)
