#!/usr/bin/env python
# coding: utf-8
"""Calibrate the TPU's per-kernel overhead and achievable HBM bandwidth.

1. dispatch floor: trivial jitted scalar op, async-dispatch N, one sync
2. kernel-chain: K serially-dependent small matmuls inside ONE jit
   -> slope = per-kernel fixed cost on device
3. HBM bandwidth: reduce-sum of a large bf16 array (pure read)
4. einsum sweep: the decode cross-attention einsum at several sizes
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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


def main():
    # 1. dispatch floor
    @jax.jit
    def trivial(x):
        return x + 1.0

    x0 = jnp.zeros((8, 128), jnp.float32)
    t = timeit(trivial, x0, iters=50)
    print(json.dumps({"probe": "dispatch_floor_us", "value": round(t * 1e6, 1)}))

    # 2. per-kernel cost: serial chains of length K
    h = 512
    w = jnp.ones((h, h), jnp.bfloat16)
    xb = jnp.ones((256, h), jnp.bfloat16)

    def chain(k):
        @jax.jit
        def f(x, w):
            for _ in range(k):
                x = jnp.tanh(x @ w)  # tanh breaks matmul merging
            return x.astype(jnp.float32).sum()
        return f

    ts = {}
    for k in (4, 32):
        ts[k] = timeit(chain(k), xb, w, iters=20)
    per_kernel = (ts[32] - ts[4]) / 28
    print(json.dumps({"probe": "serial_kernel_us", "value":
                      round(per_kernel * 1e6, 2),
                      "chain4_ms": round(ts[4] * 1e3, 3),
                      "chain32_ms": round(ts[32] * 1e3, 3)}))

    # 3. HBM read bandwidth: sum of 1 GB bf16
    big = jnp.ones((512, 1024, 1024), jnp.bfloat16)  # 1 GiB

    @jax.jit
    def red(a):
        return a.astype(jnp.float32).sum()

    t = timeit(red, big, iters=10)
    gbps = big.nbytes / t / 1e9
    print(json.dumps({"probe": "hbm_read_GBps", "value": round(gbps, 1),
                      "ms": round(t * 1e3, 2)}))

    # 4. cross-attention einsum at layer size vs 8x batched size
    b, s, nh, dh = 256, 250, 4, 128
    q = jnp.ones((b, nh, 1, dh), jnp.bfloat16)
    k1 = jnp.ones((b, s, nh, dh), jnp.bfloat16)

    @jax.jit
    def attn1(q, k):
        sc = jnp.einsum("bhqd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
        return sc.sum()

    t1 = timeit(attn1, q, k1, iters=20)
    print(json.dumps({"probe": "cross_score_1L_ms", "value": round(t1 * 1e3, 3),
                      "GBps": round(k1.nbytes / t1 / 1e9, 1)}))

    # all-8-layers-in-one: stack layer dim into batch
    k8 = jnp.ones((8, b, s, nh, dh), jnp.bfloat16)
    q8 = jnp.ones((8, b, nh, 1, dh), jnp.bfloat16)

    @jax.jit
    def attn8(q, k):
        sc = jnp.einsum("lbhqd,lbkhd->lbhqk", q, k,
                        preferred_element_type=jnp.float32)
        return sc.sum()

    t8 = timeit(attn8, q8, k8, iters=20)
    print(json.dumps({"probe": "cross_score_8L_batched_ms",
                      "value": round(t8 * 1e3, 3),
                      "GBps": round(k8.nbytes / t8 / 1e9, 1)}))

    # int8 variant with fused dequant (XLA) for comparison
    k1_i8 = jnp.ones((b, s, nh, dh), jnp.int8)
    k1_sc = jnp.ones((b, 1, nh, dh), jnp.bfloat16)

    @jax.jit
    def attn1_i8(q, k, sc):
        kd = k.astype(jnp.bfloat16) * sc
        s_ = jnp.einsum("bhqd,bkhd->bhqk", q, kd,
                        preferred_element_type=jnp.float32)
        return s_.sum()

    t1i = timeit(attn1_i8, q, k1_i8, k1_sc, iters=20)
    print(json.dumps({"probe": "cross_score_1L_int8_xla_ms",
                      "value": round(t1i * 1e3, 3),
                      "eff_GBps_of_int8": round(k1_i8.nbytes / t1i / 1e9, 1)}))


if __name__ == "__main__":
    main()
