#!/usr/bin/env python
# coding: utf-8
"""Decompose greedy-decode per-step cost on real TPU hardware.

Measures, for the flagship (librispeech_100h-sized) model at a given batch:
  1. encoder forward time
  2. full greedy decode at L=96 and L=48 -> per-step slope + fixed overhead
  3. one standalone jitted decode_step called N times (loop-free per-step cost)
  4. component kernels in isolation: 8x step_cross, 8x step_self, 8x FFN+proj
This separates while_loop overhead from genuine HBM-bound kernel time and
identifies which cache reads dominate. Prints one JSON line per probe.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def materialize(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "size")]
    if leaves:
        np.asarray(min(leaves, key=lambda a: a.size))


def timeit(fn, *args, iters=5, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    materialize(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    materialize(out)
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=1000)
    args = ap.parse_args()

    from __graft_entry__ import _build
    from joeys2t_tpu.search import transformer_greedy, _cast_params_to_compute_dtype

    model, spec = _build()

    b, t = args.batch, args.frames
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(b, t, 80).astype(np.float32))
    src_length = jnp.full((b,), t, jnp.int32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, src, jnp.ones((b, 8), jnp.int32),
        src_length, None, jnp.ones((b, 1, 8), bool), deterministic=True)["params"]

    @jax.jit
    def encode(params, src, src_length):
        return model.apply({"params": params}, src, src_length, None,
                           method="encode")

    enc_out, _, enc_mask = encode(params, src, src_length)
    materialize(enc_out)
    t_enc = timeit(encode, params, src, src_length)
    print(json.dumps({"probe": "encode_ms", "value": round(t_enc * 1e3, 2),
                      "batch": b}))

    # 2. greedy at two lengths -> slope & intercept
    results = {}
    for L in (48, 96):
        def run(L=L):
            out, scores, _ = transformer_greedy(params, model, spec, enc_out,
                                                enc_mask, L)
            return out
        tt = timeit(run, iters=3, warmup=1)
        results[L] = tt
        print(json.dumps({"probe": f"greedy_L{L}_ms",
                          "value": round(tt * 1e3, 2)}))
    slope = (results[96] - results[48]) / 48
    intercept = results[96] - slope * 96
    print(json.dumps({"probe": "per_step_ms", "value": round(slope * 1e3, 3),
                      "fixed_overhead_ms": round(intercept * 1e3, 2)}))

    # 3. standalone decode_step, loop-free
    dec = model.decoder if hasattr(model, "decoder") else None
    cparams = jax.jit(lambda p: _cast_params_to_compute_dtype(p, model))(params)
    l1 = 97

    @jax.jit
    def mk_cache(params, enc_out):
        return model.apply({"params": params}, enc_out, l1, method="init_cache")

    cache = mk_cache(cparams, enc_out)
    materialize(jax.tree.leaves(cache)[0])
    prev = jnp.full((b, 1), spec.bos_index, jnp.int32)
    idx = jnp.int32(5)

    @jax.jit
    def one_step(params, prev, idx, cache, enc_mask):
        logits, cache2, _ = model.apply(
            {"params": params}, prev, idx, cache, enc_mask,
            method="decode_step")
        return logits

    t_step = timeit(one_step, cparams, prev, idx, cache, enc_mask, iters=20,
                    warmup=3)
    print(json.dumps({"probe": "standalone_step_ms",
                      "value": round(t_step * 1e3, 3)}))

    # 4. component isolation via the decoder module methods
    # reuse decode_step but stub parts? Instead: time sub-batches of the
    # cache reads with raw einsums matching step shapes.
    h, nh, dh, s_sub = 512, 4, 128, enc_out.shape[1]
    # (B, H, S, D) cache layout (decoders.init_cache)
    q1 = jnp.ones((b, nh, 1, dh), jnp.bfloat16)
    ck = jnp.ones((b, nh, s_sub, dh), jnp.bfloat16)
    cv = jnp.ones((b, nh, s_sub, dh), jnp.bfloat16)
    sk = jnp.ones((b, nh, l1, dh), jnp.bfloat16)
    sv = jnp.ones((b, nh, l1, dh), jnp.bfloat16)

    @jax.jit
    def cross_reads(q1, ck, cv):
        # 8 layers of cross attention reads; q varied per "layer" to block CSE
        out = jnp.zeros((), jnp.float32)
        q = q1
        for _ in range(8):
            sc = jnp.einsum("bhqd,bhkd->bhqk", q, ck,
                            preferred_element_type=jnp.float32)
            w = jax.nn.softmax(sc, -1).astype(jnp.bfloat16)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w, cv)
            out = out + ctx.astype(jnp.float32).sum()
            q = q + 0.001 * ctx
        return out

    @jax.jit
    def self_reads(q1, sk, sv):
        out = jnp.zeros((), jnp.float32)
        q = q1
        for _ in range(8):
            sc = jnp.einsum("bhqd,bhkd->bhqk", q, sk,
                            preferred_element_type=jnp.float32)
            w = jax.nn.softmax(sc, -1).astype(jnp.bfloat16)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w, sv)
            out = out + ctx.astype(jnp.float32).sum()
            q = q + 0.001 * ctx
        return out

    x1 = jnp.ones((b, 1, h), jnp.bfloat16)
    w_ffn1 = jnp.ones((h, 2048), jnp.bfloat16)
    w_ffn2 = jnp.ones((2048, h), jnp.bfloat16)
    w_qkv = jnp.ones((h, 3 * h), jnp.bfloat16)
    w_o = jnp.ones((h, h), jnp.bfloat16)
    w_out = jnp.ones((h, 5000), jnp.bfloat16)

    @jax.jit
    def weight_reads(x1):
        out = jnp.zeros((), jnp.float32)
        x = x1
        for _ in range(8):
            x = jnp.maximum(x @ w_ffn1, 0) @ w_ffn2
            x = (x @ w_qkv)[..., :h] @ w_o
        out = (x @ w_out).astype(jnp.float32).sum()
        return out

    for name, fn, fargs in [("cross_reads_8L_ms", cross_reads, (q1, ck, cv)),
                            ("self_reads_8L_ms", self_reads, (q1, sk, sv)),
                            ("weight_reads_8L_ms", weight_reads, (x1,))]:
        tt = timeit(fn, *fargs, iters=20, warmup=3)
        print(json.dumps({"probe": name, "value": round(tt * 1e3, 3)}))

    # HBM traffic estimates for context
    bytes_cross = 8 * 2 * b * s_sub * h * 2
    bytes_self = 8 * 2 * b * l1 * h * 2
    bytes_w = 2 * (8 * (4 * h * h + 2 * h * h + 2 * h * 2048) + h * 5000)
    print(json.dumps({"probe": "hbm_bytes_per_step_MB", "cross":
                      round(bytes_cross / 1e6, 1), "self":
                      round(bytes_self / 1e6, 1), "weights":
                      round(bytes_w / 1e6, 1), "s_sub": int(s_sub)}))


if __name__ == "__main__":
    main()
