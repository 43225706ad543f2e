#!/usr/bin/env python
# coding: utf-8
"""Probe: beam k=5 p50 latency with the int8 cross cache.

The ancestry-indexed beam path (round 3) keeps self caches in bf16 but the
cross caches — shared across each batch element's K beams — are read every
step; int8 halves that traffic with scales folded into q/ctx (no
dequantized copy). Round 2 measured int8 beam ~5% SLOWER, but that was the
pre-fold formulation on the physical-reorder beam.

Usage: python -u scripts/probe_int8_beam.py [batch_size]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _s2t_model_cfg
from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.search import beam_search
from joeys2t_tpu.vocabulary import Vocabulary


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_frames, max_len, iters, k = 1000, 96, 7, 5
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(batch_size, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch_size,), n_frames, jnp.int32)

    params = None
    for cross_int8 in [False, True]:
        vocab = Vocabulary([f"tok{i}" for i in range(5000)], SpecialSymbols())
        cfg = _s2t_model_cfg()
        cfg["decoder"]["cache_cross_int8"] = cross_int8
        model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab,
                                  compute_dtype=jnp.bfloat16)
        if params is None:
            params = jax.jit(
                model.init, static_argnames=("deterministic",))(
                {"params": jax.random.PRNGKey(0)}, src,
                jnp.ones((batch_size, 8), jnp.int32), src_length, None,
                jnp.ones((batch_size, 1, 8), bool),
                deterministic=True)["params"]

        @jax.jit
        def encode(p, s, sl):
            return model.apply({"params": p}, s, sl, None, method="encode")

        enc_out, _, enc_mask = encode(params, src, src_length)
        out = beam_search(params, model, spec, enc_out, None, enc_mask, k,
                          max_len, alpha=1.0, n_best=1)  # compile + warm
        times = []
        for _ in range(iters):
            start = time.perf_counter()
            enc_out, _, enc_mask = encode(params, src, src_length)
            out, scores, _ = beam_search(params, model, spec, enc_out, None,
                                         enc_mask, k, max_len, alpha=1.0,
                                         n_best=1)
            assert isinstance(out, np.ndarray)
            times.append(time.perf_counter() - start)
        p50 = sorted(times)[len(times) // 2]
        print(f"cross_int8={cross_int8}: beam k={k} B={batch_size} "
              f"p50 {p50 / batch_size * 1e3:.2f} ms/utt "
              f"({p50 * 1e3:.0f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
