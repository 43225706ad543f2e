#!/usr/bin/env python
# coding: utf-8
"""Probe: greedy decode throughput at large batch vs cache quantization.

Round-2 measured cache_cross_int8 at +4% (B=256) BEFORE the scale-folding
formulation (fold per-channel K scale into q, V scale into ctx — no
dequantized copy). Cross K/V reads are 4.19GB of the ~5.1GB/step HBM
traffic at B=1024, so if the folded int8 path really halves that traffic
the headline RTFx ceiling moves substantially. This re-measures at the
bench configuration (B=1024, 10s utterances, 96 steps).

Usage: python -u scripts/probe_int8_greedy.py [batch_size]
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
from joeys2t_tpu.search import transformer_greedy
from joeys2t_tpu.vocabulary import Vocabulary


def build(cross_int8: bool, self_int8: bool):
    vocab = Vocabulary([f"tok{i}" for i in range(5000)], SpecialSymbols())
    cfg = _s2t_model_cfg()
    cfg["decoder"]["cache_cross_int8"] = cross_int8
    cfg["decoder"]["cache_self_int8"] = self_int8
    return build_model(cfg, src_vocab=None, trg_vocab=vocab,
                       compute_dtype=jnp.bfloat16)


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_frames, max_len, iters = 1000, 96, 5
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(batch_size, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch_size,), n_frames, jnp.int32)

    params = None
    baseline_tokens = None
    for cross_int8, self_int8 in [(False, False), (True, False), (True, True)]:
        model, spec = build(cross_int8, self_int8)
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
        out, _, _ = transformer_greedy(params, model, spec, enc_out, enc_mask,
                                       max_len)  # compile + warm
        start = time.perf_counter()
        for _ in range(iters):
            enc_out, _, enc_mask = encode(params, src, src_length)
            out, _, _ = transformer_greedy(params, model, spec, enc_out,
                                           enc_mask, max_len)
        assert isinstance(out, np.ndarray)
        elapsed = time.perf_counter() - start
        rtfx = batch_size * 10.0 * iters / elapsed
        if baseline_tokens is None:
            baseline_tokens = out
            match = 1.0
        else:
            match = float((out == baseline_tokens).mean())
        print(f"cross_int8={cross_int8} self_int8={self_int8}: "
              f"RTFx {rtfx:.0f}  ({elapsed/iters*1e3:.0f} ms/iter, "
              f"token match vs float {match:.4f})", flush=True)


if __name__ == "__main__":
    main()
