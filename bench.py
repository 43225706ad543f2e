#!/usr/bin/env python
# coding: utf-8
"""
Benchmark: KV-cached greedy ASR decoding throughput on the flagship
(librispeech_100h-sized) S2T model, run on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: RTFx — seconds of audio decoded per wall-clock second per chip
(batch of 10s utterances, fbank frames precomputed, greedy decode to 100
tokens with the jit-compiled KV-cache loop). The reference publishes no
throughput numbers (BASELINE.md), so vs_baseline is reported against 1x
real time.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _build
    from joeys2t_tpu.search import transformer_greedy

    model, spec = _build()  # 16L enc / 8L dec / h512 / ff2048, bf16 compute

    batch_size = 256  # throughput climbs with batch (see docs/benchmarks_s2t.md)
    audio_seconds = 10.0
    n_frames = 1000  # 10s at 10ms shift
    max_output_length = 96

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(batch_size, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch_size,), n_frames, jnp.int32)

    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, src, jnp.ones((batch_size, 8), jnp.int32),
        src_length, None, jnp.ones((batch_size, 1, 8), bool),
        deterministic=True)["params"]

    @jax.jit
    def encode(params, src, src_length):
        return model.apply({"params": params}, src, src_length, None,
                           method="encode")

    # warmup + compile (encoder and greedy loop)
    enc_out, _, enc_mask = encode(params, src, src_length)
    enc_out.block_until_ready()
    out, _, _ = transformer_greedy(params, model, spec, enc_out, enc_mask,
                                   max_output_length)

    # timed runs: full pipeline encode + greedy decode. transformer_greedy
    # returns host numpy arrays, which forces real completion each iteration
    # (jax.block_until_ready alone does not wait on the remote-TPU backend).
    n_iters = 5
    start = time.perf_counter()
    for _ in range(n_iters):
        enc_out, _, enc_mask = encode(params, src, src_length)
        out, _, _ = transformer_greedy(params, model, spec, enc_out, enc_mask,
                                       max_output_length)
    assert isinstance(out, np.ndarray)  # host array == synced
    elapsed = time.perf_counter() - start

    total_audio = batch_size * audio_seconds * n_iters
    rtfx = total_audio / elapsed
    utts_per_sec = batch_size * n_iters / elapsed

    result = {
        "metric": "asr_greedy_decode_RTFx",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx, 2),  # baseline = 1x real time
        "detail": {
            "utterances_per_sec_per_chip": round(utts_per_sec, 2),
            "batch_size": batch_size,
            "audio_seconds_per_utt": audio_seconds,
            "max_output_length": max_output_length,
            "model": "librispeech_100h dims (16L enc, 8L dec, h512, bf16)",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
