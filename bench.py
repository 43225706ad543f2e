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

# Persistent compilation cache: decode-loop compiles through the remote
# relay take minutes; cached executables cut warm runs to seconds.
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _bench_int8_greedy(params, spec, batch_size, n_frames, max_output_length,
                       n_iters=3):
    """Greedy RTFx with int8 decode caches (serving knob, off by default).

    Cross K/V quantized per-(head, channel), self ring buffers
    per-position; scales folded into q/ctx so no dequantized copy is ever
    materialized. Quality: tokens track the float cache on trained models
    (tests/test_search.py TestInt8CrossCache); measured +28% RTFx at
    B=1024 over the bf16 caches (docs/benchmarks_s2t.md)."""
    from __graft_entry__ import _build
    from joeys2t_tpu.search import transformer_greedy

    model_q, _ = _build(cache_int8=True)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(batch_size, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch_size,), n_frames, jnp.int32)

    @jax.jit
    def encode(params, src, src_length):
        return model_q.apply({"params": params}, src, src_length, None,
                             method="encode")

    enc_out, _, enc_mask = encode(params, src, src_length)
    out, _, _ = transformer_greedy(params, model_q, spec, enc_out, enc_mask,
                                   max_output_length)  # compile + warm
    start = time.perf_counter()
    for _ in range(n_iters):
        enc_out, _, enc_mask = encode(params, src, src_length)
        out, _, _ = transformer_greedy(params, model_q, spec, enc_out,
                                       enc_mask, max_output_length)
    assert isinstance(out, np.ndarray)
    elapsed = time.perf_counter() - start
    rtfx = batch_size * 10.0 * n_iters / elapsed
    return {"greedy_int8_cache_RTFx": round(rtfx, 2)}


def _bench_beam_p50(model, spec, params, batch_size=32, n_frames=1000,
                    beam_size=5, max_output_length=96, iters=3):
    """Beam k=5 latency per utterance (BASELINE.json north star)."""
    from joeys2t_tpu.search import beam_search

    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(batch_size, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch_size,), n_frames, jnp.int32)

    @jax.jit
    def encode(params, src, src_length):
        return model.apply({"params": params}, src, src_length, None,
                           method="encode")

    enc_out, _, enc_mask = encode(params, src, src_length)
    out = beam_search(params, model, spec, enc_out, None, enc_mask,
                      beam_size, max_output_length, alpha=1.0, n_best=1)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        enc_out, _, enc_mask = encode(params, src, src_length)
        out, scores, _ = beam_search(params, model, spec, enc_out, None,
                                     enc_mask, beam_size, max_output_length,
                                     alpha=1.0, n_best=1)
        assert isinstance(out, np.ndarray)  # host array == synced
        times.append(time.perf_counter() - start)
    p50 = sorted(times)[len(times) // 2]
    return {"beam_p50_ms_per_utt": round(p50 / batch_size * 1e3, 2),
            "beam_batch_size": batch_size, "beam_size": beam_size}


def _bench_train_step(model, spec, params, batch_size=192, n_frames=1000,
                      trg_len=48, iters=5):
    """Training throughput: audio seconds consumed per wall second per chip.

    B=192 is the measured per-chip sweet spot after the round-3 step work
    (10.1k audio-s/s, 46% MFU vs 9.3k/42% at B=128; B=256 regresses under
    HBM pressure — scripts/probe_train_batch.py)."""
    import optax

    from joeys2t_tpu.losses import XentCTCLoss

    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(batch_size, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch_size,), n_frames, jnp.int32)
    trg = jnp.asarray(
        rng.randint(4, 1000, size=(batch_size, trg_len)).astype(np.int32))
    trg_input = trg[:, :-1]
    trg_out = trg[:, 1:]
    trg_mask = jnp.ones((batch_size, 1, trg_len - 1), bool)
    trg_length = jnp.full((batch_size,), trg_len - 1, jnp.int32)
    loss_fn = XentCTCLoss(pad_index=spec.pad_index, bos_index=spec.bos_index,
                          smoothing=0.1, ctc_weight=0.3)
    tx = optax.adamw(1e-4)
    # the step below donates its state args; copy so the caller's params
    # survive and this helper stays re-entrant
    params = jax.tree.map(jnp.copy, params)
    opt_state = tx.init(params)

    from functools import partial

    # donate like the real TrainManager step: state is updated in place
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, dummy):
        def loss(p):
            logits, ctc_logits, out_mask = model.apply(
                {"params": p}, src + dummy, trg_input, src_length, None,
                trg_mask, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            total, _, _ = loss_fn(lp, trg=trg_out, trg_length=trg_length,
                                  src_mask=out_mask, ctc_logits=ctc_logits)
            return total / batch_size

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    # THE pinned MFU formula (resolves the r2 24%-vs-32% doc conflict; see
    # docs/benchmarks_s2t.md "Training efficiency"): 6N FLOPs/token fwd+bwd,
    # attributing each stack's params to its own tokens — encoder params to
    # post-subsample frames (T/4), decoder+embedding params to target tokens.
    # Charging all params to all tokens would overcount ~2x for an
    # encoder-decoder model. Attention scores, conv subsampler and CTC are
    # excluded (lower bound). v5e bf16 peak = 197 TFLOP/s.
    def _count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    n_sub = _count(params["encoder"].get("subsampler", {}))
    n_enc = _count(params["encoder"]) - n_sub  # subsampler excluded, per above
    n_all = _count(params)
    model_flops = 6.0 * batch_size * (n_enc * (n_frames // 4)
                                      + (n_all - n_enc - n_sub) * (trg_len - 1))

    p, o, l = train_step(params, opt_state, jnp.float32(0))
    np.asarray(l)  # force completion (remote backend)
    start = time.perf_counter()
    for i in range(iters):
        p, o, l = train_step(p, o, jnp.float32(i) * 1e-9)
    np.asarray(l)
    elapsed = (time.perf_counter() - start) / iters
    audio_sec = batch_size * 10.0
    return {"train_audio_sec_per_sec_per_chip": round(audio_sec / elapsed, 1),
            "train_step_ms": round(elapsed * 1e3, 1),
            "train_batch_size": batch_size,
            "est_mfu_pct": round(100.0 * model_flops / elapsed / 197e12, 1)}


def _bench_conformer_train(batch_size=64, n_frames=1000, trg_len=48):
    """Conformer-flagship train throughput (16L paper-macaron + layerscale,
    132M — the better-converging recipe, docs/benchmarks_s2t.md). B=64 is
    its measured per-chip sweet spot (scripts/probe_conformer_train.py);
    B>=96 crosses the memory knee and XLA auto-remat sets in."""
    import jax
    import numpy as np

    from __graft_entry__ import _s2t_model_cfg
    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.vocabulary import Vocabulary

    vocab = Vocabulary([f"tok{i}" for i in range(5000)], SpecialSymbols())
    cfg = _s2t_model_cfg()
    cfg["encoder"].update(type="conformer", macaron="paper", layerscale=0.1,
                          depthwise_conv_kernel_size=31)
    model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab,
                              compute_dtype=jnp.bfloat16)
    src0 = jnp.zeros((2, 16, 80), jnp.float32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, src0, jnp.ones((2, 8), jnp.int32),
        jnp.full((2,), 16, jnp.int32), None, jnp.ones((2, 1, 8), bool),
        deterministic=True)["params"]
    r = _bench_train_step(model, spec, params, batch_size=batch_size,
                          n_frames=n_frames, trg_len=trg_len)
    return {"conformer_" + k: v for k, v in r.items()}


def main():
    from __graft_entry__ import _build
    from joeys2t_tpu.search import transformer_greedy

    model, spec = _build()  # 16L enc / 8L dec / h512 / ff2048, bf16 compute

    batch_size = 1024  # throughput saturates here (see docs/benchmarks_s2t.md);
    # compile time is amortized by the persistent cache above
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

    # Free the B=1024 decode buffers before the remaining benches: leaving
    # them alive alongside the B=192 train state (params copy + f32 adam
    # moments + activations) oversubscribes the 16GB HBM and the train step
    # degrades ~12x (measured 2265ms vs 189ms standalone) without erroring.
    del src, src_length, enc_out, enc_mask, out

    # remaining north stars (BASELINE.json): beam p50 latency + train
    # throughput, so the driver-recorded JSON catches regressions there too
    extra = {}
    degraded = False
    try:
        extra.update(_bench_beam_p50(model, spec, params))
    except Exception as e:  # never lose the headline metric...
        extra["beam_error"] = str(e)[:200]
        degraded = True  # ...but a broken north-star path must fail the run
    try:
        extra.update(_bench_train_step(model, spec, params))
    except Exception as e:
        extra["train_error"] = str(e)[:200]
        degraded = True
    try:
        extra.update(_bench_conformer_train())
    except Exception as e:
        extra["conformer_train_error"] = str(e)[:200]
        degraded = True
    try:
        extra.update(_bench_int8_greedy(params, spec, batch_size, n_frames,
                                        max_output_length))
    except Exception as e:  # serving knob, not a north star: report only
        extra["int8_error"] = str(e)[:200]

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
            **extra,
        },
    }
    if degraded:
        result["degraded"] = True
    print(json.dumps(result))
    if degraded:
        # beam or train north-star metric silently missing would otherwise
        # look like a healthy run (VERDICT r2 weak #6)
        sys.exit(1)


if __name__ == "__main__":
    main()
