#!/usr/bin/env python
# coding: utf-8
"""Device-profile decomposition of the flagship train step (VERDICT r3 #1).

Runs the B=128 jitted train step (same shapes as bench.py) under
jax.profiler.trace — which works through the axon tunnel — then parses the
trace.json.gz, keeps the /device:TPU plane, and prints:
  - total device-busy time per step
  - top-N individual fusions by duration
  - a category rollup (matmul / flash-attn / conv / ctc-scan / copies /
    elementwise-fusions / optimizer)
One JSON line per section.
"""
import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_step(batch=128, n_frames=1000, trg_len=48, encoder="transformer"):
    import optax

    from __graft_entry__ import _build, _s2t_model_cfg
    from joeys2t_tpu.losses import XentCTCLoss
    from functools import partial

    if encoder == "conformer":
        # flagship conformer recipe (configs/synthetic_asr_conformer.yaml):
        # 16L, paper macaron + layerscale 0.1, depthwise kernel 31
        from joeys2t_tpu.config import SpecialSymbols
        from joeys2t_tpu.models import build_model
        from joeys2t_tpu.vocabulary import Vocabulary

        cfg = _s2t_model_cfg()
        cfg["encoder"].update(type="conformer", macaron="paper",
                              layerscale=0.1, depthwise_conv_kernel_size=31)
        vocab = Vocabulary([f"tok{i}" for i in range(5000)], SpecialSymbols())
        model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab,
                                  compute_dtype=jnp.bfloat16)
    else:
        model, spec = _build()
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch,), n_frames, jnp.int32)
    trg = jnp.asarray(rng.randint(4, 1000, size=(batch, trg_len)).astype(np.int32))
    trg_input, trg_out = trg[:, :-1], trg[:, 1:]
    trg_mask = jnp.ones((batch, 1, trg_len - 1), bool)
    trg_length = jnp.full((batch,), trg_len - 1, jnp.int32)
    loss_fn = XentCTCLoss(pad_index=spec.pad_index, bos_index=spec.bos_index,
                          smoothing=0.1, ctc_weight=0.3)
    tx = optax.adamw(1e-4)
    init_src = jnp.asarray(rng.randn(2, 16, 80).astype(np.float32))
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, init_src, jnp.ones((2, 8), jnp.int32),
        jnp.full((2,), 16, jnp.int32), None, jnp.ones((2, 1, 8), bool),
        deterministic=True)["params"]
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, dummy):
        def loss(p):
            logits, ctc_logits, out_mask = model.apply(
                {"params": p}, src + dummy, trg_input, src_length, None,
                trg_mask, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            total, _, _ = loss_fn(lp, trg=trg_out, trg_length=trg_length,
                                  src_mask=out_mask, ctc_logits=ctc_logits)
            return total / batch

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _o
        return _o.apply_updates(params, updates), opt_state, l

    return train_step, params, opt_state


CATEGORIES = [
    ("ctc", ("while", "scan", "ctc")),       # the CTC DP scan lowers to while
    ("flash_attn", ("custom-call", "tpu_custom_call", "flash", "pallas",
                    "src_src_att", "src_trg_att", "trg_trg_att")),
    ("convert", ("convert",)),               # before "conv": dtype casts
    ("conv", ("conv",)),
    ("matmul", ("dot", "gemm", "einsum")),
    ("copy", ("copy", "transpose", "bitcast")),
    ("reduce", ("reduce", "softmax", "logsumexp")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    if "fusion" in low:
        return "fusion_elementwise"
    return "other"


def parse_trace(trace_dir: Path, top_n: int = 25):
    """Sum leaf op durations on the TPU plane's "XLA Ops" lane only —
    summing every event double-counts (the Steps / XLA Modules lanes
    contain the ops)."""
    import re

    paths = sorted(glob.glob(str(trace_dir / "**" / "*.trace.json.gz"),
                             recursive=True), key=lambda p: Path(p).stat().st_mtime)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_lanes = {(e["pid"], e["tid"]) for e in events
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in tpu_pids
                and e.get("args", {}).get("name") == "XLA Ops"}
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_lanes:
            base = re.sub(r"[.\d]+$", "", e["name"])  # group fusion.123 etc.
            durs[base] += e.get("dur", 0) / 1e3  # us -> ms
            counts[base] += 1
    total = sum(durs.values())
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:top_n]
    cats = defaultdict(float)
    for name, d in durs.items():
        cats[categorize(name)] += d
    return total, top, dict(cats), counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--encoder", default="transformer",
                    choices=["transformer", "conformer"])
    ap.add_argument("--out", default="/tmp/train_profile")
    args = ap.parse_args()

    step, params, opt_state = build_step(batch=args.batch,
                                         encoder=args.encoder)
    p, o, l = step(params, opt_state, jnp.float32(0))
    np.asarray(l)  # compile + settle

    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            p, o, l = step(p, o, jnp.float32(i) * 1e-9)
        np.asarray(l)
    wall = (time.perf_counter() - t0) / args.steps

    total, top, cats, counts = parse_trace(Path(args.out))
    per_step = total / args.steps
    print(json.dumps({"bench": "train_profile", "batch": args.batch,
                      "encoder": args.encoder,
                      "wall_ms_per_step": round(wall * 1e3, 1),
                      "device_busy_ms_per_step": round(per_step, 1)}))
    print(json.dumps({"categories_ms_per_step":
                      {k: round(v / args.steps, 1)
                       for k, v in sorted(cats.items(), key=lambda kv: -kv[1])}}))
    for name, d in top:
        print(json.dumps({"op": name[:110], "ms_per_step": round(d / args.steps, 2),
                          "calls": counts[name] // args.steps}))


if __name__ == "__main__":
    main()
