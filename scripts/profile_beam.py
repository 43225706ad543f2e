#!/usr/bin/env python
# coding: utf-8
"""Device-profile decomposition of the beam-search decode loop (VERDICT r3
#5: beam k=5 B=32 p50 target <=5.0ms/utt; measured 5.56 with cross-int8 +
ancestry self caches).

Traces one beam_search call and rolls up the while-body ops by category so
the residual above the HBM roofline (~0.65ms/step vs ~1.74 measured) gets
names: einsum efficiency, layout copies, topk, blocker, cache writes.

Usage: python -u scripts/profile_beam.py [batch] [beam]
"""
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

from __graft_entry__ import _build
from bench import _init_flagship_params
from joeys2t_tpu.search import beam_search


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_frames, max_len = 1000, 96
    out_dir = "/tmp/beam_profile"

    model, spec = _build(cache_cross_int8=True)
    params = _init_flagship_params(model)
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))
    src_length = jnp.full((batch,), n_frames, jnp.int32)

    @jax.jit
    def encode(params, src, src_length):
        return model.apply({"params": params}, src, src_length, None,
                           method="encode")

    enc_out, _, enc_mask = encode(params, src, src_length)
    out = beam_search(params, model, spec, enc_out, None, enc_mask, k,
                      max_len, alpha=1.0, n_best=1)  # compile + warm
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        out = beam_search(params, model, spec, enc_out, None, enc_mask, k,
                          max_len, alpha=1.0, n_best=1)
        assert isinstance(out[0], np.ndarray)
    wall = time.perf_counter() - t0

    paths = sorted(glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True),
                   key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    lanes = {(e["pid"], e["tid"]) for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"
             and e["pid"] in tpu_pids
             and e.get("args", {}).get("name") == "XLA Ops"}
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in lanes:
            durs[e["name"]] += e.get("dur", 0) / 1e3
            counts[e["name"]] += 1
    total = sum(durs.values())
    print(json.dumps({"bench": "beam_profile", "batch": batch, "beam": k,
                      "wall_ms": round(wall * 1e3, 1),
                      "device_busy_ms": round(total, 1),
                      "ms_per_step": round(total / max_len, 3)}))
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{d:8.2f} ms  x{counts[name]:5d}  {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
