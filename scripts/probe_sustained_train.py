# coding: utf-8
"""Decompose SUSTAINED training wall-time per step on the real CLI path.

The isolated train-step bench (bench.py --section train) measures the
jitted step alone at 10.4k audio-sec/s/chip, but the round-3 flagship
synthetic-ASR run sustained only ~210 audio-sec/s end-to-end (6,000
updates in 77 min at ~164 audio-sec per B=64 batch). This probe breaks a
real `configs/synthetic_asr.yaml` training loop into its cost centers:

  A. host pipeline: batch_sampler -> np.load features -> CMVN/SpecAugment
     -> tokenize -> collate -> pad_to_shape         (pure host, no device)
  B. upload: device_put of the padded arrays through the axon tunnel
     (per-array loop vs ONE pytree call; sync via a 1-element fetch)
  C. full loop: exactly what TrainManager.train_and_validate does per
     step (prepare + dispatch, deferred metrics), steps/sec after warmup

Usage: python scripts/probe_sustained_train.py [--steps 60]
"""
import argparse
import functools
print = functools.partial(print, flush=True)
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--config", default="configs/synthetic_asr.yaml")
    ap.add_argument("--batch-size", type=int, default=0,
                    help="override training.batch_size")
    ap.add_argument("--section", default="ABC",
                    help="subset of phases to run, e.g. C")
    ap.add_argument("--prefetch", action="store_true",
                    help="phase C uses the TrainManager _prefetch_prepared "
                         "pipeline (host prep + upload issue overlap compute)")
    ap.add_argument("--multihost", type=int, default=0, metavar="N",
                    help="orchestrate N local CPU-backend ranks and compare "
                         "phase C through _multihost_sync_stream with the "
                         "lockstep prefetch worker ON vs OFF")
    ap.add_argument("--rank", type=int, default=-1, help=argparse.SUPPRESS)
    ap.add_argument("--nproc", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--port", default="", help=argparse.SUPPRESS)
    ap.add_argument("--no-lockstep-prefetch", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.multihost > 0:
        return run_multihost_compare(args)
    if args.rank >= 0:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nproc, process_id=args.rank)

    from joeys2t_tpu.config import load_config, parse_global_args, \
        set_validation_args
    from joeys2t_tpu.prediction import prepare
    from joeys2t_tpu.training import TrainManager, _batch_to_arrays

    cfg = load_config(args.config)
    cfg["training"]["updates"] = 10 ** 9
    cfg["training"]["validation_freq"] = 10 ** 9
    cfg["training"]["logging_freq"] = 10 ** 9
    cfg["model_dir"] = "/tmp/probe_sustained"
    Path("/tmp/probe_sustained").mkdir(parents=True, exist_ok=True)
    cfg["training"]["overwrite"] = True
    if args.batch_size:
        cfg["training"]["batch_size"] = args.batch_size
    gargs = parse_global_args(cfg, rank=0, mode="train")
    model, spec, params, loss_fn, train_data, dev_data, _ = prepare(
        gargs, rank=0, mode="train")
    trainer = TrainManager(
        model=model, spec=spec, params=params, loss_fn=loss_fn,
        model_dir=gargs.model_dir, task=gargs.task, seed=gargs.seed,
        train_args=gargs.train, dev_args=set_validation_args(gargs.test),
        num_workers=gargs.num_workers, model_cfg=gargs.model)

    train_iter, sampler = train_data.make_iter(
        batch_size=trainer.args.batch_size,
        batch_type=trainer.args.batch_type,
        seed=trainer.seed, shuffle=True, num_workers=gargs.num_workers,
        eos_index=spec.eos_index, pad_index=spec.pad_index,
        return_sampler=True)

    # ---- A. host pipeline ------------------------------------------------
    if "A" not in args.section and "B" not in args.section:
        run_c(args, trainer, train_data, gargs, spec)
        return
    n = 0
    t0 = time.perf_counter()
    batches = []
    audio_sec = 0.0
    for batch in train_iter:
        nseqs, ntok, = batch.nseqs, batch.ntokens
        audio_sec += float(np.sum(batch.src_length)) * 0.01
        padded = batch.pad_to_shape(batch_size=max(
            trainer.args.batch_size, nseqs))
        arrays = _batch_to_arrays(padded)
        if len(batches) < 4:
            batches.append(arrays)
        n += 1
        if n >= args.steps:
            break
    host_s = time.perf_counter() - t0
    shapes = {k: (v.shape, str(v.dtype)) for k, v in batches[0].items()
              if v is not None}
    nbytes = sum(v.nbytes for v in batches[0].values() if v is not None)
    print(f"A. host pipeline: {1000*host_s/n:.1f} ms/batch "
          f"({n} batches, {audio_sec/n:.1f} audio-sec/batch, "
          f"{nbytes/1e6:.1f} MB/batch)")
    for k, v in shapes.items():
        print(f"   {k}: {v}")

    # ---- B. upload -------------------------------------------------------
    from joeys2t_tpu.parallel import shard_batch_arrays

    def sync(tree):
        leaves = [v for v in jax.tree.leaves(tree) if v is not None]
        np.asarray(jax.device_get(leaves[-1].ravel()[0]))

    for name, fn in [
        ("per-array loop (current shard_batch_arrays)",
         lambda a: shard_batch_arrays(a, trainer.mesh)),
        ("ONE pytree device_put",
         lambda a: jax.device_put(
             {k: v for k, v in a.items() if v is not None},
             trainer.mesh.data_sharding)),
    ]:
        out = fn(batches[0]); sync(out)  # warm
        t0 = time.perf_counter()
        reps = 8
        for i in range(reps):
            out = fn(batches[i % len(batches)])
            sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"B. upload [{name}]: {1000*dt:.1f} ms/batch "
              f"({nbytes/1e6/dt:.0f} MB/s)")

    # does device_put block the calling thread for the transfer, or return
    # immediately? (decides whether a background-upload thread can help)
    t0 = time.perf_counter()
    puts = [shard_batch_arrays(batches[i % len(batches)], trainer.mesh)
            for i in range(4)]
    t_call = time.perf_counter() - t0
    for p in puts:
        sync(p)
    t_total = time.perf_counter() - t0
    print(f"B2. put call-return: {1000*t_call/4:.1f} ms/batch issued, "
          f"{1000*t_total/4:.1f} ms/batch drained "
          f"(blocking fraction {t_call/t_total:.2f})")

    # bf16 cast on host: upload-byte halving candidate for the f32 features
    import ml_dtypes
    t0 = time.perf_counter()
    for i in range(8):
        b = dict(batches[i % len(batches)])
        b["src"] = b["src"].astype(ml_dtypes.bfloat16)
    cast_ms = (time.perf_counter() - t0) / 8 * 1000
    nb16 = sum(v.nbytes for v in b.values() if v is not None)
    out = shard_batch_arrays(b, trainer.mesh); sync(out)
    t0 = time.perf_counter()
    for i in range(8):
        bb = dict(batches[i % len(batches)])
        bb["src"] = bb["src"].astype(ml_dtypes.bfloat16)
        out = shard_batch_arrays(bb, trainer.mesh)
        sync(out)
    dt = (time.perf_counter() - t0) / 8
    print(f"B3. bf16 features: cast {cast_ms:.1f} ms + upload "
          f"{1000*dt - cast_ms:.1f} ms = {1000*dt:.1f} ms/batch "
          f"({nb16/1e6:.1f} MB, {nb16/1e6/dt:.0f} MB/s)")

    # ---- C. full loop ----------------------------------------------------
    if "C" in args.section:
        run_c(args, trainer, train_data, gargs, spec)


def run_multihost_compare(args):
    """Spawn N local CPU ranks twice (lockstep prefetch worker on/off) and
    report the sustained phase-C step time of each — the measurement for
    the multi-host host-prep overlap (training._multihost_sync_stream)."""
    import socket
    import subprocess

    for label, extra in [("prefetch ON ", []),
                         ("prefetch OFF", ["--no-lockstep-prefetch"])]:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        cmd = [sys.executable, __file__, "--section", "C",
               "--steps", str(args.steps), "--config", args.config,
               "--nproc", str(args.multihost), "--port", port] + extra
        if args.batch_size:
            cmd += ["--batch-size", str(args.batch_size)]
        import os

        env = {**os.environ,
               "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
               "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
        procs = [subprocess.Popen(cmd + ["--rank", str(i)],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, env=env)
                 for i in range(args.multihost)]
        outs = [p.communicate()[0].decode() for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {i} failed:\n{out[-2000:]}"
        line = [ln for ln in outs[0].splitlines() if ln.startswith("C. ")][0]
        print(f"multihost x{args.multihost} [{label}] {line}")


def run_c(args, trainer, train_data, gargs, spec):
    train_iter = train_data.make_iter(
        batch_size=trainer.args.batch_size, batch_type=trainer.args.batch_type,
        seed=trainer.seed + 1, shuffle=True, num_workers=gargs.num_workers,
        eos_index=spec.eos_index, pad_index=spec.pad_index)

    def prepare(batch, sync_dims):
        out = trainer._prepare_batch(batch, sync_dims)
        return (float(np.sum(batch.src_length)) * 0.01,) + out

    if jax.process_count() > 1:
        from joeys2t_tpu.training import _multihost_sync_stream
        stream = _multihost_sync_stream(
            train_iter, trainer.args.batch_size,
            trainer.mesh.mesh.shape["data"],
            prefetch=not args.no_lockstep_prefetch)
        prepared = (prepare(b, sd) for b, sd in stream)
    elif args.prefetch:
        from joeys2t_tpu.training import _prefetch_prepared
        prepared = _prefetch_prepared(
            ((b, None) for b in train_iter), prepare)
    else:
        prepared = (prepare(b, None) for b in train_iter)
    pending = []
    warmup = 3
    t_start = None
    audio_sec = 0.0
    nsteps = 0
    step_ms = []
    t_prev = time.perf_counter()
    for i, (audio_s, nseqs_real, ntokens_real, arrays,
            normalizer) in enumerate(prepared):
        if i >= args.steps + warmup:
            break
        if i == warmup:
            # flush compile/dispatch pipeline, then start the clock
            np.asarray(jax.device_get(pending[0]))
            t_start = time.perf_counter()
            t_prev = t_start
            audio_sec = 0.0
        trainer._dropout_rng, step_rng = jax.random.split(trainer._dropout_rng)
        trainer.params, trainer.opt_state, metrics = trainer._jit_train_step(
            trainer.params, trainer.opt_state, step_rng, arrays, normalizer)
        pending = metrics
        if i >= warmup:
            audio_sec += audio_s
            nsteps += 1
            t_now = time.perf_counter()
            step_ms.append(1000 * (t_now - t_prev))
            print(f"   step {nsteps}: {step_ms[-1]:.0f} ms "
                  f"(src={arrays['src'].shape} trg={arrays['trg'].shape})")
            t_prev = t_now
    np.asarray(jax.device_get(pending[0]))  # drain the device queue
    wall = time.perf_counter() - t_start
    med = float(np.median(step_ms))
    print(f"C. full loop: {1000*wall/nsteps:.1f} ms/step mean, {med:.1f} "
          f"median ({nsteps} steps, {audio_sec/wall:.0f} audio-sec/s/chip)")
    print("   per-step ms:", " ".join(f"{m:.0f}" for m in step_ms))


if __name__ == "__main__":
    main()
