# coding: utf-8
"""Decompose sustained-training wall-clock per step on real hardware.

The bench.py train number times the jitted step alone; a real CLI run pays
host collate, static-shape padding, host->device transfer, and the per-step
metric sync on top. This probe times each phase separately over N steps of
the synthetic ASR corpus (configs/synthetic_asr.yaml) so the gap between
device-step time and epoch wall-clock is attributable.

Usage: python -u scripts/probe_train_pipeline.py [n_steps] [batch_size]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, REPO.as_posix())

import jax  # noqa: E402
import yaml  # noqa: E402

from joeys2t_tpu.config import parse_global_args, set_validation_args  # noqa: E402
from joeys2t_tpu.prediction import prepare  # noqa: E402
from joeys2t_tpu.training import TrainManager  # noqa: E402


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    jax.config.update("jax_compilation_cache_dir",
                      (REPO / ".jax_cache").as_posix())
    cfg = yaml.safe_load(open(REPO / "configs/synthetic_asr.yaml"))
    cfg["model_dir"] = "/tmp/probe_pipeline_model"
    cfg["training"]["batch_size"] = batch_size
    cfg["training"]["overwrite"] = True
    args = parse_global_args(cfg, rank=0, mode="train")
    model, spec, params, loss_fn, train_data, dev_data, _ = prepare(
        args, rank=0, mode="train")
    trainer = TrainManager(
        model=model, spec=spec, params=params, loss_fn=loss_fn,
        model_dir=args.model_dir, task=args.task, seed=args.seed,
        train_args=args.train, dev_args=set_validation_args(args.test),
        num_workers=0, model_cfg=args.model)

    trainer.train_iter = train_data.make_iter(
        batch_size=batch_size,
        batch_type=trainer.args.batch_type,
        seed=trainer.seed,
        shuffle=True,
        num_workers=0,
        eos_index=spec.eos_index,
        pad_index=spec.pad_index,
    )

    t_collate = t_pad = t_put = t_step = t_sync = 0.0
    shapes = {}
    n = 0
    it = iter(trainer.train_iter)
    # warmup / compile for the buckets we'll hit: do a dry pass first
    print("timing", n_steps, "steps at B=%d ..." % batch_size, flush=True)
    t_epoch0 = time.perf_counter()
    while n < n_steps:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            it = iter(trainer.train_iter)
            continue
        t1 = time.perf_counter()
        nseqs_real, ntokens_real, arrays, normalizer = \
            trainer._prepare_batch(batch)
        t2 = time.perf_counter()
        trainer._dropout_rng, step_rng = jax.random.split(trainer._dropout_rng)
        trainer.params, trainer.opt_state, metrics = trainer._jit_train_step(
            trainer.params, trainer.opt_state, step_rng, arrays, normalizer)
        t3 = time.perf_counter()
        loss = float(metrics[0])
        t4 = time.perf_counter()
        key = (arrays["src"].shape, arrays["trg"].shape)
        first = key not in shapes
        shapes[key] = shapes.get(key, 0) + 1
        if first:
            # exclude compile steps from the totals
            print(f"  new shape {key} (compile) {t4 - t0:.2f}s", flush=True)
            continue
        t_collate += t1 - t0
        t_pad += t2 - t1
        t_step += t3 - t2
        t_sync += t4 - t3
        n += 1
        if n % 20 == 0:
            print(f"  {n}/{n_steps} loss={loss:.3f}", flush=True)
    wall = time.perf_counter() - t_epoch0

    tot = t_collate + t_pad + t_step + t_sync
    print(f"\nsteps timed: {n} (excl. {sum(shapes.values()) - n} compile "
          f"steps over {len(shapes)} shape buckets)")
    for name, v in [("host collate (tokenize+batch)", t_collate),
                    ("pad + device_put", t_pad),
                    ("step dispatch", t_step),
                    ("metric sync (float(loss))", t_sync)]:
        print(f"  {name:32s} {1e3 * v / n:8.1f} ms/step  {100 * v / tot:5.1f}%")
    print(f"  {'TOTAL per step':32s} {1e3 * tot / n:8.1f} ms/step")
    print(f"  wall incl. compiles: {wall:.1f}s")
    # traffic estimate
    b = arrays["src"]
    mb = sum(np.prod(v.shape) * v.dtype.itemsize
             for v in arrays.values() if v is not None) / 1e6
    print(f"  batch device bytes: {mb:.1f} MB (src {b.shape} {b.dtype})")


if __name__ == "__main__":
    main()
