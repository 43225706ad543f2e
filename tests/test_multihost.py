# coding: utf-8
"""True multi-process execution: two OS processes, each with 2 virtual CPU
devices, joined via jax.distributed (gloo collectives) into one 4-device
data-parallel mesh. Validates the actual multi-host code paths — mesh over
non-addressable devices, shard_batch_arrays assembling per-process rows
into a global array, and a jitted sharded train step producing the same
loss on every rank. Replaces the reference's NCCL DDP test surface
(joeynmt/helpers_for_ddp.py)."""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2"
                           " --xla_llvm_disable_expensive_passes=true"
                           " --xla_backend_optimization_level=0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    sys.path.insert(0, %r)
    import numpy as np
    import jax.numpy as jnp
    import optax
    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.losses import XentLoss
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.parallel import get_mesh, shard_batch_arrays
    from joeys2t_tpu.vocabulary import Vocabulary

    assert jax.process_count() == 2
    assert jax.device_count() == 4 and len(jax.local_devices()) == 2

    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    cfg = {"encoder": {"type": "transformer", "num_layers": 1, "num_heads": 2,
                       "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                       "embeddings": {"embedding_dim": 16, "scale": True},
                       "layer_norm": "pre"},
           "decoder": {"type": "transformer", "num_layers": 1, "num_heads": 2,
                       "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                       "embeddings": {"embedding_dim": 16, "scale": True},
                       "layer_norm": "pre"}}
    model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
    loss_fn = XentLoss(pad_index=1, smoothing=0.1)
    ctx = get_mesh()
    assert ctx.mesh.shape["data"] == 4

    b_local, s, t = 2, 6, 5  # 2 rows per process -> global batch 4
    rng = np.random.RandomState(100 + pid)  # DIFFERENT data per process
    src = rng.randint(4, 30, size=(b_local, s)).astype(np.int32)
    trg_input = rng.randint(4, 30, size=(b_local, t)).astype(np.int32)
    trg = rng.randint(4, 30, size=(b_local, t)).astype(np.int32)

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(src), jnp.asarray(trg_input),
                        jnp.full((b_local,), s, jnp.int32),
                        jnp.ones((b_local, 1, s), bool),
                        jnp.ones((b_local, 1, t), bool))["params"]
    params = ctx.replicate_tree(params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    batch = shard_batch_arrays({
        "src": src, "trg_input": trg_input, "trg": trg,
        "src_length": np.full((b_local,), s, np.int32),
        "src_mask": np.ones((b_local, 1, s), bool),
        "trg_mask": np.ones((b_local, 1, t), bool),
    }, ctx)
    assert batch["src"].shape[0] == 4  # global batch

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss(p):
            logits, _, _ = model.apply(
                {"params": p}, batch["src"], batch["trg_input"],
                batch["src_length"], batch["src_mask"], batch["trg_mask"],
                deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            total = loss_fn(lp, trg=batch["trg"])
            if isinstance(total, tuple):
                total = total[0]
            return total / batch["src"].shape[0]

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    with ctx.mesh:
        params, opt_state, l = train_step(params, opt_state, batch)
    # loss is replicated -> fetchable and identical on every process
    print(f"RANK {pid} LOSS {float(l):.6f}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("JOEYS2T_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_data_parallel_train_step():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    code = WORKER % (REPO.as_posix(),)
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": ""}
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-2000:]}"
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RANK")][0]
        losses.append(float(line.split()[-1]))
    # the global loss must be identical on both ranks (one SPMD program)
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


PREDICT_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2"
                           " --xla_llvm_disable_expensive_passes=true"
                           " --xla_backend_optimization_level=0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    nproc = int(sys.argv[3])
    cfg_path = sys.argv[4]
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
    sys.path.insert(0, %r)
    import yaml
    from joeys2t_tpu.config import parse_global_args
    from joeys2t_tpu.prediction import prepare, predict

    cfg = yaml.safe_load(open(cfg_path))
    args = parse_global_args(cfg, rank=pid, mode="test")
    model, spec, params, loss_fn, _, dev_data, _ = prepare(
        args, rank=pid, mode="test")
    dev_data.reset_indices(random_subset=-1)
    import joeys2t_tpu.prediction as P
    orig_search, n_decoded = P.search, []
    P.search = lambda *a, **k: (n_decoded.append(1), orig_search(*a, **k))[1]
    scores, _, hyp, _, _, _ = predict(
        params=params, model=model, spec=spec, data=dev_data,
        loss_fn=loss_fn, compute_loss=False, normalization="batch",
        num_workers=0, args=args.test)
    print("NSEARCH " + str(len(n_decoded)), flush=True)
    print("HYPS " + json.dumps(hyp), flush=True)
""")


@pytest.mark.skipif(os.environ.get("JOEYS2T_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_predict_order_matches_single_process(tmp_path):
    """Multi-process evaluation contract (joeynmt/prediction.py:220-257):
    hypotheses come back complete and in dataset order on every process,
    while each rank decodes only its round-robin share of the batches
    (prediction._eval_shard_info) and the merged result is all-gathered —
    the reference's DistributedSubsetSampler + ddp_merge semantics. This
    test pins both: a 2-process predict() equals the single-process result
    rank for rank, and each rank runs search() on ~half the batches."""
    import json
    import socket

    import yaml

    sys.path.insert(0, (REPO / "scripts").as_posix())
    from generate_reverse_task import generate_samples

    from joeys2t_tpu.helpers import make_model_dir
    from joeys2t_tpu.training import train

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for split, n, seed in [("train", 60, 1), ("dev", 12, 2), ("test", 6, 3)]:
        src, trg = generate_samples(n, high=10, min_len=3, max_len=8, seed=seed)
        (data_dir / f"{split}.src").write_text("\n".join(src) + "\n")
        (data_dir / f"{split}.trg").write_text("\n".join(trg) + "\n")

    cfg = yaml.safe_load(open(REPO / "configs/transformer_reverse.yaml"))
    cfg["model_dir"] = (tmp_path / "model").as_posix()
    cfg["data"].update(
        train=(data_dir / "train").as_posix(),
        dev=(data_dir / "dev").as_posix(),
        test=(data_dir / "test").as_posix(),
        sample_train_subset=-1, sample_dev_subset=-1)
    cfg["training"].update(epochs=1, validation_freq=10, logging_freq=10,
                           batch_size=16, batch_multiplier=1)
    cfg["testing"].update(load_model=None, batch_size=5)  # uneven final batch
    for side in ("encoder", "decoder"):
        cfg["model"][side].update(num_layers=1, hidden_size=16, ff_size=32)
        cfg["model"][side]["embeddings"]["embedding_dim"] = 16

    # single-process training produces the shared checkpoint + vocab files
    import copy

    cfg_pristine = copy.deepcopy(cfg)  # train() mutates cfg in place
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_pristine))

    def run_predict_two_proc():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        code = PREDICT_WORKER % (REPO.as_posix(),)
        env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": ""}
        procs = [subprocess.Popen(
            [sys.executable, "-c", code, str(i), port, "2",
             cfg_path.as_posix()],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
        hyps, n_decoded = [], []
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
            line = [ln for ln in out.splitlines() if ln.startswith("HYPS ")][0]
            hyps.append(json.loads(line[5:]))
            nline = [ln for ln in out.splitlines()
                     if ln.startswith("NSEARCH ")][0]
            n_decoded.append(int(nline.split()[1]))
        return hyps, n_decoded

    def run_predict_in_process():
        # the 1-process baseline needs no distributed runtime: the same
        # library calls the worker makes, minus a ~20s interpreter+compile
        # boot that bought no extra coverage
        from joeys2t_tpu.config import parse_global_args
        from joeys2t_tpu.prediction import predict, prepare

        args = parse_global_args(
            yaml.safe_load(cfg_path.read_text()), rank=0, mode="test")
        model, spec, params, loss_fn, _, dev_data, _ = prepare(
            args, rank=0, mode="test")
        dev_data.reset_indices(random_subset=-1)
        import joeys2t_tpu.prediction as P
        orig_search, n_calls = P.search, []
        P.search = lambda *a, **k: (n_calls.append(1), orig_search(*a, **k))[1]
        try:
            _, _, hyp, _, _, _ = predict(
                params=params, model=model, spec=spec, data=dev_data,
                loss_fn=loss_fn, compute_loss=False, normalization="batch",
                num_workers=0, args=args.test)
        finally:
            P.search = orig_search
        return hyp, len(n_calls)

    single, n_single = run_predict_in_process()
    double, n_double = run_predict_two_proc()
    assert len(single) == 12
    assert n_single == 3  # 12 examples at batch_size 5 -> 3 batches
    # each rank decodes only its round-robin share of the batches...
    assert sorted(n_double) == [1, 2], n_double
    # ...and still yields the full set, in dataset order, equal to 1-process
    assert double[0] == single
    assert double[1] == single


TRAIN_MANAGER_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2"
                           " --xla_llvm_disable_expensive_passes=true"
                           " --xla_backend_optimization_level=0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    cfg_path = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    sys.path.insert(0, %r)
    import yaml
    from joeys2t_tpu.config import parse_global_args, set_validation_args
    from joeys2t_tpu.prediction import prepare
    from joeys2t_tpu.training import TrainManager

    cfg = yaml.safe_load(open(cfg_path))
    args = parse_global_args(cfg, rank=pid, mode="train")
    model, spec, params, loss_fn, train_data, dev_data, _ = prepare(
        args, rank=pid, mode="train")

    # spy on WHERE the lockstep machinery runs: host batch production
    # (_local_shape_stats, called right after the train_iter pull) must be
    # on the prefetch worker; the per-batch allgather must stay on the
    # main thread so collective order is identical across ranks
    import threading
    import joeys2t_tpu.training as T
    from jax.experimental import multihost_utils as MH
    prep_threads, sync_threads = set(), set()
    orig_stats, orig_ag = T._local_shape_stats, MH.process_allgather
    def spy_stats(batch, bs, dp):
        prep_threads.add(threading.current_thread().name)
        return orig_stats(batch, bs, dp)
    def spy_ag(x, *a, **k):
        sync_threads.add(threading.current_thread().name)
        return orig_ag(x, *a, **k)
    T._local_shape_stats = spy_stats
    MH.process_allgather = spy_ag

    trainer = TrainManager(
        model=model, spec=spec, params=params, loss_fn=loss_fn,
        model_dir=args.model_dir, task=args.task, seed=args.seed,
        train_args=args.train, dev_args=set_validation_args(args.test),
        num_workers=0, model_cfg=args.model)
    trainer.train_and_validate(train_data=train_data, valid_data=dev_data)
    print("STEPS " + str(trainer.stats.steps), flush=True)
    print("PREPTHREADS " + ",".join(sorted(prep_threads)), flush=True)
    print("SYNCTHREADS " + ",".join(sorted(sync_threads)), flush=True)
""")


@pytest.mark.skipif(os.environ.get("JOEYS2T_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_train_manager_stays_in_lockstep(tmp_path):
    """Full TrainManager loop across 2 processes with DELIBERATELY
    divergent per-rank data: the samplers drop None-filtered (overlong)
    items after the rank-strided split, so rank 0 has 2 local batches and
    rank 1 has 3; and the ranks' step-1 batches fall in different length
    buckets. Without the per-batch sync (training._multihost_sync_stream)
    rank 1 would block forever in a collective (the reference's torch-DDP
    loop has the same latent hang, joeynmt/datasets.py:1164-1246);
    with it, both ranks finish the epoch at the same step count and
    rank-0-only artifact gating yields exactly one validations.txt line
    per validation."""
    import socket

    import yaml

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # 12 train items, rank-strided (shuffle False): rank0 gets even indices,
    # rank1 odd. Items 6 and 8 are overlong (20 > max_length 15) -> only
    # rank0 drops them (6 -> 4 items -> 2 batches vs rank1's 3 batches).
    # Item 0 has 12 tokens (bucket 16) while rank1's step-1 items have 4
    # (bucket 8) -> divergent local pad shapes that must be synced.
    lengths = [12, 4, 5, 4, 6, 5, 20, 4, 20, 5, 6, 4]
    src = [" ".join(str((i + j) % 10) for j in range(n))
           for i, n in enumerate(lengths)]
    trg = [" ".join(reversed(s.split())) for s in src]
    (data_dir / "train.src").write_text("\n".join(src) + "\n")
    (data_dir / "train.trg").write_text("\n".join(trg) + "\n")
    (data_dir / "dev.src").write_text("\n".join(src[1:5]) + "\n")
    (data_dir / "dev.trg").write_text("\n".join(trg[1:5]) + "\n")

    cfg = yaml.safe_load(open(REPO / "configs/transformer_reverse.yaml"))
    cfg["model_dir"] = (tmp_path / "model").as_posix()
    cfg["data"].update(
        train=(data_dir / "train").as_posix(),
        dev=(data_dir / "dev").as_posix(),
        test=(data_dir / "dev").as_posix(),
        sample_train_subset=-1, sample_dev_subset=-1)
    cfg["data"]["src"]["max_length"] = 15
    cfg["data"]["trg"]["max_length"] = 25
    cfg["training"].update(epochs=1, updates=100, validation_freq=2,
                           logging_freq=1, batch_size=2, batch_multiplier=1,
                           shuffle=False, overwrite=False)
    cfg["testing"].update(batch_size=4)
    for side in ("encoder", "decoder"):
        cfg["model"][side].update(num_layers=1, hidden_size=16, ff_size=32)
        cfg["model"][side]["embeddings"]["embedding_dim"] = 16

    from joeys2t_tpu.helpers import make_model_dir
    make_model_dir(Path(cfg["model_dir"]))
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    code = TRAIN_MANAGER_WORKER % (REPO.as_posix(),)
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": ""}
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(i), port, cfg_path.as_posix()],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    steps = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("STEPS ")][0]
        steps.append(int(line.split()[1]))
    # both ranks end the epoch together at the global-min batch count
    assert steps == [2, 2], steps
    # overlapped prep under lockstep: batch production ran on the prefetch
    # worker thread, while every per-batch allgather stayed on main
    for out in outs:
        prep = [ln for ln in out.splitlines()
                if ln.startswith("PREPTHREADS ")][0].split(" ", 1)[1]
        sync = [ln for ln in out.splitlines()
                if ln.startswith("SYNCTHREADS ")][0].split(" ", 1)[1]
        assert "multihost-prefetch" in prep, prep
        assert sync == "MainThread", sync
    # artifact writes are rank-0-only: one report line for the one
    # validation (step 2), no duplicates from rank 1
    report = (Path(cfg["model_dir"]) / "validations.txt").read_text()
    assert len(report.strip().splitlines()) == 1, report
