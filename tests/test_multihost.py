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
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
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
