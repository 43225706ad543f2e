# coding: utf-8
"""Tensor parallelism over the `model` mesh axis: sharded params must produce
the same loss/gradients as replicated execution (GSPMD inserts the
collectives; capability beyond the reference, SURVEY.md §2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.parallel import get_mesh
from joeys2t_tpu.parallel.tp import shard_params_tp, tp_param_shardings
from joeys2t_tpu.vocabulary import Vocabulary

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >= 4 virtual devices")


def build():
    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    cfg = {
        "attention_impl": "xla",  # flash kernel not yet shard_map-aware
        "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
        "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
    }
    return build_model(cfg, src_vocab=vocab, trg_vocab=vocab)


def test_tp_matches_replicated():
    model, spec = build()
    b, s, t = 4, 6, 5
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(4, 30, size=(b, s)), jnp.int32)
    trg_input = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    trg = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    src_mask = jnp.ones((b, 1, s), bool)
    trg_mask = jnp.ones((b, 1, t), bool)
    src_len = jnp.full((b,), s, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]

    def loss(p):
        logits, _, _ = model.apply({"params": p}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], axis=-1))

    base_loss, base_grads = jax.value_and_grad(loss)(params)

    # 2-way data x 2-way model parallel
    ctx = get_mesh(n_devices=4, model_parallel=2)
    tp_params = shard_params_tp(params, ctx)
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss))(tp_params)

    np.testing.assert_allclose(float(base_loss), float(tp_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(base_grads), jax.tree.leaves(tp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tp_with_sequence_parallel_matches():
    """sequence_parallel=True adds residual-stream sharding constraints along
    the sequence dim over `model` (Megatron SP); results must be unchanged."""
    from joeys2t_tpu.parallel import set_default_mesh

    vocab = Vocabulary([f"t{i}" for i in range(30)], SpecialSymbols())
    cfg = {
        "attention_impl": "xla",
        "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
        "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "embeddings": {"embedding_dim": 16, "scale": True},
                    "layer_norm": "pre"},
    }
    model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
    model_sp, _ = build_model(dict(cfg, sequence_parallel=True),
                              src_vocab=vocab, trg_vocab=vocab)
    assert model_sp.encoder.sequence_parallel

    b, s, t = 4, 8, 6  # seq dims divisible by tp=2
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randint(4, 30, size=(b, s)), jnp.int32)
    trg_input = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    trg = jnp.asarray(rng.randint(4, 30, size=(b, t)), jnp.int32)
    src_mask = jnp.ones((b, 1, s), bool)
    trg_mask = jnp.ones((b, 1, t), bool)
    src_len = jnp.full((b,), s, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                        src_len, src_mask, trg_mask)["params"]

    def loss(m):
        def f(p):
            logits, _, _ = m.apply({"params": p}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], axis=-1))
        return f

    base_loss, base_grads = jax.value_and_grad(loss(model))(params)

    ctx = get_mesh(n_devices=4, model_parallel=2)
    set_default_mesh(ctx)
    try:
        tp_params = shard_params_tp(params, ctx)
        sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss(model_sp)))(tp_params)
    finally:
        set_default_mesh(None)
    np.testing.assert_allclose(float(base_loss), float(sp_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(base_grads), jax.tree.leaves(sp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tp_shardings_structure():
    model, spec = build()
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 4), jnp.int32),
        jnp.ones((1, 3), jnp.int32), jnp.full((1,), 4, jnp.int32),
        jnp.ones((1, 1, 4), bool), jnp.ones((1, 1, 3), bool))["params"]
    ctx = get_mesh(n_devices=4, model_parallel=2)
    shardings = tp_param_shardings(params, ctx)
    from jax.sharding import PartitionSpec as P

    flat = jax.tree_util.tree_leaves_with_path(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))
    specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
    # attention qkv column-sharded, attention output row-sharded
    assert specs["['encoder']['layer_0']['src_src_att']['q_layer']['kernel']"] \
        == P(None, "model")
    assert specs["['encoder']['layer_0']['src_src_att']['output_layer']['kernel']"] \
        == P("model", None)
    # ffn dense1 column, dense2 row
    assert specs["['encoder']['layer_0']['feed_forward']['dense1']['kernel']"] \
        == P(None, "model")
    assert specs["['encoder']['layer_0']['feed_forward']['dense2']['kernel']"] \
        == P("model", None)
    # embeddings + norms replicated
    assert specs["['src_embed']['lut']['embedding']"] == P()
    assert specs["['encoder']['layer_0']['layer_norm']['scale']"] == P()


def test_search_under_mesh_matches_unsharded():
    """Greedy and beam search with an installed data-parallel mesh (inputs
    dim-0 sharded, GSPMD propagating through the decode while_loop — the
    multi-chip serving path) must produce exactly the unsharded results,
    including the beam-shared cross-cache layout (B untiled vs B*K self)."""
    import numpy as np

    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.parallel.mesh import get_mesh, set_default_mesh
    from joeys2t_tpu.search import beam_search, greedy
    from joeys2t_tpu.vocabulary import Vocabulary

    vocab = Vocabulary([f"t{i}" for i in range(20)], SpecialSymbols())
    side = {"type": "transformer", "num_layers": 2, "num_heads": 2,
            "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
            "embeddings": {"embedding_dim": 16, "scale": True},
            "layer_norm": "pre"}
    model, spec = build_model({"encoder": dict(side), "decoder": dict(side)},
                              src_vocab=vocab, trg_vocab=vocab)
    b, s = 8, 7  # divides the 4-device data axis
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randint(4, 24, size=(b, s)), jnp.int32)
    src_mask = jnp.ones((b, 1, s), bool)
    params = model.init({"params": jax.random.PRNGKey(2)}, src,
                        jnp.ones((b, 3), jnp.int32),
                        jnp.full((b,), s, jnp.int32), src_mask,
                        jnp.ones((b, 1, 3), bool))["params"]
    enc, _, _ = model.apply({"params": params}, src,
                            jnp.full((b,), s, jnp.int32), src_mask,
                            method="encode")

    # the reference runs must be genuinely unsharded — clear any default
    # mesh a previously-run test (e.g. a TrainManager) left installed
    set_default_mesh(None)
    g_ref, _, _ = greedy(params, model, spec, enc, None, src_mask, 12)
    b_ref, bs_ref, _ = beam_search(params, model, spec, enc, None, src_mask,
                                   3, 12, alpha=1.0, n_best=1,
                                   return_prob="hyp")

    ctx = get_mesh(n_devices=4, model_parallel=1)
    set_default_mesh(ctx)
    try:
        sharded_enc = jax.device_put(enc, ctx.data_sharding)
        sharded_mask = jax.device_put(src_mask, ctx.data_sharding)
        with ctx.mesh:
            g_sh, _, _ = greedy(params, model, spec, sharded_enc, None,
                                sharded_mask, 12)
            b_sh, bs_sh, _ = beam_search(params, model, spec, sharded_enc,
                                         None, sharded_mask, 3, 12,
                                         alpha=1.0, n_best=1,
                                         return_prob="hyp")
    finally:
        set_default_mesh(None)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_sh))
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_sh))
    np.testing.assert_allclose(np.asarray(bs_ref), np.asarray(bs_sh),
                               atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_train_manager_model_parallel_from_config(tmp_path):
    """`training: model_parallel: 2` in the YAML drives a real 2-D
    (data=4, model=2) mesh through the production TrainManager: params are
    Megatron-sharded over `model`, the jitted step + greedy validation run,
    and the trained params match the dp-only run (same seed, same data —
    sharding must not change the math beyond float reassociation)."""
    import sys
    from pathlib import Path as P_

    import yaml

    sys.path.insert(0, str(P_(__file__).parent.parent / "scripts"))
    from generate_reverse_task import generate_samples

    from joeys2t_tpu.config import parse_global_args, set_validation_args
    from joeys2t_tpu.helpers import make_model_dir
    from joeys2t_tpu.parallel.mesh import set_default_mesh
    from joeys2t_tpu.prediction import prepare
    from joeys2t_tpu.training import TrainManager

    repo = P_(__file__).parent.parent
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for split, n, seed in [("train", 64, 1), ("dev", 8, 2), ("test", 8, 3)]:
        src, trg = generate_samples(n, high=10, min_len=3, max_len=8, seed=seed)
        (data_dir / f"{split}.src").write_text("\n".join(src) + "\n")
        (data_dir / f"{split}.trg").write_text("\n".join(trg) + "\n")

    base = yaml.safe_load(open(repo / "configs/transformer_reverse.yaml"))
    base["data"].update(
        train=(data_dir / "train").as_posix(), dev=(data_dir / "dev").as_posix(),
        test=(data_dir / "test").as_posix(), sample_train_subset=-1,
        sample_dev_subset=-1)
    base["training"].update(epochs=1, validation_freq=10, logging_freq=10,
                            batch_size=16, batch_multiplier=1,
                            keep_best_ckpts=1)
    base["model"]["attention_impl"] = "xla"
    for side in ("encoder", "decoder"):
        base["model"][side].update(num_layers=2, num_heads=2, hidden_size=16,
                                   ff_size=32, dropout=0.0)
        base["model"][side]["embeddings"]["embedding_dim"] = 16

    def run(mp):
        import copy

        cfg = copy.deepcopy(base)
        cfg["model_dir"] = (tmp_path / f"model_mp{mp}").as_posix()
        cfg["training"]["model_parallel"] = mp
        make_model_dir(P_(cfg["model_dir"]))
        args = parse_global_args(cfg, rank=0, mode="train")
        assert args.train.model_parallel == mp  # YAML -> TrainConfig
        model, spec, params, loss_fn, train_data, dev_data, _ = prepare(
            args, rank=0, mode="train")
        trainer = TrainManager(
            model=model, spec=spec, params=params, loss_fn=loss_fn,
            model_dir=args.model_dir, task=args.task, seed=args.seed,
            train_args=args.train, dev_args=set_validation_args(args.test),
            num_workers=0, model_cfg=args.model)
        assert trainer.mesh.mesh.shape.get("model", 1) == mp
        if mp > 1:
            from jax.sharding import PartitionSpec

            specs = [x.sharding.spec for x in jax.tree.leaves(trainer.params)]
            assert any("model" in [a for a in s if a is not None]
                       for s in specs if s != PartitionSpec()), \
                "no param tensor is sharded over the model axis"
        # loss + grads of one real batch through the trainer's own loss path
        # — sharding must not change the math (tight bound; the end-of-run
        # param check below must stay loose because adam normalizes by
        # sqrt(v): for near-zero-gradient biases it amplifies float
        # reassociation noise to O(lr) differences within a few steps)
        it, _ = train_data.make_iter(
            batch_size=16, batch_type="sentence", seed=7, shuffle=False,
            num_workers=0, eos_index=spec.eos_index, pad_index=spec.pad_index,
            return_sampler=True)
        probe_batch = next(iter(it))
        _, _, arrays, norm = trainer._prepare_batch(probe_batch)
        (loss, _), grads = jax.jit(jax.value_and_grad(
            trainer._loss_and_metrics, has_aux=True))(
                trainer.params, arrays, jax.random.PRNGKey(0), norm)
        loss = float(loss)
        grads = jax.tree.map(np.asarray, grads)

        trainer.train_and_validate(train_data=train_data, valid_data=dev_data)
        assert trainer.stats.steps > 0
        out = jax.tree.map(np.asarray, trainer.params)
        set_default_mesh(None)
        return out, trainer.stats.steps, loss, grads

    p_tp, steps_tp, loss_tp, g_tp = run(2)
    p_dp, steps_dp, loss_dp, g_dp = run(1)
    assert steps_tp == steps_dp
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
    flat_tp = jax.tree.leaves(p_tp)
    flat_dp = jax.tree.leaves(p_dp)
    assert len(flat_tp) == len(flat_dp)
    for a, b in zip(flat_tp, flat_dp):
        # loose: adam noise amplification (see above), not sharding bugs
        np.testing.assert_allclose(a, b, atol=5e-3)
