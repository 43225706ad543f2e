# coding: utf-8
"""GPipe-style pipeline parallelism (joeys2t_tpu/parallel/pp.py): pipelined
execution over a `pipe` mesh axis must match running the layer stack
sequentially — forward and gradients. Capability beyond the reference
(SURVEY.md §2.3: the reference is data-parallel only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from joeys2t_tpu.models.modules import TransformerEncoderLayer
from joeys2t_tpu.parallel.pp import pipeline_apply, stack_layer_params

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >= 4 virtual devices")

H, FF, HEADS, L = 16, 32, 2, 8
B, S_LEN = 8, 6


def make_stack():
    layer = TransformerEncoderLayer(size=H, ff_size=FF, num_heads=HEADS,
                                    dropout=0.0, layer_norm_position="pre")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S_LEN, H).astype(np.float32))
    mask = jnp.ones((B, 1, S_LEN), bool)
    per_layer = [
        layer.init(jax.random.PRNGKey(i), x, mask, True)["params"]
        for i in range(L)
    ]

    def layer_fn(p, h, m):
        return layer.apply({"params": p}, h, m, True)

    return layer, layer_fn, per_layer, x, mask


def sequential(layer_fn, per_layer, x, mask):
    for p in per_layer:
        x = layer_fn(p, x, mask)
    return x


def test_pipeline_matches_sequential():
    _, layer_fn, per_layer, x, mask = make_stack()
    want = sequential(layer_fn, per_layer, x, mask)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    stacked = stack_layer_params(per_layer)
    got = pipeline_apply(layer_fn, stacked, x, 4, mesh, "pipe", mask)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_pipeline_microbatch_counts():
    _, layer_fn, per_layer, x, mask = make_stack()
    want = sequential(layer_fn, per_layer, x, mask)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    stacked = stack_layer_params(per_layer)
    for m in (1, 8):  # degenerate single microbatch + fully split
        got = pipeline_apply(layer_fn, stacked, x, m, mesh, "pipe", mask)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-5, err_msg=f"m={m}")


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_train_manager_pipeline_parallel_from_config(tmp_path):
    """`training: pipeline_parallel: 2` in the YAML drives a real
    (data=4, pipe=2) mesh through the production TrainManager: the encoder
    layer stack is staged over `pipe` (GPipe microbatching), the jitted
    step + greedy validation run, and loss/grads match the dp-only run."""
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

    def run(pp):
        import copy

        cfg = copy.deepcopy(base)
        cfg["model_dir"] = (tmp_path / f"model_pp{pp}").as_posix()
        cfg["training"]["pipeline_parallel"] = pp
        make_model_dir(P_(cfg["model_dir"]))
        args = parse_global_args(cfg, rank=0, mode="train")
        assert args.train.pipeline_parallel == pp  # YAML -> TrainConfig
        model, spec, params, loss_fn, train_data, dev_data, _ = prepare(
            args, rank=0, mode="train")
        trainer = TrainManager(
            model=model, spec=spec, params=params, loss_fn=loss_fn,
            model_dir=args.model_dir, task=args.task, seed=args.seed,
            train_args=args.train, dev_args=set_validation_args(args.test),
            num_workers=0, model_cfg=args.model)
        assert trainer.mesh.mesh.shape.get("pipe", 1) == pp
        assert trainer._pp == (pp > 1)
        if pp > 1:
            # both stacks staged: 2 decoder layers divide pp=2, so the
            # decoder must be pipelined too (not replicated)
            assert trainer._pp_dec_layer is not None
        # loss + grads of one real batch through the trainer's own loss path
        # (pipelined vs sequential must only differ by float reassociation)
        it, _ = train_data.make_iter(
            batch_size=16, batch_type="sentence", seed=7, shuffle=False,
            num_workers=0, eos_index=spec.eos_index, pad_index=spec.pad_index,
            return_sampler=True)
        probe_batch = next(iter(it))
        _, _, arrays, norm = trainer._prepare_batch(probe_batch)
        (loss, _), grads = jax.jit(jax.value_and_grad(
            trainer._loss_impl, has_aux=True))(
                trainer.params, arrays, jax.random.PRNGKey(0), norm)
        loss = float(loss)
        grads = jax.tree.map(np.asarray, grads)

        trainer.train_and_validate(train_data=train_data, valid_data=dev_data)
        assert trainer.stats.steps > 0
        steps = trainer.stats.steps
        set_default_mesh(None)
        return steps, loss, grads

    steps_pp, loss_pp, g_pp = run(2)
    steps_dp, loss_dp, g_dp = run(1)
    assert steps_pp == steps_dp
    np.testing.assert_allclose(loss_pp, loss_dp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_decode_pre_post_layers_match_full_decode():
    """The decoder's pipeline split (decode_pre_layers -> layer stack ->
    decode_post_layers) must reproduce model.decode exactly — it is the
    same math re-entered at stack boundaries."""
    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.vocabulary import Vocabulary

    vocab = Vocabulary([str(i) for i in range(10)], SpecialSymbols())
    side = {"num_layers": 2, "num_heads": 2, "hidden_size": 16, "ff_size": 32,
            "dropout": 0.0, "layer_norm": "pre",
            "embeddings": {"embedding_dim": 16, "scale": True}}
    cfg = {"encoder": dict(side, type="transformer"),
           "decoder": dict(side, type="transformer"),
           "attention_impl": "xla"}
    model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)

    rng = np.random.RandomState(3)
    b, s, t = 2, 5, 4
    src = jnp.asarray(rng.randint(4, 10, size=(b, s)).astype(np.int32))
    trg_in = jnp.asarray(rng.randint(4, 10, size=(b, t)).astype(np.int32))
    src_len = jnp.full((b,), s, jnp.int32)
    trg_mask = jnp.ones((b, 1, t), bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_in,
                        src_len, None, trg_mask, deterministic=True)["params"]

    enc_out, _, src_mask = model.apply({"params": params}, src, src_len, None,
                                       method="encode")
    want, _, _, _, want_ctc = model.apply(
        {"params": params}, trg_in, enc_out, src_mask, trg_mask,
        method="decode")

    x, full_mask = model.apply({"params": params}, trg_in, trg_mask,
                               method="decode_pre_layers")
    from joeys2t_tpu.models.modules import TransformerDecoderLayer

    layer = TransformerDecoderLayer(size=16, ff_size=32, num_heads=2,
                                    dropout=0.0, layer_norm_position="pre",
                                    attn_impl="xla")
    for i in range(2):
        x, _ = layer.apply({"params": params["decoder"][f"layer_{i}"]},
                           x, enc_out, src_mask, full_mask, False, True)
    got, got_ctc = model.apply({"params": params}, x, enc_out,
                               method="decode_post_layers")
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)
    assert want_ctc is None and got_ctc is None  # MT: no CTC head
    del spec


def test_conformer_encoder_pipeline_split_matches_full_encode():
    """Conformer encoders stage over `pipe` too (r5): pre_layers ->
    pipeline_apply over the ConformerEncoderLayer stack -> post_layers must
    reproduce the sequential encode exactly."""
    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.models.modules import ConformerEncoderLayer
    from joeys2t_tpu.vocabulary import Vocabulary

    vocab = Vocabulary([str(i) for i in range(10)], SpecialSymbols())
    cfg = {
        "encoder": {"type": "conformer", "num_layers": 4, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "emb_dropout": 0.0, "in_channels": 8,
                    "conv_channels": 16, "conv_kernel_sizes": [3, 3],
                    "depthwise_conv_kernel_size": 7, "layer_norm": "pre",
                    "embeddings": {"embedding_dim": 8}},
        "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                    "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                    "layer_norm": "pre",
                    "embeddings": {"embedding_dim": 16, "scale": True}},
        "attention_impl": "xla",
    }
    model, _ = build_model(cfg, src_vocab=None, trg_vocab=vocab)

    rng = np.random.RandomState(5)
    b, t = 2, 37
    src = jnp.asarray(rng.randn(b, t, 8).astype(np.float32))
    src_len = jnp.asarray([t, t - 9], jnp.int32)
    trg_in = jnp.asarray(rng.randint(4, 10, size=(b, 3)).astype(np.int32))
    trg_mask = jnp.ones((b, 1, 3), bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_in,
                        src_len, None, trg_mask, deterministic=True)["params"]

    want, _, want_mask = model.apply({"params": params}, src, src_len, None,
                                     method="encode")

    x, mask = model.apply({"params": params}, src, src_len, None,
                          deterministic=True, method="encode_pre_layers")
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(want_mask))
    enc = model.encoder
    layer = ConformerEncoderLayer(
        size=enc.hidden_size, ff_size=enc.ff_size, num_heads=enc.num_heads,
        dropout=0.0, alpha=enc.alpha,
        layer_norm_position=enc.layer_norm_position,
        depthwise_conv_kernel_size=enc.depthwise_conv_kernel_size,
        attn_impl=enc.attn_impl, conv_norm_type=enc.conv_norm_type,
        macaron=enc.macaron, layerscale_init=enc.layerscale_init)

    def layer_fn(p, h, m):
        return layer.apply({"params": p}, h, m, True)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    stacked = stack_layer_params(
        [params["encoder"][f"layer_{i}"] for i in range(4)])
    got = pipeline_apply(layer_fn, stacked, x, 2, mesh, "pipe", mask)
    got = model.apply({"params": params}, got, method="encode_post_layers")
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_train_manager_accepts_conformer_pipeline():
    """_init_pipeline builds a ConformerEncoderLayer stage for conformer
    encoders instead of rejecting them (r5 scope widening)."""
    from joeys2t_tpu.models.modules import ConformerEncoderLayer

    class _Enc:
        num_layers = 4
        hidden_size = 16
        ff_size = 32
        num_heads = 2
        dropout = 0.0
        alpha = 1.0
        layer_norm_position = "pre"
        depthwise_conv_kernel_size = 7
        dtype = jnp.float32
        attn_impl = "xla"
        conv_norm_type = "layernorm"
        macaron = "reference"
        layerscale_init = 0.0
        num_experts = 0

    from joeys2t_tpu.models.encoders import ConformerEncoder
    from joeys2t_tpu.training import TrainManager

    enc = ConformerEncoder(hidden_size=16, ff_size=32, num_layers=4,
                           num_heads=2, dropout=0.0, in_channels=8,
                           conv_channels=16, depthwise_conv_kernel_size=7,
                           attn_impl="xla")

    class _Model:
        encoder = enc
        decoder = object()  # not a TransformerDecoder -> replicated

    class _Mesh:
        class mesh:
            shape = {"pipe": 2}

    class _Args:
        pipeline_microbatches = 0

    tm = TrainManager.__new__(TrainManager)
    tm.mesh = _Mesh()
    tm.args = _Args()
    tm._init_pipeline(_Model())
    assert isinstance(tm._pp_layer, ConformerEncoderLayer)
    assert tm._pp_layer.depthwise_conv_kernel_size == 7
    assert tm._pp_dec_layer is None
    assert tm._pp_microbatches == 4


def test_pipeline_gradients_match():
    """The GPipe backward schedule falls out of autodiff through ppermute."""
    _, layer_fn, per_layer, x, mask = make_stack()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    stacked = stack_layer_params(per_layer)

    def loss_seq(stacked_p):
        per = [jax.tree.map(lambda a: a[i], stacked_p) for i in range(L)]
        return jnp.sum(sequential(layer_fn, per, x, mask) ** 2)

    def loss_pipe(stacked_p):
        return jnp.sum(
            pipeline_apply(layer_fn, stacked_p, x, 4, mesh, "pipe", mask) ** 2)

    g_seq = jax.grad(loss_seq)(stacked)
    g_pipe = jax.grad(loss_pipe)(stacked)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pipe)):
        # float32 reduction-order noise through the pipeline collectives
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-4)
