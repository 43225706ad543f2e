# coding: utf-8
"""Model construction + forward shape/consistency tests.

Mirrors the reference's encoder/decoder forward tests
(test/unit/test_transformer_encoder.py, test_transformer_decoder.py) with
seeded tiny models, plus (new) KV-cache decode consistency: a cached
single-step decode must reproduce the full teacher-forced forward.
"""
import jax
import jax.numpy as jnp
import numpy as np

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.models.initialization import initialize_model
from joeys2t_tpu.vocabulary import Vocabulary


def tiny_vocab(n=20):
    return Vocabulary([f"tok{i}" for i in range(n)], SpecialSymbols())


def mt_cfg():
    return {
        "initializer": "xavier_uniform",
        "encoder": {
            "type": "transformer",
            "num_layers": 2,
            "num_heads": 2,
            "hidden_size": 16,
            "ff_size": 32,
            "dropout": 0.1,
            "embeddings": {"embedding_dim": 16, "scale": True},
            "layer_norm": "pre",
        },
        "decoder": {
            "type": "transformer",
            "num_layers": 2,
            "num_heads": 2,
            "hidden_size": 16,
            "ff_size": 32,
            "dropout": 0.1,
            "embeddings": {"embedding_dim": 16, "scale": True},
            "layer_norm": "pre",
        },
    }


def s2t_cfg():
    cfg = mt_cfg()
    cfg["encoder"].update({
        "subsample": True,
        "in_channels": 8,
        "conv_channels": 16,
        "conv_kernel_sizes": [3, 3],
        "embeddings": {"embedding_dim": 8},
    })
    return cfg


def init_model(model, spec, task="MT", batch=2, src_len=7, trg_len=5, in_ch=8):
    rng = jax.random.PRNGKey(42)
    if task == "MT":
        src = jnp.ones((batch, src_len), jnp.int32)
        src_mask = jnp.ones((batch, 1, src_len), bool)
    else:
        src = jnp.ones((batch, src_len, in_ch), jnp.float32)
        src_mask = None
    trg_input = jnp.ones((batch, trg_len), jnp.int32)
    trg_mask = jnp.ones((batch, 1, trg_len), bool)
    src_length = jnp.full((batch,), src_len, jnp.int32)
    variables = model.init({"params": rng}, src, trg_input, src_length, src_mask,
                           trg_mask, deterministic=True)
    return variables["params"], (src, trg_input, src_length, src_mask, trg_mask)


class TestMTForward:
    def test_shapes_and_init(self):
        vocab = tiny_vocab()
        model, spec = build_model(mt_cfg(), src_vocab=vocab, trg_vocab=vocab)
        params, args = init_model(model, spec, "MT")
        params = initialize_model(params, mt_cfg(), 1, 1, jax.random.PRNGKey(0))
        src, trg_input, src_length, src_mask, trg_mask = args
        logits, ctc_logits, out_mask = model.apply(
            {"params": params}, src, trg_input, src_length, src_mask, trg_mask,
            deterministic=True)
        assert logits.shape == (2, 5, len(vocab))
        assert ctc_logits is None
        assert np.all(np.isfinite(np.asarray(logits)))
        # pad row of embeddings zeroed (joeynmt/initialization.py:212-215)
        assert np.allclose(np.asarray(params["src_embed"]["lut"]["embedding"])[1], 0.0)

    def test_cache_decode_matches_full_forward(self):
        """KV-cached step decode == full-prefix forward (greedy parity core)."""
        vocab = tiny_vocab()
        model, spec = build_model(mt_cfg(), src_vocab=vocab, trg_vocab=vocab)
        params, args = init_model(model, spec, "MT")
        src, trg_input, src_length, src_mask, trg_mask = args
        rng = np.random.RandomState(7)
        trg_input = jnp.asarray(rng.randint(4, len(vocab), size=(2, 5)), jnp.int32)

        enc_out, _, enc_mask = model.apply(
            {"params": params}, src, src_length, src_mask, method="encode")
        # full forward logits
        full_logits, _, _, _, _ = model.apply(
            {"params": params}, trg_input, enc_out, enc_mask,
            jnp.ones((2, 1, 5), bool), method="decode")

        # stepwise with cache
        cache = model.apply({"params": params}, enc_out, 8, method="init_cache")
        step_logits = []
        for t in range(5):
            logits_t, cache, _ = model.apply(
                {"params": params}, trg_input[:, t:t + 1], jnp.int32(t), cache,
                enc_mask, method="decode_step")
            step_logits.append(np.asarray(logits_t[:, 0]))
        step_logits = np.stack(step_logits, axis=1)
        np.testing.assert_allclose(np.asarray(full_logits), step_logits, atol=1e-4)


class TestS2TForward:
    def test_subsampler_lengths_and_ctc(self):
        vocab = tiny_vocab()
        model, spec = build_model(s2t_cfg(), src_vocab=None, trg_vocab=vocab)
        params, args = init_model(model, spec, "S2T", src_len=37)
        src, trg_input, src_length, src_mask, trg_mask = args
        logits, ctc_logits, out_mask = model.apply(
            {"params": params}, src, trg_input, src_length, src_mask, trg_mask,
            deterministic=True)
        # length formula: two stride-2 convs with k=3, pad=1: 37 -> 19 -> 10
        assert out_mask.shape == (2, 1, 10)
        assert ctc_logits.shape == (2, 10, len(vocab))
        assert logits.shape == (2, 5, len(vocab))

    def test_subsample_length_formula(self):
        from joeys2t_tpu.models.modules import Conv1dSubsampler

        # golden values from torch formula (joeynmt/encoders.py:348-352)
        lens = jnp.array([1, 5, 10, 37, 100, 999])
        out = Conv1dSubsampler.get_out_seq_lens(lens, (3, 3))
        np.testing.assert_array_equal(np.asarray(out), [1, 2, 3, 10, 25, 250])


class TestConformer:
    def test_forward(self):
        vocab = tiny_vocab()
        cfg = s2t_cfg()
        cfg["encoder"]["type"] = "conformer"
        cfg["encoder"]["depthwise_conv_kernel_size"] = 5
        model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab)
        params, args = init_model(model, spec, "S2T", src_len=21)
        src, trg_input, src_length, src_mask, trg_mask = args
        logits, ctc_logits, out_mask = model.apply(
            {"params": params}, src, trg_input, src_length, src_mask, trg_mask,
            deterministic=True)
        assert logits.shape == (2, 5, len(vocab))
        assert np.all(np.isfinite(np.asarray(logits)))


    def test_macaron_paper_mode_is_depth_stable(self):
        """The reference conformer's macaron step is 0.5*PFF(x) + x with the
        residual already inside PFF — the stream is amplified ~1.5x per
        macaron FF and the encoder output grows EXPONENTIALLY with depth
        (std ~1.4e3 at 16 flagship layers at init), which diverges within
        200 train steps on hardware. `macaron: "paper"` (arXiv:2005.08100,
        x + 0.5*ff_core) must stay O(1) at depth; "reference" stays the
        default for converted-checkpoint parity."""
        import jax
        import jax.numpy as jnp

        vocab = tiny_vocab()

        def enc_std(macaron):
            cfg = s2t_cfg()
            cfg["encoder"].update({"type": "conformer", "num_layers": 8,
                                   "depthwise_conv_kernel_size": 5,
                                   "macaron": macaron})
            model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab)
            params, args = init_model(model, spec, "S2T", src_len=21)
            src, trg_input, src_length, src_mask, trg_mask = args
            enc, _, _ = model.apply({"params": params}, src, src_length,
                                    None, method="encode")
            return float(jnp.std(enc))

        paper = enc_std("paper")
        reference = enc_std("reference")
        assert paper < 3.0, paper
        assert reference > 5 * paper, (reference, paper)

    def test_macaron_paper_rejects_post_norm(self):
        """The paper-macaron half-step recovery assumes the PRE-norm PFF
        form (core + alpha*x); post-norm PFF returns LN(core + alpha*x) and
        the recovered core would be silently wrong math — the combination
        must be rejected at build time, not trained."""
        import pytest

        vocab = tiny_vocab()
        cfg = s2t_cfg()
        cfg["encoder"].update({"type": "conformer", "num_layers": 2,
                               "depthwise_conv_kernel_size": 5,
                               "macaron": "paper", "layer_norm": "post"})
        model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab)
        with pytest.raises(AssertionError, match="layer_norm='pre'"):
            init_model(model, spec, "S2T", src_len=21)

    def test_macaron_paper_trains(self):
        """One value_and_grad step through the paper-macaron conformer:
        loss and gradients finite (the from-scratch training mode)."""
        import jax
        import jax.numpy as jnp

        vocab = tiny_vocab()
        cfg = s2t_cfg()
        cfg["encoder"].update({"type": "conformer", "num_layers": 2,
                               "depthwise_conv_kernel_size": 5,
                               "macaron": "paper"})
        model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab)
        params, args = init_model(model, spec, "S2T", src_len=21)
        src, trg_input, src_length, src_mask, trg_mask = args
        trg = jnp.roll(trg_input, -1, axis=1)

        def loss_fn(p):
            logits, _, _ = model.apply({"params": p}, src, trg_input,
                                       src_length, src_mask, trg_mask,
                                       deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, trg[..., None], -1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree.leaves(grads))

    def test_layerscale_params_and_step(self):
        """`encoder.layerscale: 0.1` adds per-sublayer scale vectors
        (paper-macaron only) initialized to the constant, surviving
        initialize_model (1-D non-bias params are kept); forward and one
        grad step stay finite and the deep stack is near-identity at
        init (encoder output std O(1) and sublayer deltas damped)."""
        import jax
        import jax.numpy as jnp

        vocab = tiny_vocab()
        cfg = s2t_cfg()
        cfg["encoder"].update({"type": "conformer", "num_layers": 4,
                               "depthwise_conv_kernel_size": 5,
                               "macaron": "paper", "layerscale": 0.1})
        model, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab)
        params, args = init_model(model, spec, "S2T", src_len=21)
        src, trg_input, src_length, src_mask, trg_mask = args
        l0 = params["encoder"]["layer_0"]
        for k in ("ls_ff1", "ls_att", "ls_conv", "ls_ff2"):
            assert k in l0, sorted(l0)
            np.testing.assert_allclose(np.asarray(l0[k]), 0.1)
        logits, _, _ = model.apply({"params": params}, src, trg_input,
                                   src_length, src_mask, trg_mask,
                                   deterministic=True)
        assert np.all(np.isfinite(np.asarray(logits)))

        def loss_fn(p):
            lg, _, _ = model.apply({"params": p}, src, trg_input, src_length,
                                   src_mask, trg_mask, deterministic=True)
            return jnp.mean(lg.astype(jnp.float32) ** 2)

        _, grads = jax.value_and_grad(loss_fn)(params)
        g = grads["encoder"]["layer_0"]["ls_att"]
        assert np.all(np.isfinite(np.asarray(g)))


class TestRecurrent:
    def test_rnn_forward(self):
        vocab = tiny_vocab()
        cfg = {
            "encoder": {
                "type": "recurrent",
                "rnn_type": "gru",
                "hidden_size": 10,
                "num_layers": 2,
                "bidirectional": True,
                "embeddings": {"embedding_dim": 8},
            },
            "decoder": {
                "type": "recurrent",
                "rnn_type": "gru",
                "hidden_size": 10,
                "num_layers": 2,
                "attention": "bahdanau",
                "init_hidden": "bridge",
                "embeddings": {"embedding_dim": 8},
            },
        }
        model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
        params, args = init_model(model, spec, "MT", src_len=6, trg_len=4)
        src, trg_input, src_length, src_mask, trg_mask = args
        logits, ctc_logits, out_mask = model.apply(
            {"params": params}, src, trg_input, src_length, src_mask, trg_mask,
            deterministic=True)
        assert logits.shape == (2, 4, len(vocab))
        assert np.all(np.isfinite(np.asarray(logits)))


class TestTiedWeights:
    def test_tied_embeddings_and_softmax(self):
        vocab = tiny_vocab()
        cfg = mt_cfg()
        cfg["tied_embeddings"] = True
        cfg["tied_softmax"] = True
        model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
        params, args = init_model(model, spec, "MT")
        # single shared embedding table; no separate decoder output kernel
        flat_keys = set()

        def walk(d, prefix=()):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v, prefix + (k,))
                else:
                    flat_keys.add("/".join(prefix + (k,)))

        walk(params)
        assert not any("output_layer" in k and "decoder" in k.split("/")[0]
                       for k in flat_keys if k.startswith("decoder/output_layer"))
        src, trg_input, src_length, src_mask, trg_mask = args
        logits, _, _ = model.apply(
            {"params": params}, src, trg_input, src_length, src_mask, trg_mask,
            deterministic=True)
        assert logits.shape == (2, 5, len(vocab))


class TestDeepNet:
    def test_alpha_applied_at_construction(self):
        """xavier_normal triggers DeepNet residual alphas
        (joeynmt/initialization.py:63-76,137-152)."""
        vocab = tiny_vocab()
        cfg = mt_cfg()
        cfg["initializer"] = "xavier_normal"
        cfg["encoder"]["num_layers"] = 6
        cfg["decoder"]["num_layers"] = 6
        model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
        assert abs(model.encoder.alpha - 0.81 * (6**4 * 6)**(1 / 16)) < 1e-12
        assert abs(model.decoder.alpha - (3 * 6)**0.25) < 1e-12

    def test_default_alpha_is_one(self):
        vocab = tiny_vocab()
        model, _ = build_model(mt_cfg(), src_vocab=vocab, trg_vocab=vocab)
        assert model.encoder.alpha == 1.0


class TestTiedParamSharing:
    def test_single_embedding_table(self):
        """tied_embeddings: one shared table in the param tree (flax module
        sharing), and tied_softmax reuses it for the output projection."""
        vocab = tiny_vocab()
        cfg = mt_cfg()
        cfg["tied_embeddings"] = True
        cfg["tied_softmax"] = True
        model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
        params, _ = init_model(model, spec, "MT")
        n_tables = sum(1 for k in params if "embed" in k)
        assert n_tables == 1
        # no separate decoder output projection
        assert "output_layer" not in params["decoder"]


class TestRemat:
    """model.remat: True wraps every transformer layer in jax.checkpoint
    (activation rematerialization). Forward and gradients must be identical
    to the non-remat model; only the backward memory/FLOPs trade changes."""

    def test_remat_matches(self):
        vocab = tiny_vocab()
        cfg = s2t_cfg()
        model0, spec = build_model(cfg, src_vocab=None, trg_vocab=vocab)
        model1, _ = build_model(dict(cfg, remat=True), src_vocab=None,
                                trg_vocab=vocab)
        assert model1.encoder.remat and model1.decoder.remat

        params, args = init_model(model0, spec, "S2T", src_len=21)
        src, trg_input, src_length, src_mask, trg_mask = args
        p1, _ = init_model(model1, spec, "S2T", src_len=21)[0], None
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p1))

        def loss(m):
            def f(p, key):
                logits, _, _ = m.apply(
                    {"params": p}, src, trg_input, src_length, src_mask,
                    trg_mask, deterministic=False, rngs={"dropout": key})
                return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-4
            return f

        key = jax.random.PRNGKey(3)
        l0, g0 = jax.value_and_grad(loss(model0))(params, key)
        l1, g1 = jax.value_and_grad(loss(model1))(params, key)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_remat_conformer_trains(self):
        vocab = tiny_vocab()
        cfg = s2t_cfg()
        cfg["encoder"]["type"] = "conformer"
        cfg["encoder"]["depthwise_conv_kernel_size"] = 5
        model, spec = build_model(dict(cfg, remat=True), src_vocab=None,
                                  trg_vocab=vocab)
        params, args = init_model(model, spec, "S2T", src_len=21)
        src, trg_input, src_length, src_mask, trg_mask = args

        def f(p):
            logits, _, _ = model.apply({"params": p}, src, trg_input,
                                       src_length, src_mask, trg_mask,
                                       deterministic=True)
            return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-4

        g = jax.grad(f)(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
