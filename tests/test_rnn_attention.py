# coding: utf-8
"""RNN attention mechanisms (joeynmt/attention.py:26-226), behaviors
mirrored from the reference's test/unit/test_attention.py: output shapes,
weights sum to one, masked positions get zero weight, Luong vs Bahdanau
scoring, and an end-to-end Luong recurrent model forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.models import build_model
from joeys2t_tpu.models.rnn import BahdanauAttention, LuongAttention
from joeys2t_tpu.vocabulary import Vocabulary

B, S, DV, H = 3, 5, 12, 8


class TestAttentionMath:
    @pytest.mark.parametrize("att_cls,key_dim",
                             [(BahdanauAttention, DV), (LuongAttention, DV)])
    def test_shapes_mask_and_normalization(self, att_cls, key_dim):
        att = att_cls(hidden_size=H)
        rng = np.random.RandomState(0)
        query = jnp.asarray(rng.randn(B, 1, H).astype(np.float32))
        keys = jnp.asarray(rng.randn(B, S, key_dim).astype(np.float32))
        values = jnp.asarray(rng.randn(B, S, DV).astype(np.float32))
        mask = jnp.asarray(np.array([[1, 1, 1, 1, 1],
                                     [1, 1, 1, 0, 0],
                                     [1, 0, 0, 0, 0]], bool))[:, None, :]

        def fwd(mdl, q, k, v, m):
            proj = mdl.project_keys(k)
            return mdl(q, proj, v, m)

        params = att.init(jax.random.PRNGKey(1), query, keys, values, mask,
                          method=fwd)
        context, alphas = att.apply(params, query, keys, values, mask,
                                    method=fwd)
        assert context.shape == (B, 1, DV)
        assert alphas.shape == (B, 1, S)
        a = np.asarray(alphas)
        # rows are probability distributions
        np.testing.assert_allclose(a.sum(-1), np.ones((B, 1)), atol=1e-6)
        # masked positions carry (numerically) zero weight
        assert a[1, 0, 3:].max() < 1e-6
        assert a[2, 0, 1:].max() < 1e-6
        # fully-masked-but-one row puts all weight on the remaining position
        np.testing.assert_allclose(a[2, 0, 0], 1.0, atol=1e-6)

    def test_luong_is_bilinear(self):
        """Luong score must equal q . W k (no tanh nonlinearity)."""
        att = LuongAttention(hidden_size=H)
        rng = np.random.RandomState(3)
        query = jnp.asarray(rng.randn(1, 1, H).astype(np.float32))
        keys = jnp.asarray(rng.randn(1, S, H).astype(np.float32))
        values = jnp.asarray(rng.randn(1, S, DV).astype(np.float32))
        mask = jnp.ones((1, 1, S), bool)

        def fwd(mdl, q, k, v, m):
            proj = mdl.project_keys(k)
            return mdl(q, proj, v, m)

        params = att.init(jax.random.PRNGKey(0), query, keys, values, mask,
                          method=fwd)
        _, alphas = att.apply(params, query, keys, values, mask, method=fwd)
        w = np.asarray(params["params"]["key_layer"]["kernel"])
        scores = np.asarray(query)[0] @ (np.asarray(keys)[0] @ w).T
        expect = np.exp(scores - scores.max())
        expect /= expect.sum()
        np.testing.assert_allclose(np.asarray(alphas)[0], expect, atol=1e-5)


class TestLuongRecurrentModel:
    def test_forward_and_greedy(self):
        vocab = Vocabulary([f"t{i}" for i in range(16)], SpecialSymbols())
        cfg = {
            "encoder": {"type": "recurrent", "rnn_type": "lstm",
                        "hidden_size": 12, "num_layers": 1, "dropout": 0.0,
                        "bidirectional": True,
                        "embeddings": {"embedding_dim": 8}},
            "decoder": {"type": "recurrent", "rnn_type": "lstm",
                        "hidden_size": 12, "num_layers": 1, "dropout": 0.0,
                        "attention": "luong", "init_hidden": "last",
                        "input_feeding": False,
                        "embeddings": {"embedding_dim": 8}},
        }
        model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
        b, s, t = 2, 6, 4
        src = jnp.ones((b, s), jnp.int32) * 5
        trg_input = jnp.ones((b, t), jnp.int32) * 6
        src_mask = jnp.ones((b, 1, s), bool)
        trg_mask = jnp.ones((b, 1, t), bool)
        src_len = jnp.full((b,), s, jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, src, trg_input,
                            src_len, src_mask, trg_mask)["params"]
        logits, _, _ = model.apply({"params": params}, src, trg_input, src_len,
                                   src_mask, trg_mask, deterministic=True)
        assert logits.shape == (b, t, len(vocab))
        assert np.isfinite(np.asarray(logits)).all()

        from joeys2t_tpu.search import greedy

        enc, hid, msk = model.apply({"params": params}, src, src_len, src_mask,
                                    method="encode")
        out, _, _ = greedy(params, model, spec, enc, hid,
                           msk if msk is not None else src_mask, 8)
        assert out.shape[1] <= 8 and out.shape[0] == b
