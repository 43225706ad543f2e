# coding: utf-8
"""Search tests (mirroring test/unit/test_search.py's coverage areas):
greedy/beam consistency, min/max output length, forbidden tokens, n-best
ordering, forced prefix decoding, repetition controls."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.data.batch import Batch
from joeys2t_tpu.models import build_model
from joeys2t_tpu.search import beam_search, greedy, search
from joeys2t_tpu.vocabulary import Vocabulary

VOCAB_SIZE = 26
B, S = 2, 7


@pytest.fixture(scope="module")
def mt_model():
    vocab = Vocabulary([f"t{i}" for i in range(VOCAB_SIZE - 4)], SpecialSymbols())
    cfg = {
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
    src = jnp.ones((B, S), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(11)}, src, jnp.ones((B, 3), jnp.int32),
        jnp.full((B,), S, jnp.int32), jnp.ones((B, 1, S), bool),
        jnp.ones((B, 1, 3), bool))["params"]
    return model, spec, params


def encode(mt_model):
    model, spec, params = mt_model
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randint(4, VOCAB_SIZE, size=(B, S)), jnp.int32)
    src_mask = jnp.ones((B, 1, S), bool)
    enc, _, _ = model.apply({"params": params}, src,
                            jnp.full((B,), S, jnp.int32), src_mask, method="encode")
    return src, enc, src_mask


class TestGreedy:
    def test_output_shape_and_eos(self, mt_model):
        model, spec, params = mt_model
        src, enc, src_mask = encode(mt_model)
        out, scores, att = greedy(params, model, spec, enc, None, src_mask, 16,
                                  return_prob="hyp", return_attention=True)
        assert out.shape == (B, 16)
        assert att.shape == (B, 16, S)
        # after the first eos, only pad follows
        for row in out:
            eos_pos = np.where(row == spec.eos_index)[0]
            if len(eos_pos):
                assert (row[eos_pos[0] + 1:] == spec.pad_index).all()

    def test_never_generates_forbidden(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        out, _, _ = greedy(params, model, spec, enc, None, src_mask, 16)
        assert not np.isin(out, [spec.bos_index]).any()

    def test_min_output_length(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        out, _, _ = greedy(params, model, spec, enc, None, src_mask, 16,
                           min_output_length=5)
        for row in out:
            eos_pos = np.where(row == spec.eos_index)[0]
            if len(eos_pos):
                assert eos_pos[0] >= 4  # eos at position >= min_output_length-1

    def test_no_unk_generation(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        out, _, _ = greedy(params, model, spec, enc, None, src_mask, 16,
                           generate_unk=False)
        assert not np.isin(out, [spec.unk_index]).any()

    def test_forced_prefix(self, mt_model):
        """Prompted decoding: forced tokens appear verbatim
        (joeynmt/search.py:228-317)."""
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        # force first 3 generated tokens to 7, 8, 9 (prompt incl. BOS at pos 0)
        decoder_prompt = np.array([[2, 7, 8, 9], [2, 10, 11, 12]], np.int32)
        trg_prompt_mask = np.ones_like(decoder_prompt)
        out, _, _ = greedy(params, model, spec, enc, None, src_mask, 16,
                           decoder_prompt=decoder_prompt,
                           trg_prompt_mask=trg_prompt_mask)
        np.testing.assert_array_equal(out[:, :3], decoder_prompt[:, 1:])

    def test_repetition_penalty_runs(self, mt_model):
        model, spec, params = mt_model
        src, enc, src_mask = encode(mt_model)
        out, _, _ = greedy(params, model, spec, enc, None, src_mask, 16,
                           repetition_penalty=2.0, encoder_input=np.asarray(src))
        assert out.shape == (B, 16)

    def test_ngram_blocker_blocks(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        out, _, _ = greedy(params, model, spec, enc, None, src_mask, 32,
                           no_repeat_ngram_size=2)
        # no repeated bigram of non-special tokens within generated prefix
        for row in out:
            toks = [t for t in row.tolist()]
            eos_pos = toks.index(spec.eos_index) if spec.eos_index in toks else len(toks)
            toks = toks[:eos_pos]
            bigrams = [tuple(toks[i:i + 2]) for i in range(len(toks) - 1)]
            non_special = [bg for bg in bigrams
                           if bg[1] not in spec.specials + spec.lang_tags]
            assert len(non_special) == len(set(non_special)), (row, non_special)


class TestBeam:
    def test_beam1_matches_greedy(self, mt_model):
        """k=1, alpha<=0 beam == greedy tokens (test_search.py invariant)."""
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        g_out, _, _ = greedy(params, model, spec, enc, None, src_mask, 16)
        b_out, _, _ = beam_search(params, model, spec, enc, None, src_mask,
                                  1, 16, alpha=-1, n_best=1)
        for i in range(B):
            g_row = g_out[i]
            # greedy (like the reference transformer_greedy) does not ban pad,
            # beam does — compare up to the first pad/eos only
            stop = np.where((g_row == spec.eos_index) | (g_row == spec.pad_index))[0]
            g_trim = g_row[:stop[0] + 1] if len(stop) else g_row
            if len(g_trim) and g_trim[-1] == spec.pad_index:
                g_trim = g_trim[:-1]
            b_trim = b_out[i][:len(g_trim)]
            np.testing.assert_array_equal(g_trim, b_trim)

    def test_nbest_scores_descending(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        out, scores, _ = beam_search(params, model, spec, enc, None, src_mask,
                                     4, 16, alpha=1.0, n_best=3,
                                     return_prob="hyp")
        assert out.shape[0] == B * 3
        scores = scores.reshape(B, 3)
        for i in range(B):
            row = scores[i]
            valid = row[row > -1e8]
            assert (np.diff(valid) <= 1e-6).all(), row

    def test_beam_forced_prefix(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        decoder_prompt = np.array([[2, 7, 8], [2, 10, 11]], np.int32)
        trg_prompt_mask = np.ones_like(decoder_prompt)
        out, _, _ = beam_search(params, model, spec, enc, None, src_mask,
                                3, 16, alpha=1.0, n_best=1,
                                decoder_prompt=decoder_prompt,
                                trg_prompt_mask=trg_prompt_mask)
        np.testing.assert_array_equal(out[:, :2], decoder_prompt[:, 1:])

    def test_all_hyps_end_with_eos_or_maxlen(self, mt_model):
        model, spec, params = mt_model
        _, enc, src_mask = encode(mt_model)
        out, _, _ = beam_search(params, model, spec, enc, None, src_mask,
                                4, 12, alpha=1.0, n_best=2)
        for row in out:
            toks = row[row != spec.pad_index]
            n_eos = (toks == spec.eos_index).sum()
            assert n_eos <= 1
            if n_eos == 1:
                assert toks[-1] == spec.eos_index


class TestSearchEntry:
    def test_search_with_batch(self, mt_model):
        model, spec, params = mt_model
        rng = np.random.RandomState(1)
        trg = np.concatenate([np.full((B, 1), 2),
                              rng.randint(4, VOCAB_SIZE, size=(B, 4)),
                              np.full((B, 1), 3)], axis=1)
        batch = Batch(src=rng.randint(4, VOCAB_SIZE, size=(B, S)).astype(np.int32),
                      src_length=np.full((B,), S, np.int32), src_prompt_mask=None,
                      trg=trg, trg_length=np.full((B,), 6), trg_prompt_mask=None,
                      indices=np.arange(B), pad_index=1, eos_index=3,
                      is_train=False, task="MT")
        out, scores, att = search(params, model, spec, batch,
                                  max_output_length=-1, beam_size=1, beam_alpha=-1)
        # adaptive max length: 1.5 * src_len, bucketed
        assert out.shape[1] <= 16


class TestRecurrentGreedy:
    def test_rnn_greedy_shapes(self):
        """Recurrent greedy decode (joeynmt/search.py:64-159 equivalent)."""
        from joeys2t_tpu.config import SpecialSymbols
        from joeys2t_tpu.models import build_model
        from joeys2t_tpu.vocabulary import Vocabulary

        vocab = Vocabulary([f"t{i}" for i in range(16)], SpecialSymbols())
        cfg = {"encoder": {"type": "recurrent", "rnn_type": "gru",
                           "hidden_size": 12, "num_layers": 1,
                           "bidirectional": True,
                           "embeddings": {"embedding_dim": 8}},
               "decoder": {"type": "recurrent", "rnn_type": "gru",
                           "hidden_size": 12, "num_layers": 1,
                           "attention": "bahdanau", "init_hidden": "bridge",
                           "embeddings": {"embedding_dim": 8}}}
        model, spec = build_model(cfg, src_vocab=vocab, trg_vocab=vocab)
        b, s = 2, 6
        src = jnp.asarray(np.random.RandomState(0).randint(4, 16, size=(b, s)),
                          jnp.int32)
        src_mask = jnp.ones((b, 1, s), bool)
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, src, jnp.ones((b, 3), jnp.int32),
            jnp.full((b,), s, jnp.int32), src_mask,
            jnp.ones((b, 1, 3), bool))["params"]
        enc, hidden, msk = model.apply(
            {"params": params}, src, jnp.full((b,), s, jnp.int32), src_mask,
            method="encode")
        out, scores, att = greedy(params, model, spec, enc, hidden, msk, 10,
                                  return_prob="hyp")
        assert out.shape == (b, 10)
        assert scores.shape == (b, 10)
        assert att.shape == (b, 10, s)
        # pad/bos/lang tags never generated by the rnn path
        assert not np.isin(out, [spec.pad_index, spec.bos_index]).any()


class TestInt8CrossCache:
    """Opt-in int8 cross-KV cache (decoders.py init_cache): decode results
    must track the float cache closely; serving optimization, no reference
    equivalent."""

    def test_matches_float_cache(self, mt_model):
        model, spec, params = mt_model
        cfg8 = {
            "cache_cross_int8": True,
            "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
            "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
        }
        vocab = Vocabulary([f"t{i}" for i in range(VOCAB_SIZE - 4)],
                           SpecialSymbols())
        model_q, _ = build_model(cfg8, src_vocab=vocab, trg_vocab=vocab)
        assert model_q.decoder.cache_cross_int8

        src, enc, src_mask = encode(mt_model)
        out_fp, sc_fp, _ = greedy(params, model, spec, enc, None, src_mask, 12,
                                  return_prob="hyp")
        out_q, sc_q, _ = greedy(params, model_q, spec, enc, None, src_mask, 12,
                                return_prob="hyp")
        np.testing.assert_array_equal(out_fp, out_q)
        np.testing.assert_allclose(sc_fp, sc_q, atol=5e-3)

        cache = model_q.apply({"params": params}, enc, 13, method="init_cache")
        layer = cache["layer_0"]
        assert layer["cross_k"].dtype == jnp.int8
        cache_fp = model.apply({"params": params}, enc, 13, method="init_cache")
        deq = (np.asarray(layer["cross_k"], np.float32)
               * np.asarray(layer["cross_k_scale"])[:, :, None, :])
        ref = np.asarray(cache_fp["layer_0"]["cross_k"])
        assert np.abs(deq - ref).max() / (np.abs(ref).max() + 1e-9) < 0.01


    def test_greedy_with_int8_self_cache(self, mt_model):
        """cache_self_int8: the self ring buffers are stored int8 with
        per-position scales (quantize_per_position at write, dequant folded
        into the score/context einsums at read). Greedy tokens must track
        the float cache; scores drift only by the ~0.4% quantization
        perturbation."""
        model, spec, params = mt_model
        vocab = Vocabulary([f"t{i}" for i in range(VOCAB_SIZE - 4)],
                           SpecialSymbols())
        cfg8 = {
            "cache_cross_int8": True,
            "cache_self_int8": True,
            "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
            "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
        }
        model_q, _ = build_model(cfg8, src_vocab=vocab, trg_vocab=vocab)
        assert model_q.decoder.cache_self_int8

        src, enc, src_mask = encode(mt_model)
        out_fp, sc_fp, _ = greedy(params, model, spec, enc, None, src_mask, 12,
                                  return_prob="hyp")
        out_q, sc_q, _ = greedy(params, model_q, spec, enc, None, src_mask, 12,
                                return_prob="hyp")
        np.testing.assert_array_equal(out_fp, out_q)
        np.testing.assert_allclose(sc_fp, sc_q, atol=1e-2)

        cache = model_q.apply({"params": params}, enc, 13, method="init_cache")
        layer = cache["layer_0"]
        assert layer["self_k"].dtype == jnp.int8
        assert "self_k_scale" in layer

    def test_beam_search_with_int8_cache(self, mt_model):
        """Beam search must carry the int8 cache (incl. scale entries)
        through the while_loop and produce the same tokens."""
        model, spec, params = mt_model
        vocab = Vocabulary([f"t{i}" for i in range(VOCAB_SIZE - 4)],
                           SpecialSymbols())
        cfg8 = {
            "cache_cross_int8": True,
            "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
            "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
        }
        model_q, _ = build_model(cfg8, src_vocab=vocab, trg_vocab=vocab)
        src, enc, src_mask = encode(mt_model)
        out_fp, sc_fp, _ = beam_search(params, model, spec, enc, None,
                                       src_mask, 3, 10, 1.0, return_prob="hyp")
        out_q, sc_q, _ = beam_search(params, model_q, spec, enc, None,
                                     src_mask, 3, 10, 1.0, return_prob="hyp")
        # an untrained model has near-tie beams, so the ~0.3% quantization
        # perturbation may legally reorder them; compare order-insensitively
        assert out_q.shape == out_fp.shape
        np.testing.assert_allclose(np.sort(sc_fp.ravel()),
                                   np.sort(sc_q.ravel()), atol=7e-3)


class TestLazyBeamReorder:
    """The ancestry-indexed beam path (modules.step_self_ancestry, default
    `auto`) must be bit-identical to the classic physical cache permute —
    same hypotheses AND same scores, including n-best and prompts."""

    def _run(self, mt_model, mode, model_override=None, **kw):
        # `beam_reorder` reaches beam_search as a plain kwarg: config-parse
        # time owns the JOEYS2T_BEAM_REORDER env override
        # (config.parse_test_args), search.py never reads the environment
        model, spec, params = mt_model
        if model_override is not None:
            model = model_override
        _, enc, src_mask = encode(mt_model)
        return beam_search(params, model, spec, enc, None, src_mask,
                           4, 16, alpha=1.0, n_best=3,
                           return_prob="hyp", beam_reorder=mode, **kw)

    def test_identical_to_physical(self, mt_model):
        out_l, sc_l, _ = self._run(mt_model, "lazy")
        out_p, sc_p, _ = self._run(mt_model, "physical")
        np.testing.assert_array_equal(out_l, out_p)
        # scores agree to f32 reassociation (the ancestry path contracts the
        # score einsum with an extra one-hot sum, reordering the adds)
        np.testing.assert_allclose(sc_l, sc_p, rtol=0, atol=3e-5)

    def test_identical_with_prompt(self, mt_model):
        decoder_prompt = np.array([[2, 7, 8], [2, 10, 11]], np.int32)
        mask = np.array([[1, 1, 1], [1, 1, 1]], np.int32)
        kw = dict(decoder_prompt=decoder_prompt, trg_prompt_mask=mask)
        out_l, sc_l, _ = self._run(mt_model, "lazy", **kw)
        out_p, sc_p, _ = self._run(mt_model, "physical", **kw)
        np.testing.assert_array_equal(out_l, out_p)
        np.testing.assert_allclose(sc_l, sc_p, rtol=0, atol=3e-5)

    def test_identical_with_int8_self_cache(self, mt_model):
        """int8 self ring buffers compose with the ancestry map: scales are
        stored per physical row and read through the same anc[b,k,s] index
        as the int8 values, so lazy must equal physical on the SAME
        quantized model — both paths quantize identically at write, the
        only difference is where the beam permute happens."""
        _, spec, params = mt_model
        vocab = Vocabulary([f"t{i}" for i in range(VOCAB_SIZE - 4)],
                           SpecialSymbols())
        cfg8 = {
            "cache_cross_int8": True,
            "cache_self_int8": True,
            "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
            "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
        }
        model_q, _ = build_model(cfg8, src_vocab=vocab, trg_vocab=vocab)
        out_l, sc_l, _ = self._run(mt_model, "lazy", model_override=model_q)
        out_p, sc_p, _ = self._run(mt_model, "physical",
                                   model_override=model_q)
        np.testing.assert_array_equal(out_l, out_p)
        np.testing.assert_allclose(sc_l, sc_p, rtol=0, atol=3e-5)
