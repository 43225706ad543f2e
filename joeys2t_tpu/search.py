# coding: utf-8
"""
Search: greedy + beam decoding (counterpart of joeynmt/search.py).

TPU-native redesign. The reference re-decodes the full prefix at every step
with dynamic shapes and CPU-list n-gram blocking (joeynmt/search.py:240-253,
915-969); here everything is a jit-compiled ``lax.while_loop`` over a KV
cache with static shapes:
  - one compilation per (batch, src_len, max_len) bucket
  - beam state is fixed-shape (alive K + finished top-K store) instead of the
    reference's batch shrinking (search.py:719-773); collection rules mirror
    search.py:679-717 (newly-eos-ended candidates only, max-len flush,
    per-example freeze once all K candidates finished)
  - repetition penalty / n-gram blocking run on device via scatter ops
Behavioral contracts kept: forbidden token sets, min/max output length, GNMT
length penalty ((5+len)/6)^alpha (search.py:626-628), n-best padding with UNK
(search.py:795-804), forced prefix (prompt) decoding.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from joeys2t_tpu.data.batch import Batch, round_up_to_bucket
from joeys2t_tpu.models.model import ModelSpec, Seq2SeqModel
from joeys2t_tpu.models.rnn import RecurrentDecoder

NEG_INF = -1.0e9

__all__ = ["greedy", "beam_search", "search"]


# --------------------------------------------------------------------- utils
def _apply_token_bans(log_probs: jnp.ndarray, spec: ModelSpec, step: jnp.ndarray,
                      generate_unk: bool, min_output_length: int) -> jnp.ndarray:
    """Forbid bos/sep/lang_tags (+unk, +eos before min length)
    (joeynmt/search.py:287-297)."""
    for tok in spec.forbidden_at_generation:
        if tok < log_probs.shape[-1]:
            log_probs = log_probs.at[:, tok].set(NEG_INF)
    if not generate_unk:
        log_probs = log_probs.at[:, spec.unk_index].set(NEG_INF)
    log_probs = jnp.where(step < min_output_length,
                          log_probs.at[:, spec.eos_index].set(NEG_INF), log_probs)
    return log_probs


def _penalize_repetition(log_probs: jnp.ndarray, tokens: jnp.ndarray,
                         valid: jnp.ndarray, penalty: float,
                         exclude: Tuple[int, ...]) -> jnp.ndarray:
    """HF-style repetition penalty on device (joeynmt/search.py:972-1001).

    tokens: (B, L) token history; valid: (B, L) bool validity."""
    b, v = log_probs.shape
    seen = jnp.zeros((b, v), bool)
    rows = jnp.arange(b)[:, None].repeat(tokens.shape[1], 1)
    seen = seen.at[rows, tokens].max(valid)
    for tok in exclude:
        if tok < v:
            seen = seen.at[:, tok].set(False)
    penalized = jnp.where(log_probs < 0, log_probs * penalty, log_probs / penalty)
    return jnp.where(seen, penalized, log_probs)


def _block_repeat_ngrams(log_probs: jnp.ndarray, tokens: jnp.ndarray,
                         step: jnp.ndarray, ngram_size: int,
                         exclude: Tuple[int, ...]) -> jnp.ndarray:
    """fairseq-style n-gram blocker on device (joeynmt/search.py:915-969).

    tokens: (B, L_max) where positions 0..step are the prefix (pos 0 = BOS).
    If the (n-1)-token suffix matches tokens[i:i+n-1] (i >= 1, window fully
    inside the generated prefix), the token at i+n-1 is banned."""
    b, l_max = tokens.shape
    offset = ngram_size - 1
    v = log_probs.shape[-1]
    # suffix = tokens[step-offset+1 .. step]  (the last n-1 generated tokens)
    pos = jnp.arange(l_max)
    # gather suffix via dynamic indexing: suffix[k] = tokens[:, step-offset+1+k]
    suf_idx = step - offset + 1 + jnp.arange(offset)  # (offset,)
    suffix = tokens[:, jnp.clip(suf_idx, 0, l_max - 1)]  # (B, offset)

    # windows starting at i=1..: window[i] = tokens[:, i:i+offset]
    win_idx = jnp.arange(l_max)[:, None] + jnp.arange(offset)[None, :]  # (L, offset)
    win_idx = jnp.clip(win_idx, 0, l_max - 1)
    windows = tokens[:, win_idx]  # (B, L, offset)
    matches = jnp.all(windows == suffix[:, None, :], axis=-1)  # (B, L)

    # valid window starts: 1 <= i and i+offset <= step  (ignore BOS, stay in prefix)
    valid = (pos >= 1) & (pos + offset <= step)
    # the reference iterates i in range(1, step+2-n): i+offset <= step+1-? —
    # check_end_pos = step+2-n so i < step+2-n  =>  i+offset < step+1  =>  i+offset <= step
    matches = matches & valid[None, :]

    banned_tok = tokens[:, jnp.clip(win_idx[:, -1] + 1, 0, l_max - 1)]  # (B, L)
    rows = jnp.arange(b)[:, None].repeat(l_max, 1)
    ban_mask = jnp.zeros((b, v), bool).at[rows, banned_tok].max(matches)
    for tok in exclude:
        if tok < v:
            ban_mask = ban_mask.at[:, tok].set(False)
    active = step + 2 - ngram_size >= 1  # enough history
    return jnp.where(ban_mask & active, NEG_INF, log_probs)


def _cast_params_to_compute_dtype(params, model: Seq2SeqModel):
    """Cast float32 master params to the model's compute dtype inside jit.

    flax keeps parameters in float32 and re-casts them at every use; inside
    the decode while_loop that means re-reading 2x the bytes of every weight
    matrix from HBM on each of the ~max_len steps. Casting once before the
    loop is loop-invariant (XLA hoists it), halving per-step weight traffic.
    float32 models are returned unchanged."""
    dtype = getattr(model.decoder, "dtype", jnp.float32)
    if dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)


# -------------------------------------------------------------------- greedy
@partial(jax.jit, static_argnames=(
    "model", "spec", "max_output_length", "min_output_length", "generate_unk",
    "return_prob", "return_attention", "repetition_penalty",
    "no_repeat_ngram_size", "has_prompt", "has_encoder_input"))
def _transformer_greedy_jit(
    params,
    model: Seq2SeqModel,
    spec: ModelSpec,
    encoder_output: jnp.ndarray,
    src_mask: jnp.ndarray,
    max_output_length: int,
    min_output_length: int = 1,
    generate_unk: bool = True,
    return_prob: bool = False,
    return_attention: bool = False,
    repetition_penalty: float = -1.0,
    no_repeat_ngram_size: int = -1,
    encoder_input: Optional[jnp.ndarray] = None,
    decoder_prompt: Optional[jnp.ndarray] = None,
    trg_prompt_mask: Optional[jnp.ndarray] = None,
    has_prompt: bool = False,
    has_encoder_input: bool = False,
):
    """Greedy loop (joeynmt/search.py:162-342) as lax.while_loop over the KV
    cache. Returns (ys incl BOS (B, L+1), scores (B, L), att (B, L, S))."""
    b = encoder_output.shape[0]
    s = src_mask.shape[-1]
    l1 = max_output_length + 1

    compute_softmax = (return_prob or repetition_penalty > 0
                       or no_repeat_ngram_size > 0 or has_encoder_input)

    params = _cast_params_to_compute_dtype(params, model)
    cache = model.apply({"params": params}, encoder_output, l1,
                        src_valid=src_mask[:, 0, :], method="init_cache")
    ys = jnp.full((b, l1), spec.pad_index, jnp.int32).at[:, 0].set(spec.bos_index)
    yv = jnp.zeros((b, l1), jnp.float32)
    yt = jnp.zeros((b, l1, s), jnp.float32) if return_attention else jnp.zeros((1,))
    finished = jnp.zeros((b,), bool)

    if has_prompt:
        # pad prompt arrays out to l1 for static indexing
        dp = jnp.full((b, l1), spec.pad_index, jnp.int32)
        dp = jax.lax.dynamic_update_slice(
            dp, decoder_prompt[:, :min(decoder_prompt.shape[1], l1)], (0, 0))
        pm = jnp.zeros((b, l1), jnp.int32)
        pm = jax.lax.dynamic_update_slice(
            pm, trg_prompt_mask[:, :min(trg_prompt_mask.shape[1], l1)], (0, 0))
    else:
        dp = pm = None

    def cond(state):
        step, ys, yv, yt, cache, finished = state
        return (step < max_output_length) & ~jnp.all(finished)

    def body(state):
        step, ys, yv, yt, cache, finished = state
        prev = jax.lax.dynamic_slice(ys, (0, step), (b, 1))
        prompt_t = None
        if has_prompt:
            prompt_t = jax.lax.dynamic_slice(pm, (0, step), (b, 1))
        logits, cache, att = model.apply(
            {"params": params}, prev, step, cache, src_mask,
            trg_prompt_mask_t=prompt_t, return_attention=return_attention,
            method="decode_step")
        log_probs = logits[:, 0].astype(jnp.float32)
        if compute_softmax:
            log_probs = jax.nn.log_softmax(log_probs, axis=-1)
            if no_repeat_ngram_size > 1:
                log_probs = _block_repeat_ngrams(
                    log_probs, ys, step, no_repeat_ngram_size,
                    spec.specials + spec.lang_tags)
                if has_encoder_input:
                    # ban ngram continuations appearing in the source too
                    log_probs = _block_src_ngrams(
                        log_probs, ys, step, encoder_input, no_repeat_ngram_size,
                        spec.specials + spec.lang_tags)
            if repetition_penalty > 1.0:
                hist_valid = jnp.arange(l1)[None, :] <= step
                log_probs = _penalize_repetition(
                    log_probs, ys, hist_valid, repetition_penalty,
                    spec.specials + spec.lang_tags)
                if has_encoder_input:
                    src_valid = jnp.ones_like(encoder_input, dtype=bool)
                    log_probs = _penalize_repetition(
                        log_probs, encoder_input, src_valid, repetition_penalty,
                        spec.specials + spec.lang_tags)
        log_probs = _apply_token_bans(log_probs, spec, step, generate_unk,
                                      min_output_length)

        prob = jnp.max(log_probs, axis=-1)
        next_word = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)

        if has_prompt:
            forced_word = jax.lax.dynamic_slice(dp, (0, step + 1), (b, 1))[:, 0]
            forced_mask = jax.lax.dynamic_slice(pm, (0, step + 1), (b, 1))[:, 0] > 0
            next_word = jnp.where(forced_mask, forced_word, next_word)
            prob = jnp.where(forced_mask, 0.0, prob)

        # don't overwrite finished rows with new tokens (they emit pad)
        next_word = jnp.where(finished, spec.pad_index, next_word)
        prob = jnp.where(finished, 0.0, prob)

        ys = jax.lax.dynamic_update_slice(ys, next_word[:, None], (0, step + 1))
        yv = jax.lax.dynamic_update_slice(yv, prob[:, None], (0, step + 1))
        if return_attention:
            att_row = att[:, 0].astype(jnp.float32)
            att_row = jnp.where(finished[:, None], 0.0, att_row)
            yt_new = jax.lax.dynamic_update_slice(yt, att_row[:, None, :],
                                                  (0, step + 1, 0))
        else:
            yt_new = yt
        finished = finished | (next_word == spec.eos_index)
        return step + 1, ys, yv, yt_new, cache, finished

    init = (jnp.int32(0), ys, yv, yt, cache, finished)
    _, ys, yv, yt, _, _ = jax.lax.while_loop(cond, body, init)
    return ys, yv, yt


def _block_src_ngrams(log_probs, ys, step, src_tokens, ngram_size, exclude):
    """Source-side n-gram blocking (joeynmt/search.py:956-963): if the target
    suffix matches an (n-1)-gram in the source, ban the source's next token."""
    b, s = src_tokens.shape
    offset = ngram_size - 1
    v = log_probs.shape[-1]
    l_max = ys.shape[1]
    suf_idx = step - offset + 1 + jnp.arange(offset)
    suffix = ys[:, jnp.clip(suf_idx, 0, l_max - 1)]
    win_idx = jnp.arange(s)[:, None] + jnp.arange(offset)[None, :]
    valid_start = jnp.arange(s) + offset <= s - 1  # i+offset within src
    win_idx = jnp.clip(win_idx, 0, s - 1)
    windows = src_tokens[:, win_idx]
    matches = jnp.all(windows == suffix[:, None, :], axis=-1) & valid_start[None, :]
    banned_tok = src_tokens[:, jnp.clip(win_idx[:, -1] + 1, 0, s - 1)]
    rows = jnp.arange(b)[:, None].repeat(s, 1)
    ban_mask = jnp.zeros((b, v), bool).at[rows, banned_tok].max(matches)
    for tok in exclude:
        if tok < v:
            ban_mask = ban_mask.at[:, tok].set(False)
    active = step + 2 - ngram_size >= 1
    return jnp.where(ban_mask & active, NEG_INF, log_probs)


def transformer_greedy(params, model, spec, encoder_output, src_mask,
                       max_output_length, **kwargs):
    """Host wrapper: prepares static flags, runs the jitted loop, trims BOS."""
    return_prob = kwargs.get("return_prob", "none") == "hyp"
    return_attention = kwargs.get("return_attention", False)
    decoder_prompt = kwargs.get("decoder_prompt", None)
    trg_prompt_mask = kwargs.get("trg_prompt_mask", None)
    encoder_input = kwargs.get("encoder_input", None)
    has_prompt = decoder_prompt is not None and trg_prompt_mask is not None

    ys, yv, yt = _transformer_greedy_jit(
        params, model, spec,
        jnp.asarray(encoder_output), jnp.asarray(src_mask),
        int(max_output_length),
        min_output_length=int(kwargs.get("min_output_length", 1)),
        generate_unk=bool(kwargs.get("generate_unk", True)),
        return_prob=return_prob,
        return_attention=return_attention,
        repetition_penalty=float(kwargs.get("repetition_penalty", -1)),
        no_repeat_ngram_size=int(kwargs.get("no_repeat_ngram_size", -1)),
        encoder_input=None if encoder_input is None else jnp.asarray(encoder_input),
        decoder_prompt=None if decoder_prompt is None else jnp.asarray(decoder_prompt),
        trg_prompt_mask=(None if trg_prompt_mask is None
                         else jnp.asarray(trg_prompt_mask)),
        has_prompt=has_prompt,
        has_encoder_input=encoder_input is not None,
    )
    # ONE overlapped device->host fetch: jax.device_get starts the async
    # host copies for every leaf before blocking, so the ~30ms tunnel RTTs
    # overlap. Sequential np.asarray calls serialize them (measured +30ms
    # per extra array per batch on the axon backend).
    ys, yv, yt = jax.device_get(
        (ys, yv if return_prob else None, yt if return_attention else None))
    output = ys[:, 1:]
    scores = yv[:, 1:] if return_prob else None
    attention = yt[:, 1:, :] if return_attention else None
    return output, scores, attention


def recurrent_greedy(params, model, spec, encoder_output, encoder_hidden,
                     src_mask, max_output_length, **kwargs):
    """RNN greedy (joeynmt/search.py:64-159) — legacy MT path, host loop over
    the recurrent step."""
    b = encoder_output.shape[0]
    generate_unk = kwargs.get("generate_unk", True)
    min_output_length = kwargs.get("min_output_length", 1)
    return_prob = kwargs.get("return_prob", "none") == "hyp"

    prev_y = np.full((b, 1), spec.bos_index, np.int32)
    output, scores, attention_scores = [], [], []
    hidden, prev_att_vector = None, None
    finished = np.zeros((b,), bool)

    for step in range(max_output_length):
        logits, hidden, att_probs, prev_att_vector, _ = model.apply(
            {"params": params}, jnp.asarray(prev_y), jnp.asarray(encoder_output),
            jnp.asarray(encoder_hidden), jnp.asarray(src_mask), 1,
            carry=hidden, prev_att_vector=prev_att_vector,
            method=_rnn_decode_method(model))
        out = np.asarray(logits[:, 0]).astype(np.float64)
        out[:, spec.bos_index] = -np.inf
        if return_prob:
            out = out - _logsumexp(out)
        for tok in spec.forbidden_at_generation:
            if tok < out.shape[1]:
                out[:, tok] = -np.inf
        if spec.pad_index < out.shape[1]:
            out[:, spec.pad_index] = -np.inf
        if not generate_unk:
            out[:, spec.unk_index] = -np.inf
        if step < min_output_length:
            out[:, spec.eos_index] = -np.inf
        next_word = out.argmax(axis=1).astype(np.int32)
        prob = out.max(axis=1)
        output.append(next_word.copy())
        if return_prob:
            scores.append(prob.copy())
        prev_y = next_word[:, None]
        attention_scores.append(np.asarray(att_probs)[:, 0, :])
        finished |= next_word == spec.eos_index
        if finished.all():
            break

    stacked_output = np.stack(output, axis=1)
    stacked_scores = np.stack(scores, axis=1) if return_prob else None
    stacked_attention = np.stack(attention_scores, axis=1)
    return stacked_output, stacked_scores, stacked_attention


def _rnn_decode_method(model):
    def decode_rnn(mdl, trg_input, encoder_output, encoder_hidden, src_mask,
                   unroll_steps, carry=None, prev_att_vector=None):
        trg_embed = mdl.trg_embed(trg_input)
        return mdl.decoder(trg_embed=trg_embed, encoder_output=encoder_output,
                           encoder_hidden=encoder_hidden, src_mask=src_mask,
                           unroll_steps=unroll_steps, carry=carry,
                           prev_att_vector=prev_att_vector, deterministic=True)

    return decode_rnn


def _logsumexp(x):
    m = x.max(axis=1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=1, keepdims=True))


def greedy(params, model, spec, encoder_output, encoder_hidden, src_mask,
           max_output_length, **kwargs):
    """Dispatch (joeynmt/search.py:21-61)."""
    if isinstance(model.decoder, RecurrentDecoder):
        return recurrent_greedy(params, model, spec, encoder_output, encoder_hidden,
                                src_mask, max_output_length, **kwargs)
    return transformer_greedy(params, model, spec, encoder_output, src_mask,
                              max_output_length, **kwargs)


# ---------------------------------------------------------------------- beam
@partial(jax.jit, static_argnames=(
    "model", "spec", "beam_size", "max_output_length", "alpha", "n_best",
    "min_output_length", "generate_unk", "repetition_penalty",
    "no_repeat_ngram_size", "has_prompt", "has_encoder_input",
    "lazy_reorder"))
def _beam_search_jit(
    params,
    model: Seq2SeqModel,
    spec: ModelSpec,
    encoder_output: jnp.ndarray,  # (B, S, H)
    src_mask: jnp.ndarray,  # (B, 1, S)
    beam_size: int,
    max_output_length: int,
    alpha: float,
    n_best: int,
    min_output_length: int = 1,
    generate_unk: bool = True,
    repetition_penalty: float = -1.0,
    no_repeat_ngram_size: int = -1,
    encoder_input: Optional[jnp.ndarray] = None,
    decoder_prompt: Optional[jnp.ndarray] = None,
    trg_prompt_mask: Optional[jnp.ndarray] = None,
    has_prompt: bool = False,
    has_encoder_input: bool = False,
    lazy_reorder: bool = False,
):
    """Fixed-shape beam search. Returns (fin_seqs (B, K, L+1), fin_scores
    (B, K)) sorted by score desc; host selects n_best.

    ``lazy_reorder``: self-attention resolves beam selection through a
    (B, K, S) ancestry map (modules.step_self_ancestry) instead of
    physically permuting the self K/V ring buffers every step — the
    permute is a pure HBM copy measured at 38% of beam wall time."""
    b, s, h = encoder_output.shape
    k = beam_size
    v = spec.trg_vocab_size
    l1 = max_output_length + 1
    bk = b * k

    def tile(x):
        return jnp.repeat(x, k, axis=0)

    params = _cast_params_to_compute_dtype(params, model)
    # cross K/V caches and src_mask stay UNTILED at batch B: every beam of a
    # batch element shares its cross cache (they are never written), so the
    # decode loop reads them from HBM once per step instead of K times —
    # the dominant decode traffic. Only the self ring buffers carry B*K rows.
    msk = src_mask
    cache = model.apply({"params": params}, encoder_output, l1,
                        src_valid=msk[:, 0, :], method="init_cache")
    cache = {
        layer: {key: (tile(val) if key.startswith("self_") else val)
                for key, val in entries.items()}
        for layer, entries in cache.items()
    }

    if has_encoder_input:
        enc_in = tile(encoder_input)
    if has_prompt:
        dp = jnp.full((bk, l1), spec.pad_index, jnp.int32)
        dp = jax.lax.dynamic_update_slice(
            dp, tile(decoder_prompt)[:, :min(decoder_prompt.shape[1], l1)], (0, 0))
        pm = jnp.zeros((bk, l1), jnp.int32)
        pm = jax.lax.dynamic_update_slice(
            pm, tile(trg_prompt_mask)[:, :min(trg_prompt_mask.shape[1], l1)], (0, 0))

    alive_seq = jnp.full((bk, l1), spec.pad_index, jnp.int32).at[:, 0].set(spec.bos_index)
    # first beam gets log-prob 0, the rest -inf (joeynmt/search.py:477-479)
    topk_log_probs = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    is_finished = jnp.zeros((b, k), bool)
    done = jnp.zeros((b,), bool)

    fin_scores = jnp.full((b, k), NEG_INF)
    fin_seqs = jnp.full((b, k, l1), spec.pad_index, jnp.int32)
    # ancestry invariant: slots > step hold their own row index (each row
    # writes its next token into its own slot before selection)
    ancestry = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, k, l1)) \
        if lazy_reorder else None

    def cond(state):
        step = state[0]
        done = state[6]
        return (step < max_output_length) & ~jnp.all(done)

    def body(state):
        if lazy_reorder:
            (step, alive_seq, topk_log_probs, cache, fin_scores, fin_seqs,
             done, is_finished, ancestry) = state
        else:
            (step, alive_seq, topk_log_probs, cache, fin_scores, fin_seqs,
             done, is_finished) = state
            ancestry = None

        prev = jax.lax.dynamic_slice(alive_seq, (0, step), (bk, 1))
        prompt_t = None
        if has_prompt:
            prompt_t = jax.lax.dynamic_slice(pm, (0, step), (bk, 1))
        logits, new_cache, _ = model.apply(
            {"params": params}, prev, step, cache, msk,
            trg_prompt_mask_t=prompt_t, beam_k=k, ancestry=ancestry,
            method="decode_step")
        log_probs = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)

        if no_repeat_ngram_size > 0:
            log_probs = _block_repeat_ngrams(log_probs, alive_seq, step,
                                             no_repeat_ngram_size,
                                             spec.specials + spec.lang_tags)
            if has_encoder_input:
                log_probs = _block_src_ngrams(log_probs, alive_seq, step, enc_in,
                                              no_repeat_ngram_size,
                                              spec.specials + spec.lang_tags)
        if repetition_penalty > 1.0:
            hist_valid = jnp.arange(l1)[None, :] <= step
            log_probs = _penalize_repetition(log_probs, alive_seq, hist_valid,
                                             repetition_penalty,
                                             spec.specials + spec.lang_tags)
            if has_encoder_input:
                log_probs = _penalize_repetition(
                    log_probs, enc_in, jnp.ones_like(enc_in, dtype=bool),
                    repetition_penalty, spec.specials + spec.lang_tags)

        # forbidden tokens incl. pad (joeynmt/search.py:591-601)
        for tok in spec.forbidden_at_generation + (spec.pad_index,):
            if tok < v:
                log_probs = log_probs.at[:, tok].set(NEG_INF)
        if not generate_unk:
            log_probs = log_probs.at[:, spec.unk_index].set(NEG_INF)
        log_probs = jnp.where(step < min_output_length,
                              log_probs.at[:, spec.eos_index].set(NEG_INF), log_probs)

        # forced decoding: overwrite row with one-hot zero at forced token
        if has_prompt:
            forced_word = jax.lax.dynamic_slice(dp, (0, step + 1), (bk, 1))[:, 0]
            forced_mask = jax.lax.dynamic_slice(pm, (0, step + 1), (bk, 1))[:, 0] > 0
            forced_row = jnp.full((bk, v), NEG_INF).at[
                jnp.arange(bk), forced_word].set(0.0)
            log_probs = jnp.where(forced_mask[:, None], forced_row, log_probs)

        # add beam scores (joeynmt/search.py:622)
        log_probs = log_probs + topk_log_probs.reshape(-1)[:, None]
        curr_scores = log_probs
        length_penalty = 1.0
        if alpha > 0:
            length_penalty = ((5.0 + (step + 1.0)) / 6.0)**alpha
            curr_scores = curr_scores / length_penalty

        curr_scores = curr_scores.reshape(b, k * v)
        topk_scores, topk_ids = jax.lax.top_k(curr_scores, k)
        new_topk_log_probs = (topk_scores * length_penalty if alpha > 0
                              else topk_scores)

        topk_beam_index = topk_ids // v
        topk_token = topk_ids % v

        # map to flat indices and gather alive_seq + cache
        batch_index = (topk_beam_index
                       + (jnp.arange(b) * k)[:, None])  # (B, K)
        select = batch_index.reshape(-1)
        alive_seq = alive_seq[select]
        alive_seq = jax.lax.dynamic_update_slice(
            alive_seq, topk_token.reshape(-1, 1), (0, step + 1))
        topk_log_probs = new_topk_log_probs
        if lazy_reorder:
            # no physical cache permute: compose the ancestry map instead.
            # New beam k's history row at every s <= step is whatever its
            # parent's map said (the map's s == step entry already points at
            # the row that just wrote this step's K/V); future slots reset
            # to own-row so the next write attends to itself.
            anc_sel = jnp.take_along_axis(ancestry, topk_beam_index[:, :, None],
                                          axis=1)  # (B, K, S)
            s_grid = jnp.arange(l1)[None, None, :]
            ancestry = jnp.where(
                s_grid > step, jnp.arange(k, dtype=jnp.int32)[None, :, None],
                anc_sel)
            cache = new_cache
        else:
            # only the self-attention ring buffers need reordering: cross
            # K/V (and their int8 scales, when present) are tiled
            # identically across a batch element's beams and never written,
            # and `select` permutes only within beam groups — skip
            # gathering them
            cache = {
                layer: {
                    key: (value[select] if key.startswith("self_") else value)
                    for key, value in entries.items()
                }
                for layer, entries in new_cache.items()
            }

        # finished bookkeeping (joeynmt/search.py:671-717); updates of
        # already-`done` examples are masked at collection time, so no state
        # freezing is needed
        seq_bk = alive_seq.reshape(b, k, l1)
        newly_eos = (topk_token == spec.eos_index)
        n_eos_before = jnp.sum(
            (seq_bk[:, :, 1:] == spec.eos_index)
            & (jnp.arange(1, l1)[None, None, :] <= step), axis=-1)
        # candidate hypothesis: ends with eos now, no earlier eos
        collectible = newly_eos & (n_eos_before == 0) & ~done[:, None]

        at_max = step + 1 == max_output_length
        no_eos_at_all = (n_eos_before == 0) & ~newly_eos
        collectible = collectible | (at_max & no_eos_at_all & ~done[:, None])

        cand_scores = jnp.where(collectible, topk_scores, NEG_INF)
        # merge into the finished store, keep top-k by score
        all_scores = jnp.concatenate([fin_scores, cand_scores], axis=1)  # (B, 2K)
        all_seqs = jnp.concatenate([fin_seqs, seq_bk], axis=1)  # (B, 2K, L1)
        best_scores, best_idx = jax.lax.top_k(all_scores, k)
        fin_scores = best_scores
        fin_seqs = jnp.take_along_axis(all_seqs, best_idx[:, :, None], axis=1)

        is_finished = (newly_eos | (n_eos_before > 0)
                       | (topk_scores < NEG_INF / 10.0) | at_max)
        done = done | jnp.all(is_finished, axis=1)

        out_state = (step + 1, alive_seq, topk_log_probs, cache, fin_scores,
                     fin_seqs, done, is_finished)
        return out_state + (ancestry,) if lazy_reorder else out_state

    init = (jnp.int32(0), alive_seq, topk_log_probs, cache, fin_scores, fin_seqs,
            done, is_finished)
    if lazy_reorder:
        init = init + (ancestry,)
    state = jax.lax.while_loop(cond, body, init)
    fin_scores, fin_seqs = state[4], state[5]
    return fin_seqs, fin_scores


def _recurrent_beam_search(params, model, spec, encoder_output, encoder_hidden,
                           src_mask, beam_size, max_output_length, alpha,
                           n_best=1, **kwargs):
    """Beam search for the legacy RNN decoder (joeynmt/search.py:345-825, the
    non-transformer branch): host-side loop, per-step state threading."""
    b = encoder_output.shape[0]
    k = beam_size
    v = spec.trg_vocab_size
    return_prob = kwargs.get("return_prob", "none") == "hyp"
    min_output_length = kwargs.get("min_output_length", 1)
    generate_unk = kwargs.get("generate_unk", True)

    def tile(x):
        return np.repeat(np.asarray(x), k, axis=0)

    enc = jnp.asarray(tile(encoder_output))
    msk = jnp.asarray(tile(src_mask))
    enc_hidden = jnp.asarray(tile(encoder_hidden))

    alive_seq = np.full((b * k, 1), spec.bos_index, np.int32)
    topk_log_probs = np.full((b, k), -np.inf)
    topk_log_probs[:, 0] = 0.0
    hypotheses = [[] for _ in range(b)]
    is_finished = np.zeros((b, k), bool)
    carry, att_vec = None, None

    decode_rnn = _rnn_decode_method(model)
    for step in range(max_output_length):
        prev = jnp.asarray(alive_seq[:, -1:])
        logits, carry, _, att_vec, _ = model.apply(
            {"params": params}, prev, enc, enc_hidden, msk, 1,
            carry=carry, prev_att_vector=att_vec, method=decode_rnn)
        log_probs = np.asarray(jax.nn.log_softmax(
            logits[:, 0].astype(jnp.float32), axis=-1)).astype(np.float64)

        for tok in spec.forbidden_at_generation + (spec.pad_index,):
            if tok < v:
                log_probs[:, tok] = -np.inf
        if not generate_unk:
            log_probs[:, spec.unk_index] = -np.inf
        if step < min_output_length:
            log_probs[:, spec.eos_index] = -np.inf

        log_probs += topk_log_probs.reshape(-1)[:, None]
        curr = log_probs.copy()
        lp = 1.0
        if alpha > 0:
            lp = ((5.0 + (step + 1)) / 6.0)**alpha
            curr /= lp
        curr = curr.reshape(b, k * v)
        topk_ids = np.argsort(-curr, axis=1)[:, :k]
        topk_scores = np.take_along_axis(curr, topk_ids, axis=1)
        topk_log_probs = topk_scores * lp if alpha > 0 else topk_scores.copy()
        beam_idx = topk_ids // v
        token = topk_ids % v

        select = (beam_idx + (np.arange(b) * k)[:, None]).reshape(-1)
        alive_seq = np.concatenate(
            [alive_seq[select], token.reshape(-1, 1).astype(np.int32)], axis=1)
        carry = jax.tree.map(lambda t: t[jnp.asarray(select)], carry)
        att_vec = att_vec[jnp.asarray(select)]

        newly_eos = token == spec.eos_index
        at_max = step + 1 == max_output_length
        for i in range(b):
            for j in range(k):
                if newly_eos[i, j] or (at_max and not is_finished[i, j]):
                    seq = alive_seq[i * k + j, 1:]
                    hypotheses[i].append((topk_scores[i, j], seq.copy()))
        is_finished = newly_eos | is_finished | ~np.isfinite(topk_scores)
        if at_max:
            is_finished[:] = True
        if is_finished.all():
            break
        # finished rows stop contributing (score -inf keeps them out of topk)
        topk_log_probs[is_finished] = -np.inf

    predictions, scores = [], []
    for i in range(b):
        best = sorted(hypotheses[i], key=lambda x: x[0], reverse=True)[:n_best]
        while len(best) < n_best:
            best.append((-1.0, np.array([spec.unk_index], np.int32)))
        for score, seq in best:
            predictions.append(np.asarray(seq, np.int64))
            scores.append(float(score))
    max_len = max(p.shape[0] for p in predictions)
    final = np.full((len(predictions), max_len), spec.pad_index, np.int64)
    for j, p in enumerate(predictions):
        final[j, :p.shape[0]] = p
    final_scores = (np.array(scores, np.float32)[:, None] if return_prob else None)
    return final, final_scores, None


def beam_search(params, model, spec, encoder_output, encoder_hidden, src_mask,
                beam_size, max_output_length, alpha, n_best=1, **kwargs):
    """Host wrapper (joeynmt/search.py:345-825). Returns
    (outputs (B*n_best, L), scores (B*n_best, 1) or None, None)."""
    assert beam_size > 0, "Beam size must be >0."
    assert n_best <= beam_size, (
        f"Can only return {beam_size} best hypotheses."
        "`n_best` must be smaller than or equal to `beam_size`.")
    if isinstance(model.decoder, RecurrentDecoder):
        return _recurrent_beam_search(
            params, model, spec, encoder_output, encoder_hidden, src_mask,
            beam_size, max_output_length, alpha, n_best=n_best, **kwargs)
    del encoder_hidden  # transformer only

    return_prob = kwargs.get("return_prob", "none") == "hyp"
    decoder_prompt = kwargs.get("decoder_prompt", None)
    trg_prompt_mask = kwargs.get("trg_prompt_mask", None)
    encoder_input = kwargs.get("encoder_input", None)
    has_prompt = decoder_prompt is not None and trg_prompt_mask is not None

    # beam-reorder strategy: "lazy" = ancestry-indexed self attention (no
    # physical cache permute; modules.step_self_ancestry), "physical" =
    # classic cache[select]. Configured via `testing: beam_reorder:` in the
    # YAML; the JOEYS2T_BEAM_REORDER env override is resolved at config
    # parse time (config.parse_test_args), never here in the decode path.
    # int8 self caches compose with ancestry: the per-position scales are
    # stored per physical row and read through the same ancestry index as
    # the int8 values (modules.step_self_ancestry), so lazy is the default
    # for every transformer cache dtype; cross-int8 composes trivially
    # because the beam reorder never touches cross caches.
    mode = kwargs.get("beam_reorder", "auto")
    lazy_reorder = (mode == "lazy" or mode == "auto") \
        and not isinstance(model.decoder, RecurrentDecoder)

    fin_seqs, fin_scores = _beam_search_jit(
        params, model, spec, jnp.asarray(encoder_output), jnp.asarray(src_mask),
        int(beam_size), int(max_output_length), float(alpha), int(n_best),
        min_output_length=int(kwargs.get("min_output_length", 1)),
        generate_unk=bool(kwargs.get("generate_unk", True)),
        repetition_penalty=float(kwargs.get("repetition_penalty", -1)),
        no_repeat_ngram_size=int(kwargs.get("no_repeat_ngram_size", -1)),
        encoder_input=None if encoder_input is None else jnp.asarray(encoder_input),
        decoder_prompt=None if decoder_prompt is None else jnp.asarray(decoder_prompt),
        trg_prompt_mask=(None if trg_prompt_mask is None
                         else jnp.asarray(trg_prompt_mask)),
        has_prompt=has_prompt,
        has_encoder_input=encoder_input is not None,
        lazy_reorder=lazy_reorder,
    )
    # one overlapped fetch for both outputs (see transformer_greedy): two
    # sequential np.asarray syncs cost two serial ~30ms tunnel round-trips
    # — ~35% of the whole beam batch latency at k=5 B=32
    fin_seqs, fin_scores = jax.device_get((fin_seqs, fin_scores))

    b = fin_seqs.shape[0]
    # cut BOS; trim each hyp after its eos; pad/stack n_best
    predictions, scores = [], []
    for i in range(b):
        for n in range(n_best):
            score = fin_scores[i, n]
            if score <= NEG_INF:  # unfilled slot (joeynmt/search.py:795-804)
                predictions.append(np.array([spec.unk_index], np.int64))
                scores.append(-1.0)
                continue
            seq = fin_seqs[i, n, 1:]  # drop BOS
            eos_pos = np.where(seq == spec.eos_index)[0]
            if len(eos_pos) > 0:
                seq = seq[:eos_pos[0] + 1]
            predictions.append(seq.astype(np.int64))
            scores.append(float(score))

    max_len = max(p.shape[0] for p in predictions)
    final_outputs = np.full((len(predictions), max_len), spec.pad_index, np.int64)
    for j, p in enumerate(predictions):
        final_outputs[j, :p.shape[0]] = p
    assert final_outputs.shape[0] == b * n_best
    final_scores = (np.array(scores, np.float32)[:, None] if return_prob else None)
    return final_outputs, final_scores, None


# -------------------------------------------------------------------- search
@partial(jax.jit, static_argnames=("model",))
def _encode_jit(params, src, src_length, src_mask, model: Seq2SeqModel):
    """Jitted encode for the search entry: one compile per shape bucket.
    (Eager module application is pathologically slow on remote devices.)"""
    return model.apply({"params": params}, src, src_length, src_mask,
                       method="encode")


def search(params, model, spec, batch: Batch, max_output_length: int,
           beam_size: int, beam_alpha: float, n_best: int = 1, **kwargs):
    """Entry point (joeynmt/search.py:828-912): encode once, adapt max length,
    dispatch greedy vs beam. When a default mesh is installed, inputs are
    placed with dim-0 data sharding so the jitted encode/decode loops
    partition across the mesh (GSPMD propagates through the while_loop)."""
    from joeys2t_tpu.helpers import cast_features_for_upload
    from joeys2t_tpu.parallel.mesh import maybe_shard_batch

    src = maybe_shard_batch(jnp.asarray(cast_features_for_upload(
        batch.src, model)))
    src_length = maybe_shard_batch(jnp.asarray(batch.src_length))
    src_mask_in = None if batch.src_mask is None else maybe_shard_batch(
        jnp.asarray(batch.src_mask))
    encoder_output, encoder_hidden, src_mask = _encode_jit(
        params, src, src_length, src_mask_in, model=model)
    if batch.src_mask is not None:
        src_mask = jnp.asarray(batch.src_mask)
    assert src_mask is not None

    if max_output_length < 0:  # adapt to src len (joeynmt/search.py:862-864)
        max_output_length = int(np.max(batch.src_length) * 1.5)
    # bucket to limit recompiles of the jitted loops
    max_output_length = round_up_to_bucket(max_output_length)

    if (kwargs.get("no_repeat_ngram_size", -1) > 1
            or kwargs.get("repetition_penalty", -1) > 1):
        if batch.task == "MT":
            kwargs["encoder_input"] = batch.src

    if batch.has_trg and batch.trg_prompt_mask is not None:
        kwargs["decoder_prompt"] = batch.trg_input
        kwargs["trg_prompt_mask"] = batch.trg_prompt_mask

    if beam_size < 2:
        kwargs.pop("beam_reorder", None)  # beam-only knob
        stacked_output, stacked_scores, stacked_attention = greedy(
            params, model, spec, encoder_output, encoder_hidden, src_mask,
            max_output_length, **kwargs)
    else:
        stacked_output, stacked_scores, stacked_attention = beam_search(
            params, model, spec, encoder_output, encoder_hidden, src_mask,
            beam_size, max_output_length, beam_alpha, n_best=n_best, **kwargs)

    return stacked_output, stacked_scores, stacked_attention
