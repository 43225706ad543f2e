# coding: utf-8
"""
Prediction: shared validation/eval/inference engine
(counterpart of joeynmt/prediction.py).

predict() iterates the eval data, optionally computes loss/ppl/acc with a
jitted eval step, runs the jit-compiled search per batch, restores original
order, detokenizes, and computes metrics. Note: the reference leaves
loss/ppl/acc unassigned in valid_scores (joeynmt/prediction.py:263-273
computes the normalizer but never writes the scores — an upstream
regression); here the intended values are filled in.
"""
import math
import sys
import time
from functools import partial
from itertools import zip_longest
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from joeys2t_tpu.config import BaseConfig, TestConfig, parse_global_args
from joeys2t_tpu.data.batch import Batch
from joeys2t_tpu.data.datasets import SpeechStreamDataset, StreamDataset
from joeys2t_tpu.data.loader import load_data
from joeys2t_tpu.helpers import (
    cast_features_for_upload,
    expand_reverse_index,
    resolve_ckpt_path,
    save_hypothese,
    set_seed,
    write_list_to_file,
)
from joeys2t_tpu.checkpoints import load_checkpoint
from joeys2t_tpu.losses import XentCTCLoss, XentLoss
from joeys2t_tpu.metrics import bleu, chrf, sequence_accuracy, token_accuracy, wer
from joeys2t_tpu.models import build_model
from joeys2t_tpu.models.initialization import initialize_model
from joeys2t_tpu.plotting import store_attention_plots
from joeys2t_tpu.search import search
from joeys2t_tpu.tokenizers import EvaluationTokenizer
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def build_loss_function(train_args, spec):
    """Instantiate the loss from train config (joeynmt/model.py:74-93)."""
    if train_args.loss == "crossentropy-ctc":
        return XentCTCLoss(pad_index=spec.pad_index, bos_index=spec.bos_index,
                           smoothing=train_args.label_smoothing,
                           ctc_weight=train_args.ctc_weight)
    return XentLoss(pad_index=spec.pad_index, smoothing=train_args.label_smoothing)


def _eval_shard_info(args) -> Optional[Tuple[int, int]]:
    """(process_count, process_index) when multi-process eval sharding
    applies, else None.

    Each process decodes only the batches it owns (round-robin by batch
    index) and the hypotheses are all-gathered and restored to dataset
    order — the reference's sharded-eval semantics
    (joeynmt/helpers_for_ddp.py:244-343 DistributedSubsetSampler;
    joeynmt/prediction.py:220-257 gather + reorder) without its shape
    reconciliation: every rank runs the same deterministic batch sampler, so
    all shapes and row counts are known everywhere. Attention-returning and
    reference-scoring (``return_prob == 'ref'``) modes decode the full set
    on every process instead (rare, and the attention tensors are large to
    gather — mirrors the reference's greedy-only DDP validation restriction,
    joeynmt/prediction.py:88-100)."""
    try:
        n = jax.process_count()
    except Exception:  # pragma: no cover - backend not initialized
        return None
    if n > 1 and not args.return_attention and args.return_prob != "ref":
        return n, jax.process_index()
    return None


def _merge_sharded_eval(outputs, scores, batch_rows, shard, pad_index,
                        loss_vec):
    """All-gather per-rank eval outputs and restore dataset order.

    ``outputs``: list of 1-D int rows decoded locally (owned batches only,
    in batch order). ``batch_rows``: rows contributed by EVERY batch (known
    on all ranks). Rows are padded to the global max width with
    ``pad_index`` — identical to the in-batch padding the search loop
    already emits. Returns (merged_outputs, merged_scores, summed_loss_vec).
    """
    from jax.experimental import multihost_utils

    n_proc, _ = shard
    r_local = len(outputs)
    w_local = max((len(o) for o in outputs), default=1)
    has_scores = 1 if (r_local > 0 and len(scores) == r_local) else 0
    # score rows are either scalars (beam sequence scores) or 1-D per-token
    # vectors (greedy with return_prob='hyp'); scalars gather as width-0 rows
    swidths = [0 if np.ndim(s) == 0 else len(s) for s in scores] \
        if has_scores else []
    ws_local = max(swidths, default=1)
    meta = np.array([r_local, w_local, has_scores, ws_local], np.int64)
    meta_all = np.asarray(multihost_utils.process_allgather(meta))
    r_max = max(int(meta_all[:, 0].max()), 1)
    w_max = int(meta_all[:, 1].max())
    any_scores = bool(meta_all[:, 2].max())
    ws_max = max(int(meta_all[:, 3].max()), 1)

    block = np.full((r_max, w_max), pad_index, np.int32)
    for i, o in enumerate(outputs):
        block[i, :len(o)] = o
    sblock = np.zeros((r_max, ws_max), np.float32)
    swidth = np.zeros((r_max,), np.int32)
    if has_scores:
        for i, s in enumerate(scores):
            if np.ndim(s) == 0:
                sblock[i, 0] = float(s)
            else:
                sblock[i, :len(s)] = np.asarray(s, np.float32)
                swidth[i] = len(s)

    out_all = np.asarray(multihost_utils.process_allgather(block))
    s_all = np.asarray(multihost_utils.process_allgather(sblock))
    sw_all = np.asarray(multihost_utils.process_allgather(swidth))
    loss_all = np.asarray(multihost_utils.process_allgather(
        np.asarray(loss_vec, np.float64)))

    cursors = [0] * n_proc
    merged_o, merged_s = [], []
    for bi, rows in enumerate(batch_rows):
        owner = bi % n_proc
        c = cursors[owner]
        for r in range(rows):
            merged_o.append(out_all[owner, c + r])
            if any_scores:
                w = int(sw_all[owner, c + r])
                merged_s.append(s_all[owner, c + r, :w] if w
                                else np.float32(s_all[owner, c + r, 0]))
        cursors[owner] = c + rows
    return merged_o, merged_s, loss_all.sum(axis=0)


def make_eval_loss_step(model, loss_fn):
    """Jitted eval-loss step returning (total, nll, ctc, n_correct[, log_probs])."""

    @partial(jax.jit, static_argnames=("return_log_probs",))
    def eval_step(params, src, trg_input, trg, src_length, src_mask, trg_mask,
                  trg_length, src_prompt_mask=None, trg_prompt_mask=None,
                  return_log_probs=False):
        logits, ctc_logits, out_src_mask = model.apply(
            {"params": params}, src, trg_input, src_length, src_mask, trg_mask,
            src_prompt_mask=src_prompt_mask, trg_prompt_mask=trg_prompt_mask,
            deterministic=True)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        kwargs = dict(trg=trg)
        if loss_fn.require_ctc_layer and ctc_logits is not None:
            kwargs.update(trg_length=trg_length, src_mask=out_src_mask,
                          ctc_logits=ctc_logits)
        losses = loss_fn(log_probs, **kwargs)
        total = losses[0]
        nll = losses[1] if len(losses) > 1 else total
        ctc = losses[2] if len(losses) > 2 else jnp.zeros(())
        trg_mask_2d = trg_mask[:, 0, :]
        n_correct = jnp.sum(
            jnp.where(trg_mask_2d, jnp.argmax(log_probs, -1) == trg, False))
        if return_log_probs:
            return total, nll, ctc, n_correct, log_probs
        return total, nll, ctc, n_correct, None

    return eval_step


def predict(
    params,
    model,
    spec,
    data,
    loss_fn=None,
    compute_loss: bool = False,
    normalization: str = "batch",
    num_workers: int = 0,
    args: TestConfig = None,
) -> Tuple[Dict[str, float], Optional[List[str]], Optional[List[str]],
           List[List[str]], List[np.ndarray], List[np.ndarray]]:
    """Generate translations (+ optional loss) for the given data
    (joeynmt/prediction.py:51-381)."""
    # pylint: disable=too-many-branches,too-many-statements
    if jax.process_count() > 1:
        # decode is process-local (owner-only batches, sharded eval) — a jit
        # over global-mesh params would need every rank in lock-step per
        # batch; take the comm-free local view of the replicated params
        from joeys2t_tpu.parallel.mesh import local_param_view

        params = local_param_view(params)
    valid_iter, batch_sampler = data.make_iter(
        batch_size=args.batch_size,
        batch_type=args.batch_type,
        shuffle=False,
        seed=data.seed,
        num_workers=num_workers,
        eos_index=spec.eos_index,
        pad_index=spec.pad_index,
        return_sampler=True,
    )
    num_samples = batch_sampler.num_samples

    if args.return_prob == "ref":
        decoding_description = ""
    else:
        decoding_description = (
            " (Greedy decoding with " if args.beam_size < 2 else
            f" (Beam search with beam_size={args.beam_size}, "
            f"beam_alpha={args.beam_alpha}, n_best={args.n_best}, ")
        decoding_description += (
            f"min_output_length={args.min_output_length}, "
            f"max_output_length={args.max_output_length}, "
            f"return_prob='{args.return_prob}', generate_unk={args.generate_unk}, "
            f"repetition_penalty={args.repetition_penalty}, "
            f"no_repeat_ngram_size={args.no_repeat_ngram_size})")
    logger.info("Predicting %d example(s)...%s", num_samples, decoding_description)

    valid_scores = {"loss": float("nan"), "acc": float("nan"), "ppl": float("nan")}
    all_outputs, valid_attn_scores, valid_seq_scores = [], [], []
    total_loss, total_nseqs, total_ntokens, total_n_correct = 0.0, 0, 0, 0

    eval_step = make_eval_loss_step(model, loss_fn) if compute_loss else None
    shard = _eval_shard_info(args)
    batch_rows: List[int] = []  # rows contributed by every batch (all ranks)

    gen_start_time = time.time()
    from joeys2t_tpu.data.batch import round_up_to_bucket

    batch: Batch
    for bi, raw_batch in enumerate(valid_iter):
        nseqs_real = raw_batch.nseqs
        batch_rows.append(nseqs_real * args.n_best)
        if shard is not None and bi % shard[0] != shard[1]:
            total_nseqs += nseqs_real  # counted globally; decode skipped
            continue
        reverse_index = raw_batch.sort_by_src_length()
        sort_reverse_index = expand_reverse_index(reverse_index, args.n_best)
        # static-shape padding: fixed batch dim per (batch_size, bucket) combo
        # so the jitted eval/search loops compile once per bucket
        target_b = (args.batch_size if args.batch_type == "sentence"
                    else round_up_to_bucket(nseqs_real))
        batch = raw_batch.pad_to_shape(batch_size=max(target_b, nseqs_real))

        output, ref_scores, hyp_scores, attention_scores = None, None, None, None

        if compute_loss and batch.has_trg:
            assert loss_fn is not None
            return_lp = args.return_prob == "ref"
            total, nll, ctc, n_correct, log_probs = eval_step(
                params,
                jnp.asarray(cast_features_for_upload(batch.src, model)),
                jnp.asarray(batch.trg_input),
                jnp.asarray(batch.trg), jnp.asarray(batch.src_length),
                None if batch.src_mask is None else jnp.asarray(batch.src_mask),
                jnp.asarray(batch.trg_mask), jnp.asarray(batch.trg_length),
                src_prompt_mask=(None if batch.src_prompt_mask is None
                                 else jnp.asarray(batch.src_prompt_mask)),
                trg_prompt_mask=(None if batch.trg_prompt_mask is None else
                                 jnp.asarray(_fit_prompt_mask(batch))),
                return_log_probs=return_lp)
            if return_lp:
                ref_scores = Batch.score(np.asarray(log_probs)[:nseqs_real],
                                         batch.trg[:nseqs_real], spec.pad_index)
                attention_scores = None
                output = np.asarray(batch.trg)
            total_loss += float(total)
            total_n_correct += int(n_correct)
            total_ntokens += batch.ntokens

        if args.return_prob != "ref":
            output, hyp_scores, attention_scores = search(
                params=params, model=model, spec=spec, batch=batch,
                beam_size=args.beam_size, beam_alpha=args.beam_alpha,
                max_output_length=args.max_output_length, n_best=args.n_best,
                return_attention=args.return_attention,
                return_prob=args.return_prob, generate_unk=args.generate_unk,
                repetition_penalty=args.repetition_penalty,
                no_repeat_ngram_size=args.no_repeat_ngram_size,
                beam_reorder=getattr(args, "beam_reorder", "auto"))

        batch_size = len(sort_reverse_index)
        all_outputs.extend(np.asarray(output)[sort_reverse_index])
        valid_attn_scores.extend(
            np.asarray(attention_scores)[sort_reverse_index]
            if attention_scores is not None else [])
        # hyp_scores may have more rows than batch_size when pad_to_shape
        # rounded the batch up; sort_reverse_index only touches real rows
        # (pad rows sort to the end), so indexing is valid either way.
        valid_seq_scores.extend(
            ref_scores[reverse_index]
            if ref_scores is not None and ref_scores.shape[0] == nseqs_real
            else hyp_scores[sort_reverse_index]
            if hyp_scores is not None and hyp_scores.shape[0] >= batch_size
            else [])
        total_nseqs += nseqs_real

    gen_duration = time.time() - gen_start_time
    logger.info("Generation took %.4f[sec].", gen_duration)

    if shard is not None:
        n_owned = sum(1 for bi in range(len(batch_rows))
                      if bi % shard[0] == shard[1])
        logger.info("Sharded eval: process %d decoded %d/%d batches.",
                    shard[1], n_owned, len(batch_rows))
        all_outputs, valid_seq_scores, loss_vec = _merge_sharded_eval(
            all_outputs, valid_seq_scores, batch_rows, shard, spec.pad_index,
            [total_loss, float(total_ntokens), float(total_n_correct)])
        total_loss = float(loss_vec[0])
        total_ntokens = int(loss_vec[1])
        total_n_correct = int(loss_vec[2])

    assert total_nseqs == num_samples, (total_nseqs, num_samples)
    assert len(all_outputs) == num_samples * args.n_best, \
        (len(all_outputs), num_samples)

    if compute_loss and total_ntokens > 0:
        if normalization == "batch":
            normalizer = total_nseqs
        elif normalization == "tokens":
            normalizer = total_ntokens
        else:
            normalizer = 1
        assert normalizer > 0
        valid_scores["loss"] = total_loss / normalizer
        valid_scores["acc"] = total_n_correct / total_ntokens
        try:
            valid_scores["ppl"] = math.exp(total_loss / total_ntokens)
        except OverflowError:
            valid_scores["ppl"] = float("inf")

    # decode ids back to symbols (cut AFTER eos; eos kept)
    decoded_valid = _trg_vocab(data, spec).arrays_to_sentences(
        arrays=all_outputs, cut_at_eos=True)

    if args.return_prob == "ref":  # scoring mode: no evaluation
        logger.info(
            "Evaluation result (scoring) %s, duration: %.4f[sec]",
            ", ".join(f"{m}: {valid_scores[m]:6.2f}" for m in ["loss", "ppl", "acc"]),
            gen_duration)
        return valid_scores, None, None, decoded_valid, valid_seq_scores, \
            valid_attn_scores

    valid_hyp = [
        data.tokenizer[data.trg_lang].post_process(s, generate_unk=args.generate_unk)
        for s in decoded_valid
    ]
    valid_ref = [data.tokenizer[data.trg_lang].post_process(s) for s in data.trg]

    if data.has_trg:
        valid_hyp_1best = (valid_hyp if args.n_best == 1 else
                           [valid_hyp[i] for i in range(0, len(valid_hyp), args.n_best)])
        assert len(valid_hyp_1best) == len(valid_ref), (valid_hyp_1best, valid_ref)

        eval_start_time = time.time()
        for eval_metric in args.eval_metrics:
            if eval_metric == "bleu":
                valid_scores[eval_metric] = bleu(valid_hyp_1best, valid_ref,
                                                 **args.sacrebleu_cfg)
            elif eval_metric == "chrf":
                valid_scores[eval_metric] = chrf(valid_hyp_1best, valid_ref,
                                                 **args.sacrebleu_cfg)
            elif eval_metric == "token_accuracy":
                decoded_valid_1best = (
                    decoded_valid if args.n_best == 1 else
                    [decoded_valid[i]
                     for i in range(0, len(decoded_valid), args.n_best)])
                valid_scores[eval_metric] = token_accuracy(
                    decoded_valid_1best,
                    data.get_list(lang=data.trg_lang, tokenized=True),
                    tokenizer=lambda x: x if isinstance(x, list) else x.split())
            elif eval_metric == "sequence_accuracy":
                valid_scores[eval_metric] = sequence_accuracy(valid_hyp_1best,
                                                              valid_ref)
            elif eval_metric == "wer":
                if "eval" not in data.tokenizer:
                    data.tokenizer["eval"] = EvaluationTokenizer(
                        lowercase=args.sacrebleu_cfg.get("lowercase", False),
                        tokenize=args.sacrebleu_cfg.get("tokenize", "13a"),
                        no_punc=args.sacrebleu_cfg.get("no_punc", False))
                valid_scores[eval_metric] = wer(valid_hyp_1best, valid_ref,
                                                data.tokenizer["eval"])
        eval_duration = time.time() - eval_start_time
        score_str = ", ".join(
            f"{m}: {valid_scores[m]:6.2f}"
            for m in args.eval_metrics + ["loss", "ppl", "acc"]
            if not math.isnan(valid_scores[m]))
        logger.info(
            "Evaluation result (%s) %s, generation: %.4f[sec], evaluation: %.4f[sec]",
            "beam search" if args.beam_size > 1 else "greedy", score_str,
            gen_duration, eval_duration)
    else:
        logger.info("Generation took %.4f[sec]. (No references given)", gen_duration)

    return valid_scores, valid_ref, valid_hyp, decoded_valid, valid_seq_scores, \
        valid_attn_scores


def _fit_prompt_mask(batch: Batch):
    from joeys2t_tpu.helpers import adjust_mask_size

    return adjust_mask_size(batch.trg_prompt_mask, batch.nseqs,
                            batch.trg_input.shape[1])


def _trg_vocab(data, spec):
    """The dataset holds no vocab; rebuild a decoder from the tokenizer's
    vocab mapping stored at prepare time."""
    assert hasattr(data, "_trg_vocab"), \
        "Dataset not prepared: attach ._trg_vocab in prepare()"
    return data._trg_vocab


def prepare(args: BaseConfig, rank: int = 0, mode: str = "train"):
    """Load data, build + initialize model, optionally load checkpoint
    (joeynmt/prediction.py:442-521).

    Returns (model, spec, params, loss_fn, train_data, dev_data, test_data).
    """
    if mode == "train":
        datasets = ["train", "dev", "test"]
    if mode == "test":
        datasets = ["dev", "test"]
    if mode == "translate":
        datasets = ["stream"]

    if mode != "train":
        if (args.task == "MT"
                and ("voc_file" not in args.data["src"]
                     or not args.data["src"]["voc_file"])):
            args.data["src"]["voc_file"] = (args.model_dir / "src_vocab.txt").as_posix()
        if "voc_file" not in args.data["trg"] or not args.data["trg"]["voc_file"]:
            args.data["trg"]["voc_file"] = (args.model_dir / "trg_vocab.txt").as_posix()

    src_vocab, trg_vocab, train_data, dev_data, test_data = load_data(
        cfg=args.data, datasets=datasets, task=args.task)

    for d in (train_data, dev_data, test_data):
        if d is not None:
            d._trg_vocab = trg_vocab  # needed to decode ids in predict()

    if mode == "train" and rank == 0:
        if args.task == "MT":
            src_vocab.to_file(args.model_dir / "src_vocab.txt")
            if hasattr(train_data.tokenizer[train_data.src_lang], "copy_cfg_file"):
                train_data.tokenizer[train_data.src_lang].copy_cfg_file(args.model_dir)
        trg_vocab.to_file(args.model_dir / "trg_vocab.txt")
        if hasattr(train_data.tokenizer[train_data.trg_lang], "copy_cfg_file"):
            train_data.tokenizer[train_data.trg_lang].copy_cfg_file(args.model_dir)

    # build + initialize the model
    model, spec = build_model(args.model, src_vocab=src_vocab, trg_vocab=trg_vocab,
                              compute_dtype=args.compute_dtype)
    params = init_params(model, spec, args, src_vocab, trg_vocab)
    loss_fn = build_loss_function(args.train, spec)

    if mode != "train":
        ckpt = resolve_ckpt_path(args.test.load_model, args.model_dir)
        logger.info("Loading model from %s", ckpt)
        model_checkpoint = load_checkpoint(ckpt)
        from joeys2t_tpu.checkpoints import check_params_structure

        check_params_structure(params, model_checkpoint["model_state"])
        params = model_checkpoint["model_state"]

    set_seed(seed=args.seed)
    return model, spec, params, loss_fn, train_data, dev_data, test_data


def evaluate(valid_scores: Dict, valid_hyp: List, data,
             args: TestConfig) -> Tuple[Dict[str, float], List[str]]:
    """Standalone metric computation over decoded hypotheses
    (joeynmt/prediction.py:384-439)."""
    valid_ref = [data.tokenizer[data.trg_lang].post_process(t) for t in data.trg]
    valid_hyp_1best = ([valid_hyp[i] for i in range(0, len(valid_hyp), args.n_best)]
                       if args.n_best > 1 else valid_hyp)
    assert len(valid_hyp_1best) == len(valid_ref), (valid_hyp_1best, valid_ref)

    for eval_metric in args.eval_metrics:
        if eval_metric == "bleu":
            valid_scores[eval_metric] = bleu(valid_hyp_1best, valid_ref,
                                             **args.sacrebleu_cfg)
        elif eval_metric == "chrf":
            valid_scores[eval_metric] = chrf(valid_hyp_1best, valid_ref,
                                             **args.sacrebleu_cfg)
        elif eval_metric == "token_accuracy":
            valid_scores[eval_metric] = token_accuracy(
                valid_hyp_1best, valid_ref, tokenizer=str.split)
        elif eval_metric == "sequence_accuracy":
            valid_scores[eval_metric] = sequence_accuracy(valid_hyp_1best, valid_ref)
        elif eval_metric == "wer":
            tok = EvaluationTokenizer(
                lowercase=args.sacrebleu_cfg.get("lowercase", False),
                tokenize=args.sacrebleu_cfg.get("tokenize", "13a"),
                no_punc=args.sacrebleu_cfg.get("no_punc", False))
            valid_scores[eval_metric] = wer(valid_hyp_1best, valid_ref, tok)
    return valid_scores, valid_ref


def init_params(model, spec, args, src_vocab, trg_vocab):
    """Shape-init the flax params then apply the configured initializers.

    All init math runs on the host CPU backend: an eager init of a
    ~100M-param model dispatched op-by-op to a remote TPU costs minutes of
    relay round-trips, while host init + one bulk transfer is seconds. The
    returned tree lives on the default device as before (TrainManager
    re-shards onto the mesh afterwards).
    """
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # no CPU backend registered: init in place
        cpu0 = jax.devices()[0]
    with jax.default_device(cpu0):
        params = _init_params_on_host(model, args, src_vocab, trg_vocab)
    default = jax.devices()[0]
    if default.platform != "cpu":
        params = jax.device_put(params, default)
        jax.block_until_ready(jax.tree.leaves(params))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    logger.info("Total params: %d", n_params)
    return params


def _init_params_on_host(model, args, src_vocab, trg_vocab):
    """The device-agnostic part of init_params (runs under default_device)."""
    rng = jax.random.PRNGKey(args.seed)
    if args.task == "MT":
        src = jnp.ones((2, 5), jnp.int32)
        src_mask = jnp.ones((2, 1, 5), bool)
    else:
        in_ch = args.model["encoder"].get("in_channels", 80)
        src = jnp.ones((2, 16, in_ch), jnp.float32)
        src_mask = None
    variables = model.init(
        {"params": rng}, src, jnp.ones((2, 4), jnp.int32),
        jnp.full((2,), src.shape[1], jnp.int32), src_mask,
        jnp.ones((2, 1, 4), bool), deterministic=True)
    params = variables["params"]
    src_pad = src_vocab.pad_index if src_vocab is not None else trg_vocab.pad_index
    params = initialize_model(params, args.model, src_pad, trg_vocab.pad_index,
                              jax.random.fold_in(rng, 1))

    # pretrained embedding files (joeynmt/model.py:496-503)
    from joeys2t_tpu.models.embeddings import load_pretrained_embeddings

    enc_embed_path = args.model["encoder"]["embeddings"].get("load_pretrained")
    dec_embed_path = args.model["decoder"]["embeddings"].get("load_pretrained")
    if enc_embed_path and args.task == "MT" and "src_embed" in params:
        logger.info("Loading pretrained src embeddings...")
        table = load_pretrained_embeddings(
            Path(enc_embed_path), src_vocab,
            args.model["encoder"]["embeddings"]["embedding_dim"])
        cur = np.asarray(params["src_embed"]["lut"]["embedding"])
        params["src_embed"]["lut"]["embedding"] = jnp.asarray(
            np.where(np.isnan(table), cur, table))
    if dec_embed_path and not args.model.get("tied_embeddings", False) \
            and "trg_embed" in params:
        logger.info("Loading pretrained trg embeddings...")
        table = load_pretrained_embeddings(
            Path(dec_embed_path), trg_vocab,
            args.model["decoder"]["embeddings"]["embedding_dim"])
        cur = np.asarray(params["trg_embed"]["lut"]["embedding"])
        params["trg_embed"]["lut"]["embedding"] = jnp.asarray(
            np.where(np.isnan(table), cur, table))
    return params


def test(cfg: Dict, output_path: str = None, prepared: Dict = None,
         save_attention: bool = False, save_scores: bool = False) -> None:
    """Batch evaluation on dev + test (joeynmt/prediction.py:524-635)."""
    args = parse_global_args(cfg, rank=0, mode="test")

    if prepared is None:
        model, spec, params, loss_fn, _, dev_data, test_data = prepare(
            args, rank=0, mode="test")
        data_to_predict = {"dev": dev_data, "test": test_data}
    else:
        model = prepared["model"]
        spec = prepared["spec"]
        params = prepared["params"]
        loss_fn = prepared["loss_fn"]
        data_to_predict = {"dev": prepared["dev"], "test": prepared["test"]}

    if save_attention:
        if cfg["model"]["decoder"].get("type", "transformer") == "transformer":
            assert args.test.beam_size == 1, (
                "Attention plots can be saved with greedy decoding only. Please set "
                "`beam_size: 1` in the config.")
        import dataclasses as _dc

        args = _dc.replace(args, test=_dc.replace(args.test, return_attention=True))
    if save_scores:
        assert output_path, "Please specify --output-path for saving scores."
        if args.test.return_prob == "none":
            logger.warning("Please specify prob type: {`ref` or `hyp`} in the config. "
                           "Scores will not be saved.")
            save_scores = False
        elif args.test.return_prob == "ref":
            assert args.test.beam_size == 1, (
                "Scores of given references can be computed with greedy decoding "
                "only. Please set `beam_size: 1` in the config.")

    for data_set_name, data_set in data_to_predict.items():
        if data_set is None:
            continue
        data_set.reset_indices(random_subset=-1)  # no subsampling in evaluation
        logger.info("%s on %s set...",
                    "Scoring" if args.test.return_prob == "ref" else "Decoding",
                    data_set_name)
        _, _, hypotheses, hypotheses_raw, seq_scores, att_scores = predict(
            params=params, model=model, spec=spec, data=data_set,
            loss_fn=loss_fn, compute_loss=args.test.return_prob == "ref",
            normalization=args.train.normalization, num_workers=args.num_workers,
            args=args.test)

        if output_path is not None:
            if save_attention and att_scores:
                attention_file_name = f"{output_path}.{data_set_name}.att"
                logger.info("Saving attention plots. This might take a while..")
                store_attention_plots(
                    attentions=att_scores, targets=hypotheses_raw,
                    sources=data_set.get_list(lang=data_set.src_lang, tokenized=True),
                    indices=range(len(hypotheses) if hypotheses else 0),
                    output_prefix=attention_file_name)
                logger.info("Attention plots saved to: %s", attention_file_name)
            elif save_attention and not att_scores:
                logger.warning(
                    "Attention scores could not be saved. Note that attention "
                    "scores are not available when using beam search. "
                    "Set beam_size to 1 for greedy decoding.")
            if save_scores and seq_scores is not None:
                output_path_scores = Path(f"{output_path}.{data_set_name}.scores")
                write_list_to_file(output_path_scores, seq_scores)
                output_path_tokens = Path(f"{output_path}.{data_set_name}.tokens")
                write_list_to_file(output_path_tokens, hypotheses_raw)
                logger.info(
                    "Scores and corresponding tokens saved to: %s.{scores|tokens}",
                    f"{output_path}.{data_set_name}")
            if hypotheses is not None:
                output_path_set = Path(f"{output_path}.{data_set_name}")
                save_hypothese(output_path_set, hypotheses, args.test.n_best)
                logger.info("Translations saved to: %s.", output_path_set)


def translate(cfg: Dict, output_path: str = None) -> None:
    """Interactive / stdin translation (joeynmt/prediction.py:638-735)."""
    args = parse_global_args(cfg, rank=0, mode="test")

    model, spec, params, loss_fn, _, _, test_data = prepare(
        args, rank=0, mode="translate")
    if args.task == "MT":
        assert isinstance(test_data, StreamDataset)
    elif args.task == "S2T":
        assert isinstance(test_data, SpeechStreamDataset)

    logger.info("Ready to decode.")

    def _translate_data(test_data, args):
        _, _, hypotheses, trg_tokens, trg_scores, _ = predict(
            params=params, model=model, spec=spec, data=test_data,
            loss_fn=loss_fn, compute_loss=False, normalization="none",
            num_workers=args.num_workers, args=args.test)
        return hypotheses, trg_tokens, trg_scores

    if not sys.stdin.isatty():
        for i, line in enumerate(sys.stdin.readlines()):
            if not line.strip():
                logger.warning("The sentence in line %d is empty. Skip to load.", i)
                continue
            test_data.set_item(line.rstrip())
        all_hypotheses, tokens, scores = _translate_data(test_data, args)
        assert len(all_hypotheses) == len(test_data) * args.test.n_best

        if output_path is not None:
            out_file = Path(output_path).expanduser()
            save_hypothese(out_file, all_hypotheses, args.test.n_best)
            logger.info("Translations saved to: %s.", out_file)
        else:
            for hyp in all_hypotheses:
                print(hyp)
    else:
        import dataclasses as _dc

        args = _dc.replace(args, test=_dc.replace(args.test, batch_size=1,
                                                  batch_type="sentence"))
        np.set_printoptions(linewidth=sys.maxsize)
        while True:
            try:
                src_input = input("\nPlease enter a source sentence:\n")
                if not src_input.strip():
                    break
                test_data.set_item(src_input.rstrip())
                hypotheses, tokens, scores = _translate_data(test_data, args)
                print("JoeyS2T-TPU:")
                for i, (hyp, token, score) in enumerate(
                        zip_longest(hypotheses, tokens, scores)):
                    assert hyp is not None, (i, hyp, token, score)
                    print(f"#{i + 1}: {hyp}")
                    if args.test.return_prob in ["hyp"]:
                        if args.test.beam_size > 1:
                            print(f"\ttokens: {token}\n\tsequence score: {score[0]}")
                        else:
                            print(f"\ttokens: {token}\n\tscores: {score}")
                test_data.reset_cache()
            except (KeyboardInterrupt, EOFError):
                print("\nBye.")
                break
