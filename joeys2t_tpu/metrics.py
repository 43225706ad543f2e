# coding: utf-8
"""
Evaluation metrics (counterpart of joeynmt/metrics.py:16-131).

BLEU/ChrF via sacrebleu; WER = corpus-level sum(edit distance)/sum(ref len)
over EvaluationTokenizer output, with the edit distance computed by the
first-party C++ extension (joeys2t_tpu/native/editdistance.cpp).
"""
from inspect import getfullargspec
from typing import Callable, List

from sacrebleu.metrics import BLEU, CHRF

from joeys2t_tpu.native import edit_distance_batch
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _corpus_score(metric_cls, hypotheses: List[str], references: List[str],
                  sacrebleu_cfg: dict) -> float:
    """Instantiate a sacrebleu metric with only the cfg keys its constructor
    accepts (user YAML may carry keys for the other metric) and score the
    corpus; the signature line goes to the log for reproducibility."""
    accepted = getfullargspec(metric_cls).args
    metric = metric_cls(
        **{k: v for k, v in sacrebleu_cfg.items() if k in accepted})
    result = metric.corpus_score(hypotheses=hypotheses,
                                 references=[references])
    logger.info(metric.get_signature())
    return result.score


def chrf(hypotheses: List[str], references: List[str], **sacrebleu_cfg) -> float:
    """Character F-score; returned in [0, 1] (sacrebleu v2 breaking change,
    joeynmt/metrics.py:16-38)."""
    return _corpus_score(CHRF, hypotheses, references, sacrebleu_cfg) / 100


def bleu(hypotheses: List[str], references: List[str], **sacrebleu_cfg) -> float:
    """Corpus BLEU from sacrebleu (joeynmt/metrics.py:41-62)."""
    return _corpus_score(BLEU, hypotheses, references, sacrebleu_cfg)


def token_accuracy(hypotheses: List[str], references: List[str],
                   tokenizer: Callable) -> float:
    """Correct tokens / all hyp tokens, positionwise (joeynmt/metrics.py:65-89)."""
    assert len(hypotheses) == len(references)
    n_match = 0
    n_hyp_tokens = 0
    for hyp_str, ref_str in zip(hypotheses, references):
        hyp_toks, ref_toks = tokenizer(hyp_str), tokenizer(ref_str)
        n_hyp_tokens += len(hyp_toks)
        n_match += sum(int(h == r) for h, r in zip(hyp_toks, ref_toks))
    return (n_match / n_hyp_tokens) * 100 if n_hyp_tokens else 0.0


def sequence_accuracy(hypotheses: List[str], references: List[str]) -> float:
    """Exact sequence match rate (joeynmt/metrics.py:92-107)."""
    assert len(hypotheses) == len(references)
    if not hypotheses:
        return 0.0
    n_exact = sum(int(h == r) for h, r in zip(hypotheses, references))
    return (n_exact / len(hypotheses)) * 100


def wer(hypotheses: List[str], references: List[str], tokenizer: Callable) -> float:
    """Corpus-level word error rate: sum(edit) / sum(ref len) * 100
    (joeynmt/metrics.py:110-131)."""
    pairs = [(tokenizer(hyp), tokenizer(ref))
             for hyp, ref in zip(hypotheses, references)]
    distances = edit_distance_batch(pairs)
    numerator = float(sum(distances))
    denominator = float(sum(len(ref) for _, ref in pairs))
    return (numerator / denominator) * 100 if denominator else 0.0
