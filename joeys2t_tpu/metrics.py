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


def chrf(hypotheses: List[str], references: List[str], **sacrebleu_cfg) -> float:
    """Character F-score; returned in [0, 1] (sacrebleu v2 breaking change,
    joeynmt/metrics.py:16-38)."""
    kwargs = {}
    if sacrebleu_cfg:
        valid_keys = getfullargspec(CHRF).args
        for k, v in sacrebleu_cfg.items():
            if k in valid_keys:
                kwargs[k] = v
    metric = CHRF(**kwargs)
    score = metric.corpus_score(hypotheses=hypotheses, references=[references]).score
    logger.info(metric.get_signature())
    return score / 100


def bleu(hypotheses: List[str], references: List[str], **sacrebleu_cfg) -> float:
    """Corpus BLEU from sacrebleu (joeynmt/metrics.py:41-62)."""
    kwargs = {}
    if sacrebleu_cfg:
        valid_keys = getfullargspec(BLEU).args
        for k, v in sacrebleu_cfg.items():
            if k in valid_keys:
                kwargs[k] = v
    metric = BLEU(**kwargs)
    score = metric.corpus_score(hypotheses=hypotheses, references=[references]).score
    logger.info(metric.get_signature())
    return score


def token_accuracy(hypotheses: List[str], references: List[str],
                   tokenizer: Callable) -> float:
    """Correct tokens / all hyp tokens, positionwise (joeynmt/metrics.py:65-89)."""
    correct_tokens = 0
    all_tokens = 0
    assert len(hypotheses) == len(references)
    for hyp, ref in zip(hypotheses, references):
        hyp = tokenizer(hyp)
        ref = tokenizer(ref)
        all_tokens += len(hyp)
        for h_i, r_i in zip(hyp, ref):
            if h_i == r_i:
                correct_tokens += 1
    return (correct_tokens / all_tokens) * 100 if all_tokens > 0 else 0.0


def sequence_accuracy(hypotheses: List[str], references: List[str]) -> float:
    """Exact sequence match rate (joeynmt/metrics.py:92-107)."""
    assert len(hypotheses) == len(references)
    correct_sequences = sum(
        1 for (hyp, ref) in zip(hypotheses, references) if hyp == ref)
    return (correct_sequences / len(hypotheses)) * 100 if hypotheses else 0.0


def wer(hypotheses: List[str], references: List[str], tokenizer: Callable) -> float:
    """Corpus-level word error rate: sum(edit) / sum(ref len) * 100
    (joeynmt/metrics.py:110-131)."""
    pairs = [(tokenizer(hyp), tokenizer(ref))
             for hyp, ref in zip(hypotheses, references)]
    distances = edit_distance_batch(pairs)
    numerator = float(sum(distances))
    denominator = float(sum(len(ref) for _, ref in pairs))
    return (numerator / denominator) * 100 if denominator else 0.0
