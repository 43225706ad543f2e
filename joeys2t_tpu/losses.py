# coding: utf-8
"""
Loss functions (counterpart of joeynmt/loss.py).

XentLoss reproduces the reference numerics exactly:
  - smoothing == 0: NLL with sum reduction, pad ignored (loss.py:26-28)
  - smoothing > 0: KL divergence against the smoothed target distribution,
    INCLUDING the target-entropy term sum(p*log p) that torch's KLDivLoss adds
    (loss.py:30-58) — so loss values are comparable across implementations.
XentCTCLoss interpolates (1-w)*xent + w*ctc with blank=bos (loss.py:110-168).

Computed without materializing the (B*T, V) smoothed distribution: the
smoothed KL reduces to closed form over three gathered values per position.
"""
from typing import Optional, Tuple

import jax.numpy as jnp

from joeys2t_tpu.ops.ctc import ctc_loss_sum, ctc_loss_sum_from_logits


def smoothed_xent_loss(
    log_probs: jnp.ndarray,  # (B, T, V) log-softmax outputs
    targets: jnp.ndarray,  # (B, T) int
    pad_index: int,
    smoothing: float = 0.0,
) -> jnp.ndarray:
    """Sum-reduced cross entropy with optional label smoothing."""
    log_probs = log_probs.astype(jnp.float32)
    vocab_size = log_probs.shape[-1]
    non_pad = (targets != pad_index)

    lq_target = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]

    if smoothing <= 0.0:
        # NLLLoss(ignore_index=pad, reduction="sum")
        return -jnp.sum(jnp.where(non_pad, lq_target, 0.0))

    s = smoothing
    confidence = 1.0 - s
    uniform = s / (vocab_size - 2)  # mass spread over non-target, non-pad tokens

    sum_lq = jnp.sum(log_probs, axis=-1)
    lq_pad = log_probs[..., pad_index]

    # sum_v p(v) log q(v) per position
    cross = confidence * lq_target + uniform * (sum_lq - lq_target - lq_pad)
    # sum_v p(v) log p(v) per position (constant; torch KLDivLoss includes it)
    entropy = confidence * jnp.log(confidence) + (vocab_size - 2) * uniform * jnp.log(uniform)

    per_pos = entropy - cross
    return jnp.sum(jnp.where(non_pad, per_pos, 0.0))


class XentLoss:
    """Cross-entropy loss with optional label smoothing (joeynmt/loss.py:16-107)."""

    def __init__(self, pad_index: int, smoothing: float = 0.0):
        self.pad_index = pad_index
        self.smoothing = smoothing
        self.require_ctc_layer = False

    def __call__(self, log_probs: jnp.ndarray, trg: jnp.ndarray,
                 **kwargs) -> Tuple[jnp.ndarray]:
        return (smoothed_xent_loss(log_probs, trg, self.pad_index, self.smoothing),)

    def __repr__(self):
        return f"{self.__class__.__name__}(smoothing={self.smoothing})"


class XentCTCLoss(XentLoss):
    """(1-w)*xent + w*ctc joint objective (joeynmt/loss.py:110-168)."""

    def __init__(self, pad_index: int, bos_index: int, smoothing: float = 0.0,
                 zero_infinity: bool = True, ctc_weight: float = 0.3):
        super().__init__(pad_index=pad_index, smoothing=smoothing)
        self.require_ctc_layer = True
        self.bos_index = bos_index  # CTC blank = bos (joeynmt/loss.py:128-129)
        self.zero_infinity = zero_infinity
        self.ctc_weight = ctc_weight

    def __call__(
        self,
        log_probs: jnp.ndarray,
        trg: jnp.ndarray,
        trg_length: Optional[jnp.ndarray] = None,
        src_mask: Optional[jnp.ndarray] = None,
        ctc_log_probs: Optional[jnp.ndarray] = None,
        ctc_logits: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Pass RAW ``ctc_logits`` on the training hot path: the CTC op then
        skips the (B, T, V) f32 log-softmax materialization and runs the
        emission gather as a one-hot MXU matmul (ops/ctc.py
        ctc_loss_from_logits). ``ctc_log_probs`` remains for callers that
        already hold log-softmax outputs."""
        assert trg_length is not None and src_mask is not None
        assert (ctc_log_probs is not None) or (ctc_logits is not None)

        xent_loss = smoothed_xent_loss(log_probs, trg, self.pad_index, self.smoothing)

        # input lengths = (subsampled) src_mask row sums (joeynmt/loss.py:159)
        input_lengths = jnp.sum(src_mask[:, 0, :].astype(jnp.int32), axis=1)
        if ctc_logits is not None:
            ctc = ctc_loss_sum_from_logits(
                ctc_logits, trg, input_lengths, trg_length,
                blank_id=self.bos_index, zero_infinity=self.zero_infinity)
        else:
            ctc = ctc_loss_sum(
                ctc_log_probs, trg, input_lengths, trg_length,
                blank_id=self.bos_index, zero_infinity=self.zero_infinity)

        total = (1.0 - self.ctc_weight) * xent_loss + self.ctc_weight * ctc
        return total, xent_loss, ctc

    def __repr__(self):
        return (f"{self.__class__.__name__}(smoothing={self.smoothing}, "
                f"ctc_weight={self.ctc_weight})")
