# coding: utf-8
"""Loss golden tests against torch (CPU) — mirrors test/unit/test_loss.py but
with cross-framework golden values: torch.nn.NLLLoss / KLDivLoss /
nn.CTCLoss are the oracle for our JAX implementations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from joeys2t_tpu.losses import XentCTCLoss, XentLoss, smoothed_xent_loss
from joeys2t_tpu.ops.ctc import ctc_loss, ctc_loss_sum

PAD = 1
BOS = 2


def torch_label_smoothed_loss(log_probs, targets, pad_index, smoothing):
    """The reference's loss exactly (joeynmt/loss.py:16-101)."""
    lp = torch.tensor(np.asarray(log_probs)).reshape(-1, log_probs.shape[-1])
    tg = torch.tensor(np.asarray(targets)).reshape(-1)
    if smoothing <= 0:
        return torch.nn.NLLLoss(ignore_index=pad_index, reduction="sum")(lp, tg).item()
    v = lp.size(-1)
    smooth = torch.full((tg.size(0), v), smoothing / (v - 2))
    smooth.scatter_(1, tg.unsqueeze(1), 1.0 - smoothing)
    smooth[:, pad_index] = 0
    pad_pos = torch.nonzero(tg == pad_index, as_tuple=False)
    if len(pad_pos) > 0:
        smooth.index_fill_(0, pad_pos.squeeze(1), 0.0)
    return torch.nn.KLDivLoss(reduction="sum")(lp, smooth).item()


def random_log_probs(rng, b, t, v):
    logits = rng.randn(b, t, v).astype(np.float32)
    x = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    return jnp.asarray(x)


class TestXent:
    @pytest.mark.parametrize("smoothing", [0.0, 0.1, 0.4])
    def test_matches_torch(self, smoothing):
        rng = np.random.RandomState(42)
        lp = random_log_probs(rng, 3, 7, 11)
        targets = rng.randint(0, 11, size=(3, 7))
        targets[:, -2:] = PAD  # some padding
        got = float(smoothed_xent_loss(lp, jnp.asarray(targets), PAD, smoothing))
        want = torch_label_smoothed_loss(lp, targets, PAD, smoothing)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_loss_class(self):
        rng = np.random.RandomState(0)
        lp = random_log_probs(rng, 2, 5, 9)
        targets = jnp.asarray(rng.randint(0, 9, size=(2, 5)))
        loss = XentLoss(pad_index=PAD, smoothing=0.1)
        (val,) = loss(lp, trg=targets)
        assert np.isfinite(float(val)) and float(val) > 0


class TestCTC:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_torch_ctc(self, seed):
        rng = np.random.RandomState(seed)
        b, t, v, l = 4, 20, 12, 6
        lp = random_log_probs(rng, b, t, v)
        targets = rng.randint(4, v, size=(b, l))
        input_lengths = rng.randint(l * 2 + 2, t + 1, size=(b,))
        target_lengths = rng.randint(1, l + 1, size=(b,))

        got = np.asarray(ctc_loss(lp, jnp.asarray(targets), jnp.asarray(input_lengths),
                                  jnp.asarray(target_lengths), blank_id=BOS))

        want = torch.nn.CTCLoss(blank=BOS, reduction="none", zero_infinity=True)(
            torch.tensor(np.asarray(lp)).transpose(0, 1),
            torch.tensor(targets),
            torch.tensor(input_lengths),
            torch.tensor(target_lengths),
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_infeasible_zeroed(self):
        """zero_infinity semantics: target longer than input -> 0 loss."""
        rng = np.random.RandomState(5)
        lp = random_log_probs(rng, 1, 3, 8)
        targets = jnp.asarray([[4, 5, 6, 7, 4]])
        got = float(ctc_loss_sum(lp, targets, jnp.asarray([3]), jnp.asarray([5]),
                                 blank_id=BOS, zero_infinity=True))
        assert got == 0.0

    def test_repeated_labels(self):
        """Repeats require blank transitions — stress the skip rule."""
        rng = np.random.RandomState(9)
        b, t, v = 2, 15, 10
        lp = random_log_probs(rng, b, t, v)
        targets = np.array([[4, 4, 5, 5, 4], [6, 6, 6, 7, 8]])
        input_lengths = np.array([15, 14])
        target_lengths = np.array([5, 5])
        got = np.asarray(ctc_loss(lp, jnp.asarray(targets), jnp.asarray(input_lengths),
                                  jnp.asarray(target_lengths), blank_id=BOS))
        want = torch.nn.CTCLoss(blank=BOS, reduction="none", zero_infinity=True)(
            torch.tensor(np.asarray(lp)).transpose(0, 1), torch.tensor(targets),
            torch.tensor(input_lengths), torch.tensor(target_lengths)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestXentCTC:
    def test_interpolation(self):
        """total = (1-w)*xent + w*ctc (joeynmt/loss.py:164)."""
        rng = np.random.RandomState(3)
        b, t_dec, t_enc, v = 2, 6, 18, 10
        lp = random_log_probs(rng, b, t_dec, v)
        ctc_lp = random_log_probs(rng, b, t_enc, v)
        trg = jnp.asarray(rng.randint(4, v, size=(b, t_dec)))
        trg_length = jnp.asarray([6, 5])
        src_mask = jnp.ones((b, 1, t_enc), bool)

        loss_fn = XentCTCLoss(pad_index=PAD, bos_index=BOS, smoothing=0.1, ctc_weight=0.3)
        total, xent, ctc = loss_fn(lp, trg=trg, trg_length=trg_length,
                                   src_mask=src_mask, ctc_log_probs=ctc_lp)
        np.testing.assert_allclose(float(total), 0.7 * float(xent) + 0.3 * float(ctc),
                                   rtol=1e-6)
        assert float(total) >= 0.0


class TestCTCGradients:
    def test_grads_finite_with_infeasible_rows(self):
        """Regression: batches containing infeasible/zero-length CTC rows
        (static-shape padding) must not produce NaN gradients — the log-zero
        surrogate arithmetic underflows exp() to exactly 0 and the logsumexp
        backward divides 0/0 unless the differences are clamped."""
        import jax

        rng = np.random.RandomState(0)
        b, t, v, l = 4, 12, 10, 8
        logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32))
        targets = jnp.asarray(rng.randint(4, v, size=(b, l)))
        input_lengths = jnp.asarray([12, 12, 3, 1])   # rows 3,4 infeasible-ish
        target_lengths = jnp.asarray([8, 5, 8, 0])    # row 4: padding row

        def loss(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_loss_sum(lp, targets, input_lengths, target_lengths,
                                blank_id=BOS, zero_infinity=True)

        val, grad = jax.value_and_grad(loss)(logits)
        assert np.isfinite(float(val))
        assert bool(jnp.isfinite(grad).all()), "NaN/Inf in CTC gradients"
        # feasible rows still match torch
        want = torch.nn.CTCLoss(blank=BOS, reduction="none", zero_infinity=True)(
            torch.log_softmax(torch.tensor(np.asarray(logits)), -1).transpose(0, 1),
            torch.tensor(np.asarray(targets)),
            torch.tensor(np.asarray(input_lengths)),
            torch.tensor(np.asarray(target_lengths)),
        ).numpy()
        got = np.asarray(ctc_loss(jax.nn.log_softmax(logits, -1), targets,
                                  input_lengths, target_lengths, blank_id=BOS))
        np.testing.assert_allclose(got[:2], want[:2], rtol=1e-4, atol=1e-4)


class TestCTCFromLogits:
    """ctc_loss_from_logits (the training hot path: one-hot MXU emission
    gather + folded logsumexp, no (B,T,V) f32 log-softmax materialization)
    must equal the log-probs path bit-for-bit in f32 and to round-off on
    bf16 logits."""

    def _case(self, seed=0, b=3, t=17, v=29, l=6):
        rng = np.random.RandomState(seed)
        logits = rng.randn(b, t, v).astype(np.float32) * 2.0
        targets = rng.randint(4, v, size=(b, l)).astype(np.int32)
        in_len = np.array([17, 15, 9], np.int32)
        tg_len = np.array([6, 4, 0], np.int32)
        return logits, targets, in_len, tg_len

    def test_f32_exact(self):
        from joeys2t_tpu.ops.ctc import ctc_loss_from_logits

        logits, targets, in_len, tg_len = self._case()
        ref = ctc_loss(jax.nn.log_softmax(jnp.asarray(logits), -1),
                       jnp.asarray(targets), jnp.asarray(in_len),
                       jnp.asarray(tg_len), blank_id=2)
        got = ctc_loss_from_logits(jnp.asarray(logits), jnp.asarray(targets),
                                   jnp.asarray(in_len), jnp.asarray(tg_len),
                                   blank_id=2)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-6, atol=1e-5)

    def test_bf16_one_hot_matmul_path(self):
        from joeys2t_tpu.ops.ctc import ctc_loss_from_logits

        logits, targets, in_len, tg_len = self._case(seed=1)
        lb = jnp.asarray(logits).astype(jnp.bfloat16)
        # oracle: cast the SAME bf16 values to f32 and run the classic path
        ref = ctc_loss(jax.nn.log_softmax(lb.astype(jnp.float32), -1),
                       jnp.asarray(targets), jnp.asarray(in_len),
                       jnp.asarray(tg_len), blank_id=2)
        got = ctc_loss_from_logits(lb, jnp.asarray(targets),
                                   jnp.asarray(in_len), jnp.asarray(tg_len),
                                   blank_id=2)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-4)

    def test_gradients_match(self):
        from joeys2t_tpu.ops.ctc import (ctc_loss_from_logits,
                                         ctc_loss_sum_from_logits)

        logits, targets, in_len, tg_len = self._case(seed=2)
        del ctc_loss_from_logits

        def via_log_probs(x):
            return ctc_loss_sum(jax.nn.log_softmax(x, -1),
                                jnp.asarray(targets), jnp.asarray(in_len),
                                jnp.asarray(tg_len), blank_id=2)

        def via_logits(x):
            return ctc_loss_sum_from_logits(x, jnp.asarray(targets),
                                            jnp.asarray(in_len),
                                            jnp.asarray(tg_len), blank_id=2)

        g_ref = jax.grad(via_log_probs)(jnp.asarray(logits))
        g_new = jax.grad(via_logits)(jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_new),
                                   rtol=1e-5, atol=1e-5)
