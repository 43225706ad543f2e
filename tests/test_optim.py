# coding: utf-8
"""Scheduler/optimizer numerics vs the reference formulas
(joeynmt/builders.py:290-485)."""
import numpy as np
import pytest

from joeys2t_tpu.optim import (
    NoamScheduler,
    PlateauScheduler,
    StepDecayScheduler,
    WarmupExponentialDecayScheduler,
    WarmupInverseSquareRootScheduler,
    build_gradient_clipper,
    build_optimizer,
    build_scheduler,
    get_learning_rate,
    set_learning_rate,
)


class TestNoam:
    def test_formula(self):
        s = NoamScheduler(hidden_size=512, factor=1.0, warmup=4000)
        # rate = factor * hidden^-0.5 * min(step^-0.5, step * warmup^-1.5)
        for step in [1, 100, 4000, 10000]:
            rate = s.step(step - 1)  # reference syncs step+1
            expected = (512 ** -0.5) * min(step ** -0.5, step * 4000 ** -1.5)
            np.testing.assert_allclose(rate, expected, rtol=1e-9)

    def test_state_roundtrip(self):
        s = NoamScheduler(hidden_size=512, factor=2.0, warmup=100)
        s.step(50)
        state = s.state_dict()
        s2 = NoamScheduler(hidden_size=1, factor=1.0, warmup=1)
        s2.load_state_dict(state)
        assert s2.hidden_size == 512 and s2.factor == 2.0 and s2.warmup == 100


class TestWarmupInverseSquareRoot:
    def test_formula(self):
        s = WarmupInverseSquareRootScheduler(peak_rate=1e-3, warmup=100, min_rate=1e-6)
        # linear warmup
        np.testing.assert_allclose(s.step(49), 50 * 1e-3 / 100)
        # decay: peak * sqrt(warmup) / sqrt(step)
        np.testing.assert_allclose(s.step(399), 1e-3 * (100 ** 0.5) * (400 ** -0.5))
        # floor at min_rate
        assert s.step(10**12) == 1e-6


class TestWarmupExponentialDecay:
    def test_formula(self):
        s = WarmupExponentialDecayScheduler(peak_rate=1e-3, decay_length=1000,
                                            warmup=100, decay_rate=0.5, min_rate=1e-8)
        np.testing.assert_allclose(s.step(49), 50 * 1e-3 / 100)
        np.testing.assert_allclose(s.step(1099), 1e-3 * 0.5 ** ((1100 - 100) / 1000))


class TestPlateau:
    def test_patience_and_factor(self):
        s = PlateauScheduler(initial_rate=1.0, mode="min", factor=0.5, patience=2)
        assert s.step_metric(10.0) == 1.0  # first -> best
        assert s.step_metric(11.0) == 1.0  # bad 1
        assert s.step_metric(11.0) == 1.0  # bad 2
        assert s.step_metric(11.0) == 0.5  # bad 3 > patience -> decay
        assert s.step_metric(9.0) == 0.5  # new best resets counter


class TestStepDecay:
    def test_epoch_decay(self):
        s = StepDecayScheduler(initial_rate=1.0, step_size=2, gamma=0.1)
        assert s.step(1) == 1.0
        assert abs(s.step(2) - 0.1) < 1e-12


class TestBuilders:
    def test_build_scheduler_step_at(self):
        cases = {
            "noam": "step", "warmupinversesquareroot": "step",
            "warmupexponentialdecay": "step", "plateau": "validation",
            "decaying": "epoch", "exponential": "epoch",
        }
        for name, expect in cases.items():
            sched, step_at = build_scheduler(
                {"scheduling": name, "learning_rate": 1e-3}, "min", hidden_size=64)
            assert step_at == expect, name
        sched, step_at = build_scheduler({"scheduling": None}, "min")
        assert sched is None and step_at == "none"

    def test_lr_injection(self):
        import jax.numpy as jnp

        tx = build_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        assert abs(get_learning_rate(state) - 1e-3) < 1e-9  # f32 storage
        set_learning_rate(state, 5e-4)
        grads = {"w": jnp.ones((3,))}
        updates, state = tx.update(grads, state, params)
        # adam first step: update = -lr * sign-ish; magnitude ~ lr
        assert abs(float(updates["w"][0])) < 1e-3

    def test_adafactor_factored_state_and_descent(self):
        import jax
        import jax.numpy as jnp

        tx = build_optimizer({"optimizer": "adafactor", "learning_rate": 1e-2})
        params = {"w": jnp.ones((256, 512)), "b": jnp.zeros((512,))}
        state = tx.init(params)
        # factored second moments: no state leaf carries the full (256, 512)
        # matrix shape — rows/cols vectors only
        leaves = jax.tree_util.tree_leaves(state)
        assert all(l.shape != (256, 512) for l in leaves if hasattr(l, "shape"))
        grads = {"w": jnp.full((256, 512), 0.5), "b": jnp.full((512,), 0.5)}
        updates, state = tx.update(grads, state, params)
        # update opposes the gradient and is lr-scaled
        assert float(jnp.max(updates["w"])) < 0.0
        assert abs(float(updates["w"][0, 0])) < 1.0
        # lr injection round-trips like the other optimizers
        set_learning_rate(state, 5e-4)
        assert abs(get_learning_rate(state) - 5e-4) < 1e-9

    def test_adamw_bf16_moment_dtype(self):
        import jax
        import jax.numpy as jnp

        tx = build_optimizer({
            "optimizer": "adamw", "learning_rate": 1e-3,
            "weight_decay": 0.01, "moment_dtype": "bfloat16",
        })
        params = {"w": jnp.ones((8, 8), jnp.float32)}
        state = tx.init(params)
        dtypes = {l.dtype for l in jax.tree_util.tree_leaves(state)
                  if hasattr(l, "dtype") and getattr(l, "shape", ()) == (8, 8)}
        assert jnp.dtype(jnp.bfloat16) in dtypes  # mu stored in bf16
        assert jnp.dtype(jnp.float32) in dtypes   # nu stays fp32
        grads = {"w": jnp.ones((8, 8))}
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()

    def test_clipper_exclusive(self):
        from joeys2t_tpu.config import ConfigurationError

        with pytest.raises(ConfigurationError):
            build_gradient_clipper({"clip_grad_val": 1.0, "clip_grad_norm": 1.0})
        assert build_gradient_clipper({}) is None
        assert build_gradient_clipper({"clip_grad_norm": 1.0}) is not None
