# coding: utf-8
"""
Optimizer and LR-scheduler builders (counterpart of joeynmt/builders.py).

Optimizers are optax transformations wrapped in ``inject_hyperparams`` so the
learning rate lives in the optimizer state; scheduler objects (host-side,
mirroring joeynmt/builders.py:253-485 incl. state_dict round-trip) compute the
rate and the trainer writes it into the state before each update. Scheduler
step points {step, epoch, validation} are preserved.
"""
from typing import Dict, Optional, Tuple

import optax

from joeys2t_tpu.config import ConfigurationError
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def build_gradient_clipper(cfg: Dict) -> Optional[optax.GradientTransformation]:
    """Gradient clipping by value or global norm (joeynmt/builders.py:44-72)."""
    if cfg.get("clip_grad_val") is not None and cfg.get("clip_grad_norm") is not None:
        raise ConfigurationError(
            "You can only specify either clip_grad_val or clip_grad_norm.")
    if cfg.get("clip_grad_val") is not None:
        return optax.clip(cfg["clip_grad_val"])
    if cfg.get("clip_grad_norm") is not None:
        return optax.clip_by_global_norm(cfg["clip_grad_norm"])
    return None


def _decay_mask(params):
    """Weight-decay mask: True = decay. Excludes the frozen inference-form
    BatchNorm statistics of converted conformer checkpoints
    (models/modules.py ConvolutionModule norm_type="batchnorm") — decaying a
    running variance toward zero would silently corrupt the model."""
    import jax

    def keep(path, _):
        last = getattr(path[-1], "key", None) if path else None
        return last not in ("batch_norm_mean", "batch_norm_var")

    return jax.tree_util.tree_map_with_path(keep, params)


def _decayed(weight_decay: float):
    return optax.add_decayed_weights(weight_decay, mask=_decay_mask)


def build_optimizer(cfg: Dict) -> optax.GradientTransformation:
    """Build an optax optimizer chain from the training config
    (joeynmt/builders.py:75-136). The learning rate is injected as a state
    hyperparameter (`opt_state.hyperparams["learning_rate"]`)."""
    optimizer_name = cfg.get("optimizer", "sgd").lower()
    lr = cfg.get("learning_rate", 3.0e-4)
    weight_decay = cfg.get("weight_decay", 0)
    # beyond-reference TPU knob: store the Adam first moment in bfloat16 to
    # halve its HBM footprint/traffic (optax mu_dtype; the second moment stays
    # fp32 — optax does not expose its dtype). None keeps param dtype.
    moment_dtype = cfg.get("moment_dtype", None)
    mu_dtype = None
    if moment_dtype is not None:
        import jax.numpy as jnp
        mu_dtype = jnp.dtype(moment_dtype)

    if optimizer_name == "adam":
        betas = cfg.get("adam_betas", (0.9, 0.999))

        @optax.inject_hyperparams
        def make(learning_rate):
            chain = [
                optax.scale_by_adam(b1=betas[0], b2=betas[1], mu_dtype=mu_dtype)
            ]
            if weight_decay > 0:  # torch Adam applies L2 to the raw grads
                chain.insert(0, _decayed(weight_decay))
            chain.append(optax.scale(-1.0 * learning_rate))
            return optax.chain(*chain)

        tx = make(lr)
    elif optimizer_name == "adamw":
        betas = cfg.get("adam_betas", (0.9, 0.999))

        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.chain(
                optax.scale_by_adam(b1=betas[0], b2=betas[1], mu_dtype=mu_dtype),
                _decayed(weight_decay),
                optax.scale(-1.0 * learning_rate),
            )

        tx = make(lr)
    elif optimizer_name == "adafactor":
        # beyond-reference: factored second moments (Shazeer & Stern 2018) cut
        # optimizer state from 2 full param copies to ~row+col vectors — the
        # standard TPU choice for large models. Pieces mirror optax.adafactor
        # (momentum-free, no parameter-scale multiplier so the lr keeps
        # adam-like units and composes with the YAML schedulers) with the
        # trainer-scheduled lr injected as a hyperparameter.
        @optax.inject_hyperparams
        def make(learning_rate):
            # same composition as optax.adafactor: factored rms -> block-rms
            # clip -> +lr scale -> (decoupled wd) -> final scale(-1)
            chain = [
                optax.scale_by_factored_rms(),
                optax.clip_by_block_rms(1.0),
                optax.scale(learning_rate),
            ]
            if weight_decay > 0:
                chain.append(_decayed(weight_decay))
            chain.append(optax.scale(-1.0))
            return optax.chain(*chain)

        tx = make(lr)
    elif optimizer_name == "adagrad":
        @optax.inject_hyperparams
        def make(learning_rate):
            chain = [optax.scale_by_rss(initial_accumulator_value=0.0)]
            if weight_decay > 0:
                chain.insert(0, _decayed(weight_decay))
            chain.append(optax.scale(-1.0 * learning_rate))
            return optax.chain(*chain)

        tx = make(lr)
    elif optimizer_name == "adadelta":
        @optax.inject_hyperparams
        def make(learning_rate):
            chain = [optax.scale_by_adadelta()]
            if weight_decay > 0:
                chain.insert(0, _decayed(weight_decay))
            chain.append(optax.scale(-1.0 * learning_rate))
            return optax.chain(*chain)

        tx = make(lr)
    elif optimizer_name == "rmsprop":
        @optax.inject_hyperparams
        def make(learning_rate):
            chain = [optax.scale_by_rms()]
            if weight_decay > 0:
                chain.insert(0, _decayed(weight_decay))
            chain.append(optax.scale(-1.0 * learning_rate))
            return optax.chain(*chain)

        tx = make(lr)
    elif optimizer_name == "sgd":
        momentum = cfg.get("momentum", 0.0)

        @optax.inject_hyperparams
        def make(learning_rate):
            chain = []
            if weight_decay > 0:
                chain.append(_decayed(weight_decay))
            if momentum > 0:
                chain.append(optax.trace(decay=momentum))
            chain.append(optax.scale(-1.0 * learning_rate))
            return optax.chain(*chain)

        tx = make(lr)
    else:
        raise ConfigurationError(
            "Invalid optimizer. Valid options: 'adam', 'adamw', 'adafactor', "
            "'adagrad', 'adadelta', 'rmsprop', 'sgd'.")

    logger.info("%s(lr=%s, weight_decay=%s)", optimizer_name, lr, weight_decay)
    return tx


def set_learning_rate(opt_state, rate: float):
    """Write the scheduler's rate into an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = rate
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


# ------------------------------------------------------------------ schedulers
class BaseScheduler:
    """Host-side scheduler with state_dict parity
    (joeynmt/builders.py:253-287)."""

    def __init__(self):
        self._step = 0
        self._rate = 0.0

    def state_dict(self) -> Dict:
        return {"step": self._step, "rate": self._rate}

    def load_state_dict(self, state_dict: Dict) -> None:
        self._step = state_dict["step"]
        self._rate = state_dict["rate"]

    def step(self, step: int) -> float:
        """Sync with trainer step count; returns the new rate."""
        self._step = step + 1
        self._rate = self._compute_rate()
        return self._rate

    @property
    def rate(self) -> float:
        return self._rate

    def _compute_rate(self) -> float:
        raise NotImplementedError


class NoamScheduler(BaseScheduler):
    """Noam schedule (joeynmt/builders.py:290-341)."""

    def __init__(self, hidden_size: int, factor: float = 1.0, warmup: int = 4000):
        super().__init__()
        self.warmup = warmup
        self.factor = factor
        self.hidden_size = hidden_size

    def _compute_rate(self):
        step = self._step
        upper_bound = min(step**(-0.5), step * self.warmup**(-1.5))
        return self.factor * (self.hidden_size**(-0.5) * upper_bound)

    def state_dict(self):
        d = super().state_dict()
        d.update(warmup=self.warmup, factor=self.factor, hidden_size=self.hidden_size)
        return d

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        self.warmup = state_dict["warmup"]
        self.factor = state_dict["factor"]
        self.hidden_size = state_dict["hidden_size"]

    def __repr__(self):
        return (f"{self.__class__.__name__}(warmup={self.warmup}, "
                f"factor={self.factor}, hidden_size={self.hidden_size})")


class WarmupExponentialDecayScheduler(BaseScheduler):
    """joeynmt/builders.py:344-415."""

    def __init__(self, peak_rate: float = 1.0e-3, decay_length: int = 10000,
                 warmup: int = 4000, decay_rate: float = 0.5,
                 min_rate: float = 1.0e-5):
        super().__init__()
        self.warmup = warmup
        self.decay_length = decay_length
        self.peak_rate = peak_rate
        self.decay_rate = decay_rate
        self.min_rate = min_rate

    def _compute_rate(self):
        step = self._step
        if step < self.warmup:
            rate = step * self.peak_rate / self.warmup
        else:
            exponent = (step - self.warmup) / self.decay_length
            rate = self.peak_rate * (self.decay_rate**exponent)
        return max(rate, self.min_rate)

    def state_dict(self):
        d = super().state_dict()
        d.update(warmup=self.warmup, decay_length=self.decay_length,
                 peak_rate=self.peak_rate, decay_rate=self.decay_rate,
                 min_rate=self.min_rate)
        return d

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        self.warmup = state_dict["warmup"]
        self.decay_length = state_dict["decay_length"]
        self.peak_rate = state_dict["peak_rate"]
        self.decay_rate = state_dict["decay_rate"]
        self.min_rate = state_dict["min_rate"]

    def __repr__(self):
        return (f"{self.__class__.__name__}(warmup={self.warmup}, "
                f"decay_length={self.decay_length}, decay_rate={self.decay_rate}, "
                f"peak_rate={self.peak_rate}, min_rate={self.min_rate})")


class WarmupInverseSquareRootScheduler(BaseScheduler):
    """joeynmt/builders.py:418-485."""

    def __init__(self, peak_rate: float = 1.0e-3, warmup: int = 10000,
                 min_rate: float = 1.0e-5):
        super().__init__()
        self.warmup = warmup
        self.min_rate = min_rate
        self.peak_rate = peak_rate
        self.decay_rate = peak_rate * (warmup**0.5)

    def _compute_rate(self):
        step = self._step
        if step < self.warmup:
            rate = step * self.peak_rate / self.warmup
        else:
            rate = self.decay_rate * (step**-0.5)
        return max(rate, self.min_rate)

    def state_dict(self):
        d = super().state_dict()
        d.update(warmup=self.warmup, peak_rate=self.peak_rate,
                 decay_rate=self.decay_rate, min_rate=self.min_rate)
        return d

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        self.warmup = state_dict["warmup"]
        self.decay_rate = state_dict["decay_rate"]
        self.peak_rate = state_dict["peak_rate"]
        self.min_rate = state_dict["min_rate"]

    def __repr__(self):
        return (f"{self.__class__.__name__}(warmup={self.warmup}, "
                f"decay_rate={self.decay_rate:.6f}, peak_rate={self.peak_rate}, "
                f"min_rate={self.min_rate})")


class PlateauScheduler(BaseScheduler):
    """ReduceLROnPlateau equivalent (torch semantics with threshold_mode=abs,
    eps=0; joeynmt/builders.py:175-187): multiply the rate by `factor` after
    `patience` validations without improvement."""

    def __init__(self, initial_rate: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10):
        super().__init__()
        self._rate = initial_rate
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad = 0

    def step(self, step: int) -> float:  # noqa: ARG002 - signature parity
        return self._rate

    def step_metric(self, metric: float) -> float:
        """Called after each validation with the monitored score."""
        improved = (metric < self.best) if self.mode == "min" else (metric > self.best)
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self._rate = self._rate * self.factor
                self.num_bad = 0
        return self._rate

    def _compute_rate(self):
        return self._rate

    def state_dict(self):
        d = super().state_dict()
        d.update(mode=self.mode, factor=self.factor, patience=self.patience,
                 best=self.best, num_bad=self.num_bad)
        return d

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        self.mode = state_dict["mode"]
        self.factor = state_dict["factor"]
        self.patience = state_dict["patience"]
        self.best = state_dict["best"]
        self.num_bad = state_dict["num_bad"]


class StepDecayScheduler(BaseScheduler):
    """StepLR equivalent: rate *= gamma every `step_size` epochs
    (joeynmt/builders.py:188-192; stepped at epoch)."""

    def __init__(self, initial_rate: float, step_size: int = 1, gamma: float = 0.1):
        super().__init__()
        self._rate = initial_rate
        self.step_size = step_size
        self.gamma = gamma
        self._epochs = 0

    def step(self, step: int) -> float:
        self._epochs += 1
        if self._epochs % self.step_size == 0:
            self._rate = self._rate * self.gamma
        return self._rate

    def _compute_rate(self):
        return self._rate

    def state_dict(self):
        d = super().state_dict()
        d.update(step_size=self.step_size, gamma=self.gamma, epochs=self._epochs)
        return d

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        self.step_size = state_dict["step_size"]
        self.gamma = state_dict["gamma"]
        self._epochs = state_dict["epochs"]


class ExponentialDecayScheduler(StepDecayScheduler):
    """ExponentialLR equivalent: rate *= gamma each epoch
    (joeynmt/builders.py:193-197)."""

    def __init__(self, initial_rate: float, gamma: float = 0.99):
        super().__init__(initial_rate, step_size=1, gamma=gamma)


def build_scheduler(cfg: Dict, scheduler_mode: str,
                    hidden_size: int = 0) -> Tuple[Optional[BaseScheduler], str]:
    """joeynmt/builders.py:139-250 — returns (scheduler, step_at)."""
    scheduler, scheduler_step_at = None, None
    scheduler_name = cfg.get("scheduling", None)
    lr = cfg.get("learning_rate", 3.0e-4)

    if scheduler_name is None:
        return None, "none"
    if scheduler_name == "plateau":
        scheduler = PlateauScheduler(
            initial_rate=lr, mode=scheduler_mode,
            factor=cfg.get("decrease_factor", 0.1),
            patience=cfg.get("patience", 10))
        scheduler_step_at = "validation"
    elif scheduler_name == "decaying":
        scheduler = StepDecayScheduler(
            initial_rate=lr, step_size=cfg.get("decaying_step_size", 1))
        scheduler_step_at = "epoch"
    elif scheduler_name == "exponential":
        scheduler = ExponentialDecayScheduler(
            initial_rate=lr, gamma=cfg.get("decrease_factor", 0.99))
        scheduler_step_at = "epoch"
    elif scheduler_name == "noam":
        scheduler = NoamScheduler(
            hidden_size=hidden_size, factor=cfg.get("learning_rate_factor", 1),
            warmup=cfg.get("learning_rate_warmup", 4000))
        scheduler_step_at = "step"
    elif scheduler_name == "warmupexponentialdecay":
        scheduler = WarmupExponentialDecayScheduler(
            min_rate=cfg.get("learning_rate_min", 1.0e-5),
            decay_rate=cfg.get("learning_rate_decay", 0.1),
            warmup=cfg.get("learning_rate_warmup", 4000),
            peak_rate=cfg.get("learning_rate_peak", 1.0e-3),
            decay_length=cfg.get("learning_rate_decay_length", 10000))
        scheduler_step_at = "step"
    elif scheduler_name == "warmupinversesquareroot":
        peak_rate = cfg.get("learning_rate_peak", lr)
        scheduler = WarmupInverseSquareRootScheduler(
            peak_rate=peak_rate, min_rate=cfg.get("learning_rate_min", 1.0e-5),
            warmup=cfg.get("learning_rate_warmup", 10000))
        scheduler_step_at = "step"
    else:
        raise ConfigurationError(
            "Invalid scheduler. Valid options: 'plateau', 'decaying', "
            "'exponential', 'noam', 'warmupexponentialdecay', "
            "'warmupinversesquareroot'.")

    logger.info(scheduler)
    return scheduler, scheduler_step_at
