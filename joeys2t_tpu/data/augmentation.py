# coding: utf-8
"""
Data augmentation: SpecAugment + CMVN (counterpart of
joeynmt/data_augmentation.py:15-115).

Host (numpy) versions keep the reference's np.random distributional behavior
for the data pipeline; jittable jax.random versions (ops-level) enable the
fused on-device front end.
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class SpecAugment:
    """SpecAugment (joeynmt/data_augmentation.py:15-80): n freq masks of width
    < f, n time masks of width < min(t, p*T), mask value = spectrogram mean."""

    def __init__(self, freq_mask_n: int = 2, freq_mask_f: int = 27,
                 time_mask_n: int = 2, time_mask_t: int = 40,
                 time_mask_p: float = 1.0, mask_value: Optional[float] = None):
        self.freq_mask_n = freq_mask_n
        self.freq_mask_f = freq_mask_f
        self.time_mask_n = time_mask_n
        self.time_mask_t = time_mask_t
        self.time_mask_p = time_mask_p
        self.mask_value = mask_value

    def __call__(self, spectrogram: np.ndarray) -> np.ndarray:
        assert len(spectrogram.shape) == 2, "spectrogram must be a 2-D tensor."
        distorted = spectrogram.copy()
        num_frames, num_freqs = spectrogram.shape
        mask_value = self.mask_value
        if mask_value is None:
            mask_value = spectrogram.mean()
        if num_frames == 0:
            return spectrogram
        if num_freqs < self.freq_mask_f:
            return spectrogram

        for _ in range(self.freq_mask_n):
            f = np.random.randint(0, self.freq_mask_f)
            f0 = np.random.randint(0, num_freqs - f)
            if f != 0:
                distorted[:, f0:f0 + f] = mask_value

        max_time_mask_t = min(self.time_mask_t, math.floor(num_frames * self.time_mask_p))
        if max_time_mask_t < 1:
            return distorted

        for _ in range(self.time_mask_n):
            t = np.random.randint(0, max_time_mask_t)
            t0 = np.random.randint(0, num_frames - t)
            if t != 0:
                distorted[t0:t0 + t, :] = mask_value

        assert distorted.shape == spectrogram.shape
        return distorted

    def __repr__(self):
        return (f"{self.__class__.__name__}(freq_mask_n={self.freq_mask_n}, "
                f"freq_mask_f={self.freq_mask_f}, time_mask_n={self.time_mask_n}, "
                f"time_mask_t={self.time_mask_t}, time_mask_p={self.time_mask_p})")


class CMVN:
    """Utterance-level cepstral mean/variance normalization
    (joeynmt/data_augmentation.py:83-115)."""

    def __init__(self, norm_means: bool = True, norm_vars: bool = True,
                 before: bool = True):
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.before = before

    def __call__(self, x: np.ndarray) -> np.ndarray:
        orig_shape = x.shape
        mean = x.mean(axis=0)
        square_sums = (x**2).sum(axis=0)
        if self.norm_means:
            x = np.subtract(x, mean)
        if self.norm_vars:
            var = square_sums / x.shape[0] - mean**2
            std = np.sqrt(np.maximum(var, 1e-10))
            x = np.divide(x, std)
        assert orig_shape == x.shape
        return x

    def __repr__(self):
        return (f"{self.__class__.__name__}(norm_means={self.norm_means}, "
                f"norm_vars={self.norm_vars}, before={self.before})")


# --------------------------------------------------------------- device ops
def cmvn_jax(x: jnp.ndarray, length: Optional[jnp.ndarray] = None,
             norm_means: bool = True, norm_vars: bool = True) -> jnp.ndarray:
    """Jittable utterance CMVN over valid frames of a padded (T, F) array."""
    if length is None:
        mask = jnp.ones((x.shape[0], 1), x.dtype)
        n = jnp.asarray(x.shape[0], x.dtype)
    else:
        mask = (jnp.arange(x.shape[0]) < length)[:, None].astype(x.dtype)
        n = length.astype(x.dtype)
    mean = jnp.sum(x * mask, axis=0) / n
    square_sums = jnp.sum((x**2) * mask, axis=0)
    if norm_means:
        x = x - mean
    if norm_vars:
        var = square_sums / n - mean**2
        std = jnp.sqrt(jnp.maximum(var, 1e-10))
        x = x / std
    return x * mask


def specaugment_jax(key: jax.Array, x: jnp.ndarray, length: jnp.ndarray,
                    freq_mask_n: int = 2, freq_mask_f: int = 27,
                    time_mask_n: int = 2, time_mask_t: int = 40,
                    time_mask_p: float = 1.0) -> jnp.ndarray:
    """Jittable SpecAugment on a padded (T, F) spectrogram with valid length.

    Distributionally matches the host version (widths uniform in [0, max),
    offsets uniform over feasible range); mask value = mean over valid frames."""
    t_pad, num_freqs = x.shape
    valid = (jnp.arange(t_pad) < length)[:, None]
    mask_value = jnp.sum(jnp.where(valid, x, 0.0)) / (length * num_freqs)

    keys = jax.random.split(key, 2 * (freq_mask_n + time_mask_n))
    k = iter(range(len(keys)))

    feasible = num_freqs >= freq_mask_f
    for _ in range(freq_mask_n):
        f = jax.random.randint(keys[next(k)], (), 0, max(freq_mask_f, 1))
        f0 = jax.random.randint(keys[next(k)], (), 0, max(num_freqs - freq_mask_f + 1, 1))
        cols = jnp.arange(num_freqs)
        hit = (cols >= f0) & (cols < f0 + f) & feasible
        x = jnp.where(hit[None, :], mask_value, x)

    max_t = jnp.minimum(time_mask_t, jnp.floor(length * time_mask_p)).astype(jnp.int32)
    for _ in range(time_mask_n):
        t = jax.random.randint(keys[next(k)], (), 0, jnp.maximum(max_t, 1))
        t0 = jax.random.randint(keys[next(k)], (), 0, jnp.maximum(length - t, 1))
        rows = jnp.arange(t_pad)
        hit = (rows >= t0) & (rows < t0 + t) & (max_t >= 1)
        x = jnp.where(hit[:, None], mask_value, x)

    return jnp.where(valid, x, 0.0)
