# coding: utf-8
"""
Fused on-device audio front end (the BASELINE.json north star): batched
waveform -> kaldi fbank -> CMVN -> SpecAugment as one jittable function that
can be folded into the first encoder stage.

The host pipeline (SpeechProcessor + precomputed .npy features) remains the
default for dataset training; this path serves streaming/serving scenarios
(wav in, text out, zero host feature code) and wav-direct training.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from joeys2t_tpu.data.augmentation import cmvn_jax, specaugment_jax
from joeys2t_tpu.ops.fbank import _frame_params, fbank_jax


@partial(jax.jit, static_argnames=("sample_rate", "num_mel_bins", "norm_means",
                                   "norm_vars", "training", "specaugment"))
def device_frontend(
    waveforms: jnp.ndarray,  # (B, N) float32, int16-scaled, zero-padded
    wave_lengths: jnp.ndarray,  # (B,) valid samples per waveform
    rng: Optional[jax.Array] = None,
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    norm_means: bool = True,
    norm_vars: bool = True,
    training: bool = False,
    specaugment: Optional[Tuple[int, int, int, int, float]] = (2, 27, 2, 100, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (features (B, T, num_mel_bins), frame_lengths (B,)).

    Padded frames are zeroed; CMVN statistics and SpecAugment masks respect
    per-utterance lengths. Static input length => one compilation per bucket.
    """
    window_size, window_shift, _ = _frame_params(sample_rate, 25.0, 10.0)
    n = waveforms.shape[1]
    t_max = max(1 + (n - window_size) // window_shift, 0)

    feats = jax.vmap(lambda w: fbank_jax(w, sample_rate=sample_rate,
                                         num_mel_bins=num_mel_bins))(waveforms)
    # frames fully covered by valid samples
    frame_lengths = jnp.clip(
        1 + (wave_lengths - window_size) // window_shift, 0, t_max)

    def per_utt(feat, length, key):
        feat = cmvn_jax(feat, length, norm_means=norm_means, norm_vars=norm_vars)
        if training and specaugment is not None:
            fm_n, fm_f, tm_n, tm_t, tm_p = specaugment
            feat = specaugment_jax(key, feat, length, freq_mask_n=fm_n,
                                   freq_mask_f=fm_f, time_mask_n=tm_n,
                                   time_mask_t=tm_t, time_mask_p=tm_p)
        return feat

    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, waveforms.shape[0])
    feats = jax.vmap(per_utt)(feats, frame_lengths, keys)
    return feats, frame_lengths
