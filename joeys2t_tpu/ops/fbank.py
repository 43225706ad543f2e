# coding: utf-8
"""
Kaldi-compliant log-mel filterbank extraction.

First-party replacement for torchaudio.compliance.kaldi.fbank
(joeynmt/helpers_for_audio.py:30-68). Two implementations sharing constants:
  - ``fbank_numpy``: host-side, variable-length (data prep / CPU pipeline)
  - ``fbank_jax``: jittable fixed-shape version for on-device fusion with
    CMVN/SpecAugment and the conv subsampler (BASELINE.json north star)

Defaults mirror ta_kaldi.fbank(num_mel_bins=80, sample_frequency=sr):
25ms/10ms framing, snip_edges, dither=0, DC removal, 0.97 preemphasis,
povey window, 512-point rfft, power spectrum, kaldi mel banks (low 20Hz,
high nyquist), log with float32-eps floor. Validated against the reference's
stored golden values from real LibriSpeech wavs (tests/test_audio.py).
"""
import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # torch.finfo(torch.float).eps
MILLISECONDS_TO_SECONDS = 0.001


def _next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2**(x - 1).bit_length()


def povey_window(window_size: int) -> np.ndarray:
    """(0.5 - 0.5 cos(2 pi n / (N-1)))^0.85 — kaldi's default window."""
    n = np.arange(window_size, dtype=np.float64)
    return ((0.5 - 0.5 * np.cos(2 * math.pi * n / (window_size - 1)))**0.85)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=8)
def mel_banks(num_bins: int, window_length_padded: int, sample_freq: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi triangular mel filterbank, shape (num_bins, padded//2 + 1).

    Follows kaldi/torchaudio get_mel_banks: bins over fft bin centers, the
    nyquist column zero-padded (torchaudio kaldi.py pads (0,1))."""
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    assert 0.0 <= low_freq < nyquist and low_freq < high_freq <= nyquist

    fft_bin_width = sample_freq / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_freq_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float64)
    fft_freqs = fft_bin_width * np.arange(num_fft_bins)
    mel = mel_scale(fft_freqs)  # (num_fft_bins,)
    for j in range(num_bins):
        left = mel_low + j * mel_freq_delta
        center = mel_low + (j + 1) * mel_freq_delta
        right = mel_low + (j + 2) * mel_freq_delta
        up = (mel - left) / (center - left)
        down = (right - mel) / (right - center)
        bins[j, :num_fft_bins] = np.maximum(0.0, np.minimum(up, down))
    return bins.astype(np.float32)


def _frame_params(sample_rate: float, frame_length_ms: float, frame_shift_ms: float):
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * MILLISECONDS_TO_SECONDS)
    padded = _next_power_of_2(window_size)
    return window_size, window_shift, padded


def num_frames(wave_length: int, sample_rate: float = 16000.0,
               frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0) -> int:
    """snip_edges frame count."""
    window_size, window_shift, _ = _frame_params(sample_rate, frame_length_ms,
                                                 frame_shift_ms)
    if wave_length < window_size:
        return 0
    return 1 + (wave_length - window_size) // window_shift


def fbank_numpy(
    waveform: np.ndarray,  # (n,) float32, int16-scaled (reference: wav * 2^15)
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
) -> np.ndarray:
    """Host-side kaldi fbank -> (num_frames, num_mel_bins) float32."""
    waveform = np.asarray(waveform, dtype=np.float32).reshape(-1)
    window_size, window_shift, padded = _frame_params(sample_rate, frame_length_ms,
                                                      frame_shift_ms)
    m = num_frames(len(waveform), sample_rate, frame_length_ms, frame_shift_ms)
    if m == 0:
        return np.zeros((0, num_mel_bins), dtype=np.float32)

    # strided framing (snip_edges)
    idx = np.arange(window_size)[None, :] + window_shift * np.arange(m)[:, None]
    frames = waveform[idx].astype(np.float64)

    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)

    if preemphasis_coefficient != 0.0:
        # first sample duplicated at the boundary (kaldi offset window)
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis_coefficient * prev

    frames = frames * povey_window(window_size)[None, :]

    # zero-pad to power of two and take the power spectrum
    if padded > window_size:
        frames = np.pad(frames, ((0, 0), (0, padded - window_size)))
    spectrum = np.abs(np.fft.rfft(frames, axis=1))**2  # (m, padded//2+1)

    banks = mel_banks(num_mel_bins, padded, float(sample_rate)).astype(np.float64)
    mel_energies = spectrum @ banks.T
    return np.log(np.maximum(mel_energies, EPSILON)).astype(np.float32)


@lru_cache(maxsize=4)
def _dft_matrices(padded: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices (padded, padded//2+1) for the MXU path."""
    n = np.arange(padded)[:, None]
    k = np.arange(padded // 2 + 1)[None, :]
    ang = -2.0 * math.pi * n * k / padded
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@partial(jax.jit, static_argnames=("sample_rate", "num_mel_bins", "frame_length_ms",
                                   "frame_shift_ms"))
def fbank_jax(
    waveform: jnp.ndarray,  # (n,) float32, int16-scaled; fixed length per jit
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
) -> jnp.ndarray:
    """Jittable kaldi fbank with static input length -> (m, num_mel_bins).

    The framing matmul + mel projection both map onto the MXU; XLA fuses the
    elementwise chain (DC offset, preemphasis, window, log)."""
    window_size, window_shift, padded = _frame_params(sample_rate, frame_length_ms,
                                                      frame_shift_ms)
    n = waveform.shape[0]
    m = max(1 + (n - window_size) // window_shift, 0)

    idx = (jnp.arange(window_size)[None, :]
           + window_shift * jnp.arange(m)[:, None])
    frames = waveform[idx].astype(jnp.float32)

    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(povey_window(window_size), jnp.float32)[None, :]

    # power spectrum via an explicit real-DFT matmul: TPUs have no FFT unit
    # (XLA lowers fft to a slow expansion), but (m, padded) @ (padded, bins)
    # rides the MXU. padded is 512 for 16 kHz audio, so the dense DFT is
    # only ~2x the flops of an ideal FFT and far faster in practice.
    cos_m, sin_m = _dft_matrices(padded)
    if padded > window_size:
        frames = jnp.pad(frames, ((0, 0), (0, padded - window_size)))
    hi = jax.lax.Precision.HIGHEST  # keep float32 accuracy on the MXU
    re = jnp.matmul(frames, jnp.asarray(cos_m), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin_m), precision=hi)
    spectrum = re * re + im * im

    banks = jnp.asarray(mel_banks(num_mel_bins, padded, float(sample_rate)))
    mel_energies = spectrum @ banks.T
    return jnp.log(jnp.maximum(mel_energies, EPSILON))
