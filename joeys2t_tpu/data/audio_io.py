# coding: utf-8
"""
Host-side audio IO: wav reading, feature lookup from .npy / zip-with-offset
(counterpart of joeynmt/helpers_for_audio.py:72-127). No torchaudio: wav
decoding uses the stdlib `wave` module (16-bit PCM) and the fbank extraction
lives in joeys2t_tpu.ops.fbank.
"""
import io
import wave
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from joeys2t_tpu.ops.fbank import fbank_numpy
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def read_wav(path: Path) -> Tuple[np.ndarray, int]:
    """Read a PCM wav file -> (float32 waveform in int16 scale, sample_rate).

    Multi-channel audio is downmixed by averaging (sox `channels 1`
    semantics, joeynmt/helpers_for_audio.py:21-26)."""
    with wave.open(str(path), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) * 256.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    else:
        raise ValueError(f"Unsupported wav sample width: {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, framerate


def extract_fbank_features(
    waveform: np.ndarray,
    sample_rate: int,
    output_path: Optional[Path] = None,
    n_mel_bins: int = 80,
    overwrite: bool = False,
) -> Optional[np.ndarray]:
    """joeynmt/helpers_for_audio.py:41-68. `waveform` is already int16-scaled
    (read_wav output); the reference multiplies normalized floats by 2^15 to
    reach the same scale."""
    if output_path is not None and output_path.is_file() and not overwrite:
        return np.load(output_path.as_posix())
    # C++ extractor (joeys2t_tpu/native/fbank.cpp, ~2x numpy) with fallback
    from joeys2t_tpu.native import fbank_native

    features = fbank_native(waveform, sample_rate=sample_rate,
                            num_mel_bins=n_mel_bins)
    if features is None:
        features = fbank_numpy(waveform, sample_rate=sample_rate,
                               num_mel_bins=n_mel_bins)
    if output_path is not None:
        np.save(output_path.as_posix(), features)
        assert output_path.is_file(), output_path
    return features


def _is_npy_data(data: bytes) -> bool:
    """joeynmt/helpers_for_audio.py:72-73."""
    return data[0] == 147 and data[1] == 78


def _get_features_from_zip(path: Path, byte_offset: int, byte_size: int) -> np.ndarray:
    """Read one .npy blob from an uncompressed zip by byte offset
    (joeynmt/helpers_for_audio.py:77-89)."""
    with path.open("rb") as f:
        f.seek(byte_offset)
        data = f.read(byte_size)
    byte_features = io.BytesIO(data)
    if len(data) > 1 and _is_npy_data(data):
        return np.load(byte_features)
    raise ValueError(f'Unknown file format for "{path}" [{byte_offset}:{byte_size}]')


def get_n_frames(wave_length: int, sample_rate: int) -> int:
    """joeynmt/helpers_for_audio.py:93-96."""
    duration_ms = int(wave_length / sample_rate * 1000)
    return int(1 + (duration_ms - 25) / 10)


def get_features(root_path, fbank_path: str) -> np.ndarray:
    """Feature lookup: 'file.npy' | 'audio.wav' | 'feats.zip:offset:size'
    (joeynmt/helpers_for_audio.py:100-127)."""
    root_path = Path(root_path)
    _path, *extra = fbank_path.split(":")
    _path = root_path / _path
    if not _path.is_file():
        raise FileNotFoundError(f"File not found: {_path}")

    if len(extra) == 0:
        if _path.suffix == ".npy":
            features = np.load(_path.as_posix())
        elif _path.suffix == ".wav":
            waveform, sample_rate = read_wav(_path)
            features = extract_fbank_features(waveform, sample_rate)
        else:
            raise ValueError(f"Invalid file type: {_path}")
    elif len(extra) == 2:
        assert _path.suffix == ".zip"
        features = _get_features_from_zip(_path, int(extra[0]), int(extra[1]))
    else:
        raise ValueError(f"Invalid path: {root_path / fbank_path}")

    assert len(features.shape) == 2, "spectrogram must be a 2-D array."
    return features


def pad_features(feat_list, embed_size: int = 80,
                 pad_index: int = 1) -> Tuple[np.ndarray, list, None]:
    """Batch collation for float features; pad value = float(pad_index)
    (joeynmt/helpers_for_audio.py:130-170 — yes, pad value 1.0)."""
    max_len = max(int(f.shape[0]) for f in feat_list)
    batch_size = len(feat_list)
    features = np.full((batch_size, max_len, embed_size), float(pad_index),
                       dtype=np.float32)
    lengths = []
    for i, f in enumerate(feat_list):
        length = min(int(f.shape[0]), max_len)
        assert length > 0, "empty feature!"
        features[i, :length, :] = f[:length, :]
        lengths.append(length)
    m = max(lengths)
    if m < features.shape[1]:
        features = features[:, :m, :]
    assert max(lengths) == features.shape[1]
    assert embed_size == features.shape[2]
    assert sum(lengths) > 0
    return features, lengths, None
