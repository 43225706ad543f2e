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


_MPG123 = None


def _load_mpg123():
    """Bind the system libmpg123 via ctypes (no Python package needed)."""
    global _MPG123
    if _MPG123 is not None:
        return _MPG123 or None
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("mpg123") or "libmpg123.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        _MPG123 = False
        return None
    c = ctypes
    lib.mpg123_new.restype = c.c_void_p
    lib.mpg123_new.argtypes = [c.c_char_p, c.POINTER(c.c_int)]
    lib.mpg123_open.argtypes = [c.c_void_p, c.c_char_p]
    lib.mpg123_getformat.argtypes = [c.c_void_p, c.POINTER(c.c_long),
                                     c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.mpg123_format_none.argtypes = [c.c_void_p]
    lib.mpg123_format.argtypes = [c.c_void_p, c.c_long, c.c_int, c.c_int]
    lib.mpg123_read.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t,
                                c.POINTER(c.c_size_t)]
    lib.mpg123_close.argtypes = [c.c_void_p]
    lib.mpg123_delete.argtypes = [c.c_void_p]
    try:  # modern mpg123 makes init a no-op; call it when present
        lib.mpg123_init()
    except AttributeError:
        pass
    _MPG123 = lib
    return lib


def read_mp3(path: Path) -> Tuple[np.ndarray, int]:
    """Decode an .mp3 to (float32 waveform in int16 scale, sample_rate) via
    the system libmpg123 (counterpart of the reference's torchaudio/sox
    mp3 path, joeynmt/helpers_for_audio.py:100-127). Stereo is downmixed by
    averaging, matching read_wav."""
    import ctypes as c

    lib = _load_mpg123()
    if lib is None:
        raise RuntimeError(
            "mp3 decoding needs the system libmpg123, which was not found; "
            "convert the file to .wav or precompute .npy features.")

    MPG123_OK, MPG123_DONE = 0, -12
    ENC_SIGNED_16 = 0xD0  # MPG123_ENC_SIGNED_16

    err = c.c_int(0)
    h = lib.mpg123_new(None, c.byref(err))
    assert h, f"mpg123_new failed: {err.value}"
    try:
        rc = lib.mpg123_open(h, str(path).encode())
        if rc != MPG123_OK:
            raise RuntimeError(f"mpg123_open({path}) failed: {rc}")
        rate = c.c_long(0)
        channels = c.c_int(0)
        encoding = c.c_int(0)
        rc = lib.mpg123_getformat(h, c.byref(rate), c.byref(channels),
                                  c.byref(encoding))
        if rc != MPG123_OK:
            raise RuntimeError(f"mpg123_getformat failed: {rc}")
        # pin the output format to signed 16-bit at the native rate/channels
        lib.mpg123_format_none(h)
        lib.mpg123_format(h, rate.value, channels.value, ENC_SIGNED_16)

        chunks = []
        buf = c.create_string_buffer(65536)
        done = c.c_size_t(0)
        while True:
            rc = lib.mpg123_read(h, buf, len(buf), c.byref(done))
            if done.value:
                chunks.append(bytes(buf.raw[:done.value]))
            if rc == MPG123_DONE:
                break
            if rc not in (MPG123_OK,):
                # MPG123_NEW_FORMAT (-11) can occur once at stream start
                if rc == -11:
                    continue
                raise RuntimeError(f"mpg123_read failed: {rc}")
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)

    data = np.frombuffer(b"".join(chunks), dtype="<i2").astype(np.float32)
    if channels.value > 1:
        data = data.reshape(-1, channels.value).mean(axis=1)
    return data, int(rate.value)


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
        elif _path.suffix == ".mp3":
            waveform, sample_rate = read_mp3(_path)
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
