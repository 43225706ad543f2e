# coding: utf-8
"""
Native (C++) components, built on demand with g++ and loaded via ctypes.
"""
import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = Path(__file__).parent
_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    """Compile libeditdistance.so if needed and load it."""
    global _LIB, _BUILD_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        src = _NATIVE_DIR / "editdistance.cpp"
        lib_path = _NATIVE_DIR / "libeditdistance.so"
        try:
            if (not lib_path.exists()
                    or lib_path.stat().st_mtime < src.stat().st_mtime):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC",
                     src.as_posix(), "-o", lib_path.as_posix()],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(lib_path.as_posix())
            lib.edit_distance.restype = ctypes.c_int64
            lib.edit_distance.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ]
            lib.edit_distance_batch.restype = None
            lib.edit_distance_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            _LIB = lib
        except Exception as e:  # pragma: no cover - toolchain missing
            logger.warning("editdistance C++ build failed (%s); using Python fallback", e)
            _BUILD_FAILED = True
    return _LIB


def _py_edit_distance(a: Sequence[int], b: Sequence[int]) -> int:
    """Pure-Python fallback (same DP as the C++ version)."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    if n < m:
        a, b, n, m = b, a, m, n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        curr = [i] + [0] * m
        ai = a[i - 1]
        for j in range(1, m + 1):
            curr[j] = min(prev[j - 1] + (ai != b[j - 1]), prev[j] + 1, curr[j - 1] + 1)
        prev = curr
    return prev[m]


def _intern(tokens: Sequence, table: dict) -> List[int]:
    return [table.setdefault(t, len(table)) for t in tokens]


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Edit distance between two token sequences (tokens may be any hashable)."""
    table: dict = {}
    ia, ib = _intern(a, table), _intern(b, table)
    lib = _build_and_load()
    if lib is None:
        return _py_edit_distance(ia, ib)
    arr_a = (ctypes.c_int64 * len(ia))(*ia)
    arr_b = (ctypes.c_int64 * len(ib))(*ib)
    return int(lib.edit_distance(arr_a, len(ia), arr_b, len(ib)))


def edit_distance_batch(pairs: Sequence) -> List[int]:
    """Edit distances for a list of (hyp_tokens, ref_tokens) pairs."""
    table: dict = {}
    a_flat, a_lens, b_flat, b_lens = [], [], [], []
    for hyp, ref in pairs:
        ih, ir = _intern(hyp, table), _intern(ref, table)
        a_flat.extend(ih)
        a_lens.append(len(ih))
        b_flat.extend(ir)
        b_lens.append(len(ir))
    lib = _build_and_load()
    if lib is None:
        out, ao, bo = [], 0, 0
        for la, lb in zip(a_lens, b_lens):
            out.append(_py_edit_distance(a_flat[ao:ao + la], b_flat[bo:bo + lb]))
            ao += la
            bo += lb
        return out
    c_a = (ctypes.c_int64 * len(a_flat))(*a_flat)
    c_al = (ctypes.c_int64 * len(a_lens))(*a_lens)
    c_b = (ctypes.c_int64 * len(b_flat))(*b_flat)
    c_bl = (ctypes.c_int64 * len(b_lens))(*b_lens)
    c_out = (ctypes.c_int64 * len(pairs))()
    lib.edit_distance_batch(c_a, c_al, c_b, c_bl, len(pairs), c_out)
    return list(c_out)


# ------------------------------------------------------------------ fbank
_FBANK_LIB: Optional[ctypes.CDLL] = None
_FBANK_FAILED = False


def _load_fbank() -> Optional[ctypes.CDLL]:
    """Compile libfbank.so if needed and load it."""
    global _FBANK_LIB, _FBANK_FAILED
    with _LIB_LOCK:
        if _FBANK_LIB is not None or _FBANK_FAILED:
            return _FBANK_LIB
        src = _NATIVE_DIR / "fbank.cpp"
        lib_path = _NATIVE_DIR / "libfbank.so"
        try:
            if (not lib_path.exists()
                    or lib_path.stat().st_mtime < src.stat().st_mtime):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     src.as_posix(), "-o", lib_path.as_posix()],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(lib_path.as_posix())
            lib.fbank.restype = ctypes.c_int64
            lib.fbank.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_double, ctypes.c_int32, ctypes.c_double,
                ctypes.c_double, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.fbank_num_frames.restype = ctypes.c_int64
            lib.fbank_num_frames.argtypes = [
                ctypes.c_int64, ctypes.c_double, ctypes.c_double,
                ctypes.c_double,
            ]
            _FBANK_LIB = lib
        except Exception as e:  # pragma: no cover - toolchain missing
            logger.warning("fbank C++ build failed (%s); using numpy fallback", e)
            _FBANK_FAILED = True
    return _FBANK_LIB


def fbank_native(waveform, sample_rate: float = 16000.0,
                 num_mel_bins: int = 80, frame_length_ms: float = 25.0,
                 frame_shift_ms: float = 10.0):
    """C++ kaldi fbank -> (num_frames, num_mel_bins) float32 array, or None
    when the native library is unavailable (callers fall back to numpy)."""
    import numpy as np

    lib = _load_fbank()
    if lib is None:
        return None
    wav = np.ascontiguousarray(waveform, dtype=np.float32).reshape(-1)
    m = lib.fbank_num_frames(len(wav), sample_rate, frame_length_ms,
                             frame_shift_ms)
    out = np.empty((m, num_mel_bins), dtype=np.float32)
    written = lib.fbank(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        sample_rate, num_mel_bins, frame_length_ms, frame_shift_ms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m)
    assert written == m, (written, m)
    return out
