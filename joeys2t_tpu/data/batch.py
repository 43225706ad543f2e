# coding: utf-8
"""
Mini-batch container (counterpart of joeynmt/batch.py:17-231).

Pure numpy on the host; the train/eval steps device_put the arrays with the
appropriate NamedSharding. Two TPU-specific additions over the reference:
  - ``pad_to_shape``: rounds sequence lengths up to bucket boundaries and the
    batch dim up to a fixed size, so jit sees a small closed set of shapes
    (replaces the reference's dynamic shapes + DataParallel repad hack,
    joeynmt/batch.py:104-109)
  - masks are materialized once here, not rebuilt per consumer
"""
from typing import List, Optional, Sequence

import numpy as np

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)

DEFAULT_BUCKETS = (8, 16, 32, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
                   1536, 2048, 3072, 4096, 6144, 8192)


def round_up_to_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


class Batch:
    """Holds src/trg arrays + masks with teacher-forcing shift applied
    (joeynmt/batch.py:79-96)."""

    # pylint: disable=too-many-instance-attributes

    def __init__(
        self,
        src: np.ndarray,
        src_length: np.ndarray,
        src_prompt_mask: Optional[np.ndarray],
        trg: Optional[np.ndarray],
        trg_length: Optional[np.ndarray],
        trg_prompt_mask: Optional[np.ndarray],
        indices: np.ndarray,
        pad_index: int,
        eos_index: int,
        is_train: bool = True,
        task: str = "MT",
    ):
        self.src = src
        self.src_length = np.asarray(src_length)
        self.src_mask: Optional[np.ndarray] = None
        self.src_prompt_mask = src_prompt_mask
        self.trg_input: Optional[np.ndarray] = None
        self.trg: Optional[np.ndarray] = None
        self.trg_length: Optional[np.ndarray] = None
        self.trg_mask: Optional[np.ndarray] = None
        self.trg_prompt_mask: Optional[np.ndarray] = None
        self.indices = np.asarray(indices)

        self.nseqs = src.shape[0]
        self.ntokens: Optional[int] = None
        self.has_trg = trg is not None
        self.is_train = is_train
        if self.is_train:
            assert self.has_trg
        self.pad_index = pad_index
        self.eos_index = eos_index

        if self.has_trg:
            trg = np.asarray(trg)
            assert trg_length is not None
            # trg_input for teacher forcing: replace EOS with pad, cut last col
            has_eos = bool((trg == eos_index).any())  # true in training
            trg_input = np.where(trg == eos_index, pad_index, trg)
            self.trg_input = trg_input[:, :-1] if has_eos else trg_input
            # trg for loss: shifted by one (starts after BOS)
            self.trg = trg[:, 1:]
            self.trg_length = np.asarray(trg_length) - 1
            self.trg_mask = (self.trg != pad_index)[:, None, :]  # (B, 1, T)
            self.ntokens = int(self.trg_mask.sum())
            if trg_prompt_mask is not None:
                from joeys2t_tpu.helpers import adjust_mask_size

                self.trg_prompt_mask = adjust_mask_size(
                    np.asarray(trg_prompt_mask), self.nseqs, self.trg_input.shape[1])

        self.task = task
        if self.task == "MT":
            self.src_mask = (self.src != pad_index)[:, None, :]
        # S2T: src_mask reconstructed in the encoder after subsampling

        assert self.nseqs > 0, self.nseqs

    # ------------------------------------------------------------ static pad
    def pad_to_shape(self, batch_size: Optional[int] = None,
                     buckets: Sequence[int] = DEFAULT_BUCKETS,
                     src_len: Optional[int] = None,
                     trg_len: Optional[int] = None) -> "Batch":
        """Pad sequence dims up to bucket boundaries and the batch dim up to
        ``batch_size`` so jitted steps compile once per bucket combination.
        Padded rows carry pad tokens / zero masks / index -1 and contribute
        nothing to loss or outputs. ``src_len``/``trg_len`` override the
        bucket choice (multi-host training pads every process to the same
        globally-agreed shapes)."""
        b = self.nseqs
        target_b = batch_size if batch_size is not None else b
        assert target_b >= b, (target_b, b)

        def pad_arr(arr, length, axis, value):
            if arr is None:
                return None
            widths = [(0, 0)] * arr.ndim
            widths[axis] = (0, length - arr.shape[axis])
            return np.pad(arr, widths, constant_values=value)

        if src_len is None:
            src_len = round_up_to_bucket(self.src.shape[1], buckets)
        assert src_len >= self.src.shape[1], (src_len, self.src.shape)
        if self.task == "MT":
            src = pad_arr(self.src, src_len, 1, self.pad_index)
        else:
            src = pad_arr(self.src, src_len, 1, float(self.pad_index))
        src = pad_arr(src, target_b, 0, self.pad_index if self.task == "MT"
                      else float(self.pad_index))
        src_length = pad_arr(self.src_length, target_b, 0,
                             1 if self.task == "S2T" else 0)
        src_mask = None
        if self.src_mask is not None:
            src_mask = pad_arr(pad_arr(self.src_mask, src_len, 2, False),
                               target_b, 0, False)
        src_prompt_mask = None
        if self.src_prompt_mask is not None:
            src_prompt_mask = pad_arr(pad_arr(self.src_prompt_mask, src_len, 1, 0),
                                      target_b, 0, 0)

        new = Batch.__new__(Batch)
        new.__dict__.update(self.__dict__)
        new.src, new.src_length = src, src_length
        new.src_mask, new.src_prompt_mask = src_mask, src_prompt_mask
        new.indices = pad_arr(self.indices, target_b, 0, -1)
        new.nseqs = target_b

        if self.has_trg:
            if trg_len is None:
                trg_len = round_up_to_bucket(self.trg.shape[1], buckets)
            assert trg_len >= self.trg.shape[1], (trg_len, self.trg.shape)
            new.trg = pad_arr(pad_arr(self.trg, trg_len, 1, self.pad_index),
                              target_b, 0, self.pad_index)
            new.trg_input = pad_arr(
                pad_arr(self.trg_input, trg_len, 1, self.pad_index),
                target_b, 0, self.pad_index)
            new.trg_length = pad_arr(self.trg_length, target_b, 0, 0)
            new.trg_mask = pad_arr(pad_arr(self.trg_mask, trg_len, 2, False),
                                   target_b, 0, False)
            if self.trg_prompt_mask is not None:
                new.trg_prompt_mask = pad_arr(
                    pad_arr(self.trg_prompt_mask, trg_len, 1, 0), target_b, 0, 0)
        return new

    # -------------------------------------------------------------- loss norm
    def normalize(self, tensor, normalization: str = "none",
                  n_gpu: int = 1, n_accumulation: int = 1):
        """Normalize batch loss (joeynmt/batch.py:135-175). ``n_gpu`` kept for
        signature parity; under pjit the mean over devices is already folded
        into the summed loss, so callers pass 1."""
        if tensor is None:
            return None
        if normalization == "sum":
            return tensor
        if normalization == "batch":
            normalizer = self.nseqs
        elif normalization == "tokens":
            normalizer = self.ntokens
        elif normalization == "none":
            normalizer = 1
        norm_tensor = tensor / normalizer
        if n_gpu > 1:
            norm_tensor = norm_tensor / n_gpu
        if n_accumulation > 1:
            norm_tensor = norm_tensor / n_accumulation
        return norm_tensor

    def sort_by_src_length(self) -> List[int]:
        """Sort by src length descending; returns the reverse index
        (joeynmt/batch.py:177-208)."""
        perm_index = np.argsort(-self.src_length, kind="stable")
        rev_index = [0] * len(perm_index)
        for new_pos, old_pos in enumerate(perm_index):
            rev_index[int(old_pos)] = new_pos

        def sel(arr):
            return None if arr is None else arr[perm_index]

        self.src = sel(self.src)
        self.src_length = sel(self.src_length)
        self.src_mask = sel(self.src_mask)
        self.indices = sel(self.indices)
        self.src_prompt_mask = sel(self.src_prompt_mask)
        if self.has_trg:
            self.trg_input = sel(self.trg_input)
            self.trg_mask = sel(self.trg_mask)
            self.trg_length = sel(self.trg_length)
            self.trg = sel(self.trg)
            self.trg_prompt_mask = sel(self.trg_prompt_mask)
        assert max(rev_index) < len(rev_index), rev_index
        return rev_index

    @staticmethod
    def score(log_probs: np.ndarray, trg: np.ndarray, pad_index: int) -> np.ndarray:
        """Look up scores of ground-truth trg tokens (joeynmt/batch.py:210-223)."""
        assert log_probs.shape[0] == trg.shape[0]
        scores = []
        for i in range(log_probs.shape[0]):
            scores.append(
                np.array([
                    log_probs[i, j, ind] for j, ind in enumerate(trg[i])
                    if ind != pad_index
                ]))
        return np.array(scores, dtype=object)

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(nseqs={self.nseqs}, "
                f"ntokens={self.ntokens}, has_trg={self.has_trg}, "
                f"is_train={self.is_train})")
