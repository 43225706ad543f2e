# coding: utf-8
"""
Vocabulary: token <-> id mapping.

Behavioral parity with joeynmt/vocabulary.py:20-301 (specials + lang_tags
prefix ordering, file round-trip, sentences_to_ids with prompt_mask from the
<sep> position, arrays_to_sentences cut-at-eos, sort_and_cut frequency-then-
alphabetical vocabulary construction).
"""
import sys
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from joeys2t_tpu.config import SpecialSymbols
from joeys2t_tpu.helpers import flatten, read_list_from_file, write_list_to_file
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class Vocabulary:
    """Mapping between tokens and indices (joeynmt/vocabulary.py:20)."""

    def __init__(self, tokens: List[str], cfg: SpecialSymbols) -> None:
        self.specials = [cfg.unk_token, cfg.pad_token, cfg.bos_token, cfg.eos_token]
        self.lang_tags = list(cfg.lang_tags)
        if cfg.sep_token:
            self.specials.append(cfg.sep_token)

        self._stoi: Dict[str, int] = {}
        self._itos: List[str] = []
        self.add_tokens(tokens=self.specials + self.lang_tags + tokens)
        assert len(self._stoi) == len(self._itos)

        self.pad_index = cfg.pad_id
        self.bos_index = cfg.bos_id
        self.eos_index = cfg.eos_id
        self.unk_index = cfg.unk_id
        self.sep_index = cfg.sep_id if cfg.sep_token else None
        assert self.pad_index == self.lookup(cfg.pad_token)
        assert self.bos_index == self.lookup(cfg.bos_token)
        assert self.eos_index == self.lookup(cfg.eos_token)
        assert self.unk_index == self.lookup(cfg.unk_token)
        assert self._itos[cfg.unk_id] == cfg.unk_token
        if cfg.sep_token:
            assert self.sep_index == self.lookup(cfg.sep_token)

    def add_tokens(self, tokens: List[str]) -> None:
        for t in tokens:
            new_index = len(self._itos)
            if t not in self._stoi:
                self._itos.append(t)
                self._stoi[t] = new_index

    def to_file(self, file: Path) -> None:
        write_list_to_file(file, self._itos)

    def is_unk(self, token: str) -> bool:
        return self.lookup(token) == self.unk_index

    def lookup(self, token: str) -> int:
        return self._stoi.get(token, self.unk_index)

    def __len__(self) -> int:
        return len(self._itos)

    def __eq__(self, other) -> bool:
        if isinstance(other, Vocabulary):
            return self._itos == other._itos
        return False

    def _array_to_sentence(self, array: np.ndarray, cut_at_eos: bool = True,
                           skip_pad: bool = True) -> List[str]:
        """joeynmt/vocabulary.py:109-135 — break at the position AFTER eos."""
        sentence = []
        for i in array:
            i = int(i)
            if skip_pad and i == self.pad_index:
                continue
            sentence.append(self._itos[i])
            if cut_at_eos and i == self.eos_index:
                break
        return sentence

    def arrays_to_sentences(self, arrays: np.ndarray, cut_at_eos: bool = True,
                            skip_pad: bool = True) -> List[List[str]]:
        return [self._array_to_sentence(array, cut_at_eos, skip_pad) for array in arrays]

    def sentences_to_ids(
        self,
        sentences: List[List[str]],
        bos: bool = True,
        eos: bool = True,
    ) -> Tuple[List[List[int]], List[int], List[List[int]]]:
        """Encode + pad + prompt_mask from <sep> position
        (joeynmt/vocabulary.py:156-196)."""
        max_len = max(len(sent) for sent in sentences)
        if bos:
            max_len += 1
        if eos:
            max_len += 1
        padded, lengths, prompt_mask = [], [], []
        for sent in sentences:
            encoded = [self.lookup(s) for s in sent]
            if bos:
                encoded = [self.bos_index] + encoded
            if eos:
                encoded = encoded + [self.eos_index]
            offset = max(0, max_len - len(encoded))
            padded.append(encoded + [self.pad_index] * offset)
            lengths.append(len(encoded))
            if self.sep_index is not None and self.sep_index in encoded:
                sep_pos = encoded.index(self.sep_index) + 1
                prompt_mask.append([1] * sep_pos + [0] * (max_len - sep_pos))
            else:
                prompt_mask.append([0] * max_len)
        return padded, lengths, prompt_mask

    def log_vocab(self, k: int) -> str:
        return " ".join(f"({i}) {t}" for i, t in enumerate(self._itos[:k]))

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(len={len(self)}, "
                f"specials={self.specials}, lang_tags={self.lang_tags})")


def sort_and_cut(counter: Counter, max_size: int = sys.maxsize,
                 min_freq: int = -1) -> List[str]:
    """Most-frequent-first, ties alphabetical (joeynmt/vocabulary.py:209-230)."""
    if min_freq > -1:
        counter = Counter({t: c for t, c in counter.items() if c >= min_freq})
    tokens_and_frequencies = sorted(counter.items(), key=lambda tup: tup[0])
    tokens_and_frequencies.sort(key=lambda tup: tup[1], reverse=True)
    vocab_tokens = [i[0] for i in tokens_and_frequencies[:max_size]]
    assert len(vocab_tokens) <= max_size, (len(vocab_tokens), max_size)
    return vocab_tokens


def _build_vocab(cfg: Dict, special_symbols: SpecialSymbols,
                 dataset=None) -> Vocabulary:
    """Build from vocab file or dataset tokens (joeynmt/vocabulary.py:233-272)."""
    vocab_file = cfg.get("voc_file", None)
    min_freq = cfg.get("voc_min_freq", 1)
    max_size = int(cfg.get("voc_limit", sys.maxsize))
    assert max_size > 0

    if vocab_file is not None:
        unique_tokens = read_list_from_file(Path(vocab_file))
    elif dataset is not None:
        sents = dataset.get_list(lang=cfg["lang"], tokenized=True, subsampled=False)
        counter = Counter(flatten(sents))
        unique_tokens = sort_and_cut(counter, max_size, min_freq)
    else:
        raise ValueError("Please provide a vocab file path or dataset.")

    vocab = Vocabulary(unique_tokens, special_symbols)
    assert len(vocab) <= max_size + len(vocab.specials + vocab.lang_tags), (len(vocab), max_size)
    for s in vocab.specials[1:] + vocab.lang_tags:
        assert not vocab.is_unk(s)
    return vocab


def build_vocab(cfg: Dict, task: str, dataset=None,
                model_dir: Optional[Path] = None) -> Tuple[Optional[Vocabulary], Vocabulary]:
    """joeynmt/vocabulary.py:275-301 — (src_vocab or None for S2T, trg_vocab)."""
    if task == "MT" and (model_dir is not None and cfg["src"].get("voc_file", None) is None):
        assert (model_dir / "src_vocab.txt").is_file()
        cfg["src"]["voc_file"] = (model_dir / "src_vocab.txt").as_posix()
    if model_dir is not None and cfg["trg"].get("voc_file", None) is None:
        assert (model_dir / "trg_vocab.txt").is_file()
        cfg["trg"]["voc_file"] = (model_dir / "trg_vocab.txt").as_posix()

    special_symbols = cfg["special_symbols"]
    src_vocab = _build_vocab(cfg["src"], special_symbols, dataset) if task == "MT" else None
    trg_vocab = _build_vocab(cfg["trg"], special_symbols, dataset)

    if task == "MT":
        assert src_vocab.pad_index == trg_vocab.pad_index
        assert src_vocab.bos_index == trg_vocab.bos_index
        assert src_vocab.eos_index == trg_vocab.eos_index
        assert src_vocab.sep_index == trg_vocab.sep_index
    return src_vocab, trg_vocab
