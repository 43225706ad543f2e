# coding: utf-8
"""
Vocabulary: token <-> id mapping.

Behavioral parity with joeynmt/vocabulary.py:20-301 (specials + lang_tags
prefix ordering, file round-trip, sentences_to_ids with prompt_mask from the
<sep> position, arrays_to_sentences cut-at-eos, frequency-then-alphabetical
vocabulary construction) — the id layout is the compatibility contract with
published checkpoints; everything else here is this codebase's own design.
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
    """Immutable token <-> id table.

    Id layout (the checkpoint contract): specials first in the order
    unk/pad/bos/eos[/sep], then language tags, then the corpus tokens in
    the order given — duplicates keep their first id.
    """

    def __init__(self, tokens: List[str], cfg: SpecialSymbols) -> None:
        core = [cfg.unk_token, cfg.pad_token, cfg.bos_token, cfg.eos_token]
        self.specials = core + ([cfg.sep_token] if cfg.sep_token else [])
        self.lang_tags = list(cfg.lang_tags)

        self._tokens: List[str] = []
        self._ids: Dict[str, int] = {}
        for tok in (*self.specials, *self.lang_tags, *tokens):
            if tok not in self._ids:
                self._ids[tok] = len(self._tokens)
                self._tokens.append(tok)

        self.unk_index = cfg.unk_id
        self.pad_index = cfg.pad_id
        self.bos_index = cfg.bos_id
        self.eos_index = cfg.eos_id
        self.sep_index = cfg.sep_id if cfg.sep_token else None
        # the configured ids must land exactly where construction put the
        # special tokens — a mismatched YAML would silently corrupt decoding
        expected = dict(zip(core, (cfg.unk_id, cfg.pad_id, cfg.bos_id,
                                   cfg.eos_id)))
        if cfg.sep_token:
            expected[cfg.sep_token] = cfg.sep_id
        for tok, want in expected.items():
            assert self._ids[tok] == want, (tok, want, self._ids[tok])
        assert self._tokens[cfg.unk_id] == cfg.unk_token

    # ------------------------------------------------------------- lookups
    def lookup(self, token: str) -> int:
        """Token id, or unk for out-of-vocabulary surface forms."""
        return self._ids.get(token, self.unk_index)

    def is_unk(self, token: str) -> bool:
        return self.lookup(token) == self.unk_index

    def __len__(self) -> int:
        return len(self._tokens)

    def __eq__(self, other) -> bool:
        return (isinstance(other, Vocabulary)
                and self._tokens == other._tokens)

    def to_file(self, file: Path) -> None:
        """One token per line; line number == id (round-trips via voc_file)."""
        write_list_to_file(file, self._tokens)

    # ------------------------------------------------------------ encoding
    def sentences_to_ids(
        self,
        sentences: List[List[str]],
        bos: bool = True,
        eos: bool = True,
    ) -> Tuple[List[List[int]], List[int], List[List[int]]]:
        """Encode a batch of token lists to padded id rows.

        Returns (padded ids, true lengths, prompt masks). The prompt mask
        marks positions up to AND INCLUDING the first <sep> with 1 — the
        forced-decoding prefix for `<sep>`-delimited prompts
        (joeynmt/vocabulary.py:156-196 defines this contract).
        """
        extra = int(bos) + int(eos)
        width = extra + max(len(s) for s in sentences)
        head = [self.bos_index] if bos else []
        tail = [self.eos_index] if eos else []

        rows, lengths, masks = [], [], []
        for sent in sentences:
            ids = head + [self.lookup(t) for t in sent] + tail
            lengths.append(len(ids))
            rows.append(ids + [self.pad_index] * (width - len(ids)))
            prompt_end = 0
            if self.sep_index is not None and self.sep_index in ids:
                prompt_end = ids.index(self.sep_index) + 1
            masks.append([1] * prompt_end + [0] * (width - prompt_end))
        return rows, lengths, masks

    # ------------------------------------------------------------ decoding
    def arrays_to_sentences(self, arrays: np.ndarray, cut_at_eos: bool = True,
                            skip_pad: bool = True) -> List[List[str]]:
        """Id rows back to token lists: keep everything up to and including
        the first eos (when cutting), with pads dropped."""
        out = []
        for row in arrays:
            row = np.asarray(row).ravel()
            if cut_at_eos:
                hits = np.flatnonzero(row == self.eos_index)
                if hits.size:
                    row = row[:hits[0] + 1]
            if skip_pad:
                row = row[row != self.pad_index]
            out.append([self._tokens[int(i)] for i in row])
        return out

    def log_vocab(self, k: int) -> str:
        return " ".join(f"({i}) {t}" for i, t in enumerate(self._tokens[:k]))

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(len={len(self)}, "
                f"specials={self.specials}, lang_tags={self.lang_tags})")


def sort_and_cut(counter: Counter, max_size: int = sys.maxsize,
                 min_freq: int = -1) -> List[str]:
    """Vocabulary order from corpus counts: frequency descending, ties
    alphabetical — one composite-key sort (the reference reaches the same
    order with two stable passes, joeynmt/vocabulary.py:209-230)."""
    items = counter.items()
    if min_freq > -1:
        items = [kv for kv in items if kv[1] >= min_freq]
    ranked = sorted(items, key=lambda kv: (-kv[1], kv[0]))
    return [tok for tok, _ in ranked[:max_size]]


def _build_vocab(cfg: Dict, special_symbols: SpecialSymbols,
                 dataset=None) -> Vocabulary:
    """One side's vocabulary: from voc_file when given, else counted from
    the (full, unsubsampled) training data (joeynmt/vocabulary.py:233-272)."""
    max_size = int(cfg.get("voc_limit", sys.maxsize))
    assert max_size > 0

    voc_file = cfg.get("voc_file", None)
    if voc_file is not None:
        tokens = read_list_from_file(Path(voc_file))
    elif dataset is not None:
        corpus = dataset.get_list(lang=cfg["lang"], tokenized=True,
                                  subsampled=False)
        tokens = sort_and_cut(Counter(flatten(corpus)), max_size,
                              cfg.get("voc_min_freq", 1))
    else:
        raise ValueError("Please provide a vocab file path or dataset.")

    vocab = Vocabulary(tokens, special_symbols)
    n_reserved = len(vocab.specials) + len(vocab.lang_tags)
    assert len(vocab) <= max_size + n_reserved, (len(vocab), max_size)
    # every reserved token except unk itself must resolve to a real id
    for s in vocab.specials[1:] + vocab.lang_tags:
        assert not vocab.is_unk(s)
    return vocab


def build_vocab(cfg: Dict, task: str, dataset=None,
                model_dir: Optional[Path] = None
                ) -> Tuple[Optional[Vocabulary], Vocabulary]:
    """(src_vocab or None for S2T, trg_vocab) — joeynmt/vocabulary.py:275-301.

    When resuming from a model_dir, sides without an explicit voc_file fall
    back to the persisted {src,trg}_vocab.txt so resumed runs can never
    rebuild a different id layout.
    """
    persisted = {"src": "src_vocab.txt", "trg": "trg_vocab.txt"}
    for side, fname in persisted.items():
        if side == "src" and task != "MT":
            continue
        if model_dir is not None and cfg[side].get("voc_file", None) is None:
            saved = model_dir / fname
            assert saved.is_file()
            cfg[side]["voc_file"] = saved.as_posix()

    symbols = cfg["special_symbols"]
    src_vocab = (_build_vocab(cfg["src"], symbols, dataset)
                 if task == "MT" else None)
    trg_vocab = _build_vocab(cfg["trg"], symbols, dataset)

    if src_vocab is not None:
        for attr in ("pad_index", "bos_index", "eos_index", "sep_index"):
            assert getattr(src_vocab, attr) == getattr(trg_vocab, attr), attr
    return src_vocab, trg_vocab
