# coding: utf-8
"""
Minimal SentencePiece model reader + segmenter (first-party).

The environment has no `sentencepiece` package, but the reference's toy data
and hub models ship .model files (joeynmt/tokenizers.py:203-207). This module
parses the ModelProto protobuf wire format directly and implements:
  - unigram segmentation (Viterbi over piece log-probs, unk penalty 10.0)
  - BPE segmentation (iterative best-scored merges)
  - encode/decode/SetVocabulary/sample_encode_as_pieces API subset matching
    what joeys2t_tpu.tokenizers.SentencePieceTokenizer calls

Normalization approximates the default `nmt_nfkc` spec: NFKC + whitespace
collapsing + '▁' escaping + dummy prefix. (The precompiled charsmap's extra
rules cover rare codepoints only.)
"""
import random
import unicodedata
from pathlib import Path
from typing import Dict, List, Optional, Set, Tuple

SPACE_ESCAPE = "▁"  # '▁'

# SentencePiece piece types (sentencepiece_model.proto)
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val, pos = buf[pos:pos + 8], pos + 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + length], pos + length
        elif wire == 5:  # 32-bit
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"Unsupported wire type {wire}")
        yield field, wire, val


class MiniSentencePiece:
    """Loaded SentencePiece model with a sentencepiece-like API subset."""

    def __init__(self, pieces: List[Tuple[str, float, int]], model_type: int = 1):
        self.pieces = pieces
        self.model_type = model_type  # 1=unigram, 2=bpe
        self._scores: Dict[str, float] = {}
        self._types: Dict[str, int] = {}
        for piece, score, ptype in pieces:
            if piece not in self._scores:
                self._scores[piece] = score
                self._types[piece] = ptype
        self._allowed: Optional[Set[str]] = None
        self.min_score = min((s for _, s, t in pieces if t == NORMAL), default=0.0)
        self.unk_penalty = 10.0
        self._max_piece_len = max((len(p) for p, _, t in pieces if t == NORMAL),
                                  default=1)

    # ------------------------------------------------------------------ load
    @classmethod
    def from_file(cls, path: Path) -> "MiniSentencePiece":
        buf = Path(path).read_bytes()
        pieces = []
        model_type = 1
        for field, wire, val in _parse_fields(buf):
            if field == 1 and wire == 2:  # SentencePiece message
                piece, score, ptype = "", 0.0, NORMAL
                for f2, w2, v2 in _parse_fields(val):
                    if f2 == 1 and w2 == 2:
                        piece = v2.decode("utf-8")
                    elif f2 == 2 and w2 == 5:
                        import struct

                        score = struct.unpack("<f", v2)[0]
                    elif f2 == 3 and w2 == 0:
                        ptype = v2
                pieces.append((piece, score, ptype))
            elif field == 2 and wire == 2:  # TrainerSpec
                for f2, w2, v2 in _parse_fields(val):
                    if f2 == 3 and w2 == 0:  # model_type
                        model_type = v2
        return cls(pieces, model_type)

    # ----------------------------------------------------------- normalize
    @staticmethod
    def _normalize(text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        text = " ".join(text.split())  # remove_extra_whitespaces
        text = text.replace(" ", SPACE_ESCAPE)
        if not text.startswith(SPACE_ESCAPE):
            text = SPACE_ESCAPE + text  # add_dummy_prefix
        return text

    def _usable(self, piece: str) -> bool:
        if piece not in self._scores:
            return False
        if self._types.get(piece) in (CONTROL, UNKNOWN):
            return False
        if self._allowed is not None and piece not in self._allowed:
            return False
        return True

    # -------------------------------------------------------------- unigram
    def _viterbi(self, text: str) -> List[str]:
        n = len(text)
        if n == 0:
            return []
        unk_score = self.min_score - self.unk_penalty
        best = [float("-inf")] * (n + 1)
        back: List[Tuple[int, str]] = [(0, "")] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == float("-inf"):
                continue
            # unknown single char fallback
            cand = text[i]
            score = best[i] + (self._scores.get(cand, unk_score)
                               if self._usable(cand) else unk_score)
            if score > best[i + 1]:
                best[i + 1] = score
                back[i + 1] = (i, cand)
            for j in range(i + 2, min(i + self._max_piece_len, n) + 1):
                piece = text[i:j]
                if self._usable(piece):
                    score = best[i] + self._scores[piece]
                    if score > best[j]:
                        best[j] = score
                        back[j] = (i, piece)
        out = []
        i = n
        while i > 0:
            prev, piece = back[i]
            out.append(piece)
            i = prev
        return out[::-1]

    # ------------------------------------------------------------------ bpe
    def _bpe_segment(self, text: str, dropout: float = 0.0) -> List[str]:
        symbols = list(text)
        while len(symbols) > 1:
            best_score, best_idx = None, None
            for i in range(len(symbols) - 1):
                merged = symbols[i] + symbols[i + 1]
                if self._usable(merged):
                    score = self._scores[merged]
                    if dropout and random.random() < dropout:
                        continue
                    if best_score is None or score > best_score:
                        best_score, best_idx = score, i
            if best_idx is None:
                break
            symbols[best_idx:best_idx + 2] = [symbols[best_idx] + symbols[best_idx + 1]]
        return symbols

    # ------------------------------------------------------------------ api
    def encode(self, text: str, out_type=str) -> List[str]:
        norm = self._normalize(text)
        if self.model_type == 2:
            pieces = self._bpe_segment(norm)
        else:
            pieces = self._viterbi(norm)
        if out_type is str:
            return pieces
        return [self.piece_to_id(p) for p in pieces]

    # sentencepiece-compatible aliases
    def encode_as_pieces(self, text: str) -> List[str]:
        return self.encode(text, out_type=str)

    def sample_encode_as_pieces(self, text: str, nbest_size: int = 5,
                                alpha: float = 0.1) -> List[str]:
        """Subword regularization. BPE models: merge-dropout with prob alpha;
        unigram: greedy with per-piece score noise (approximates nbest
        sampling distributionally)."""
        norm = self._normalize(text)
        if self.model_type == 2:
            return self._bpe_segment(norm, dropout=alpha)
        saved = self._scores
        try:
            noisy = {p: s + random.gauss(0.0, max(alpha, 1e-6) * abs(self.min_score))
                     for p, s in saved.items()}
            self._scores = noisy
            return self._viterbi(norm)
        finally:
            self._scores = saved

    def decode(self, pieces: List[str]) -> str:
        if isinstance(pieces, str):
            return pieces
        text = "".join(pieces)
        return text.replace(SPACE_ESCAPE, " ").strip()

    def SetVocabulary(self, itos: List[str]) -> None:  # noqa: N802
        self._allowed = set(itos)

    def piece_to_id(self, piece: str) -> int:
        for i, (p, _, _) in enumerate(self.pieces):
            if p == piece:
                return i
        return 0

    def get_piece_size(self) -> int:
        return len(self.pieces)

    def __len__(self):
        return len(self.pieces)
