# coding: utf-8
"""
Tokenizers (behavioral counterpart of joeynmt/tokenizers.py).

Backends:
  - BasicTokenizer: word/char with lowercase/NFKC/length-filter
  - SubwordNMTTokenizer: first-party BPE (joeys2t_tpu.bpe), codes-file
    compatible with subword-nmt, supports BPE-dropout
  - SentencePieceTokenizer: uses the sentencepiece package when installed,
    otherwise falls back to the first-party unigram reader in
    joeys2t_tpu.spm (reads real .model files)
  - SpeechProcessor: fbank feature lookup + length filter/truncate + CMVN +
    SpecAugment ordering (joeynmt/tokenizers.py:433-508)
  - EvaluationTokenizer: sacrebleu tokenizers + lowercase + punctuation
    removal for WER (joeynmt/tokenizers.py:511-553)

Design: the text classes share one `__call__`/`post_process` skeleton;
subclasses plug in `_segment` (raw string -> pieces) and `_join`
(pieces -> surface text) plus two small knobs — where the `<sep>` prompt
cut lands and what post-join cleanup runs. The reference instead repeats
the whole flow per class; only the observable behavior is kept.
"""
import shutil
from pathlib import Path
from typing import Callable, Dict, List, Union

import numpy as np

from joeys2t_tpu.bpe import BPE
from joeys2t_tpu.config import ConfigurationError
from joeys2t_tpu.data.audio_io import get_features
from joeys2t_tpu.data.augmentation import CMVN, SpecAugment
from joeys2t_tpu.helpers import (
    remove_extra_spaces,
    remove_punctuation,
    unicode_normalize,
)
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_SPACE = chr(32)  # ' '
_MARKER = chr(9601)  # '▁' — sentencepiece-style space escape


class BasicTokenizer:
    """Word/char-level text tokenizer (joeynmt/tokenizers.py:24-186)."""

    SPACE = _SPACE
    SPACE_ESCAPE = _MARKER

    # whether the prompt cut keeps the <sep> token itself (subword models
    # need it to reconstruct the surface form; word/char models drop it)
    _PROMPT_KEEPS_SEP = False

    def __init__(self, level: str = "word", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        self.level = level
        self.lowercase = lowercase
        self.normalize = normalize
        self.max_length = max_length
        self.min_length = min_length

        self.pretokenizer = kwargs.get("pretokenizer", "none").lower()
        assert self.pretokenizer in ["none", "moses"], \
            "Currently, we support moses tokenizer only."
        if self.pretokenizer == "moses":
            # lazily bind the three sacremoses helpers this tokenizer uses;
            # the dependency is optional (host-side text path only)
            try:
                import sacremoses
            except ImportError as e:
                logger.error("pretokenize: 'moses' needs sacremoses (%s)", e)
                raise ImportError from e
            self.lang = kwargs.get("lang", "en")
            self.moses_tokenizer = sacremoses.MosesTokenizer(lang=self.lang)
            self.moses_detokenizer = sacremoses.MosesDetokenizer(lang=self.lang)
            if self.normalize:
                self.moses_normalizer = sacremoses.MosesPunctNormalizer()

    # ---------------------------------------------------------- raw -> clean
    def pre_process(self, raw_input: str, allow_empty: bool = False) -> str:
        """Clean one raw line: NFKC/space normalization, optional moses
        pretokenization, optional lowercasing — in that order (the order is
        the contract, joeynmt/tokenizers.py:72-102)."""
        if not allow_empty:
            assert isinstance(raw_input, str) and raw_input.strip() != "", \
                "Got an empty input sentence — tokenization needs " \
                "non-empty text."
        text = raw_input
        if self.normalize:
            text = remove_extra_spaces(unicode_normalize(text))
        if self.pretokenizer == "moses":
            if self.normalize:
                text = self.moses_normalizer.normalize(text)
            text = self.moses_tokenizer.tokenize(text, return_str=True)
        if self.lowercase:
            text = text.lower()
        if not allow_empty:
            assert text is not None and len(text) > 0, text
        return text

    # -------------------------------------------------------- clean -> pieces
    def __call__(self, raw_input: str, is_train: bool = False) -> List[str]:
        if raw_input is None:
            return None
        pieces = self._segment(raw_input, is_train)
        if is_train and not self._length_ok(len(pieces)):
            return None
        return pieces

    def _segment(self, text: str, is_train: bool) -> List[str]:
        del is_train  # word/char segmentation is deterministic
        if self.level == "char":
            return list(text.replace(_SPACE, _MARKER))
        return text.split(_SPACE)

    def _length_ok(self, n: int) -> bool:
        """Train-time filter window; a bound <= 0 disables that side."""
        if self.max_length > 0 and n > self.max_length:
            return False
        if self.min_length > 0 and 0 < n < self.min_length:
            return False
        return True

    # -------------------------------------------------------- pieces -> text
    def post_process(self, sequence: Union[List[str], str],
                     generate_unk: bool = True, cut_at_sep: bool = True) -> str:
        """Detokenize decoder output: drop the forced prompt prefix, strip
        special tokens, rejoin to surface text."""
        if isinstance(sequence, list):
            if cut_at_sep:
                sequence = self._cut_prompt(sequence)
            sequence = self._drop_specials(sequence, generate_unk)
            sequence = self._join(sequence)
        sequence = self._post_join(sequence)
        if self.normalize:
            sequence = remove_extra_spaces(sequence)
        assert sequence is not None and len(sequence) > 0, sequence
        return sequence

    def _cut_prompt(self, pieces: List[str]) -> List[str]:
        sep = getattr(self, "sep_token", None)
        if sep and sep in pieces:
            start = pieces.index(sep) + (0 if self._PROMPT_KEEPS_SEP else 1)
            return pieces[start:]
        return pieces

    def _drop_specials(self, pieces: List[str], generate_unk: bool):
        banned = set(self.specials)
        if not generate_unk:
            banned.add(self.unk_token)
        kept = [p for p in pieces if p not in banned]
        return kept if kept else [self.unk_token]

    def _join(self, pieces: List[str]) -> str:
        if self.level == "char":
            return "".join(pieces).replace(_MARKER, _SPACE)
        if self.pretokenizer == "moses":
            return self.moses_detokenizer.detokenize(pieces)
        return _SPACE.join(pieces)

    def _post_join(self, text: str) -> str:
        return text

    # ------------------------------------------------------------- plumbing
    def set_vocab(self, vocab) -> None:
        """Bind the special-token surface forms once the vocab exists
        (joeynmt/tokenizers.py:167-178)."""
        self.unk_token = vocab.specials[vocab.unk_index]
        self.eos_token = vocab.specials[vocab.eos_index]
        self.sep_token = (vocab.specials[vocab.sep_index]
                          if vocab.sep_index else None)
        reserved = vocab.specials + vocab.lang_tags
        self.specials = [t for t in reserved if t != self.unk_token]
        self.lang_tags = vocab.lang_tags

    def copy_cfg_file(self, model_dir: Path) -> None:
        pass

    def _describe(self) -> str:
        return (f"level={self.level}, lowercase={self.lowercase}, "
                f"normalize={self.normalize}, "
                f"filter_by_length=({self.min_length}, {self.max_length}), "
                f"pretokenizer={self.pretokenizer}")

    def __repr__(self):
        return f"{self.__class__.__name__}({self._describe()})"


class SentencePieceTokenizer(BasicTokenizer):
    """SentencePiece BPE/unigram (joeynmt/tokenizers.py:189-284). Uses the C++
    sentencepiece library when available; otherwise the first-party reader."""

    _PROMPT_KEEPS_SEP = True

    def __init__(self, level: str = "bpe", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        super().__init__(level, lowercase, normalize, max_length, min_length,
                         **kwargs)
        assert self.level == "bpe"
        self.model_file = Path(kwargs["model_file"])
        assert self.model_file.is_file(), \
            f"model file {self.model_file} not found."

        try:
            import sentencepiece as sp
            self.spm = sp.SentencePieceProcessor()
            self.spm.load(kwargs["model_file"])
        except (ImportError, AttributeError):
            # AttributeError covers a stubbed/broken sentencepiece module
            from joeys2t_tpu.spm import MiniSentencePiece
            self.spm = MiniSentencePiece.from_file(self.model_file)

        self.nbest_size: int = kwargs.get("nbest_size", 5)
        self.alpha: float = kwargs.get("alpha", 0.0)

    def _segment(self, text: str, is_train: bool) -> List[str]:
        if is_train and self.alpha > 0:  # BPE-dropout via segment sampling
            return self.spm.sample_encode_as_pieces(
                text, nbest_size=self.nbest_size, alpha=self.alpha)
        return self.spm.encode(text, out_type=str)

    def _join(self, pieces: List[str]) -> str:
        return self.spm.decode(pieces).replace(_MARKER, _SPACE).strip()

    def _post_join(self, text: str) -> str:
        if self.pretokenizer == "moses":
            text = self.moses_detokenizer.detokenize(text.split())
        return text

    def set_vocab(self, vocab) -> None:
        super().set_vocab(vocab)
        self.spm.SetVocabulary(vocab._tokens)  # pylint: disable=protected-access

    def copy_cfg_file(self, model_dir: Path) -> None:
        """Persist the spm model next to the config
        (joeynmt/tokenizers.py:267-274)."""
        dest = model_dir / self.model_file.name
        if dest.is_file():
            logger.warning("%s already exists. Stop copying.", dest.as_posix())
            return
        shutil.copy2(self.model_file, dest.as_posix())

    def __repr__(self):
        return (f"{self.__class__.__name__}({self._describe()}, "
                f"tokenizer={self.spm.__class__.__name__}, "
                f"nbest_size={self.nbest_size}, alpha={self.alpha})")


class SubwordNMTTokenizer(BasicTokenizer):
    """subword-nmt-style BPE via the first-party implementation
    (joeynmt/tokenizers.py:287-387)."""

    _PROMPT_KEEPS_SEP = True

    def __init__(self, level: str = "bpe", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        super().__init__(level, lowercase, normalize, max_length, min_length,
                         **kwargs)
        assert self.level == "bpe"
        codes_file = Path(kwargs["codes"])
        assert codes_file.is_file(), f"codes file {codes_file} not found."
        self.separator: str = kwargs.get("separator", "@@")
        self.dropout: float = kwargs.get("dropout", 0.0)
        self.bpe = BPE.from_file(codes_file, separator=self.separator)
        # glossary terms are isolated from segmentation (subword-nmt option)
        self.bpe.glossaries = list(kwargs.get("glossaries") or [])
        self.codes: Path = codes_file

    def _segment(self, text: str, is_train: bool) -> List[str]:
        dropout = self.dropout if is_train else 0.0
        return self.bpe.process_line(text, dropout).strip().split()

    def _join(self, pieces: List[str]) -> str:
        text = _SPACE.join(pieces).replace(self.separator + _SPACE, "")
        if text.endswith(self.separator):
            text = text[:-len(self.separator)]
        return text

    def _post_join(self, text: str) -> str:
        if self.pretokenizer == "moses":
            text = self.moses_detokenizer.detokenize(text.split())
        return text

    def set_vocab(self, vocab) -> None:
        super().set_vocab(vocab)
        self.bpe.vocab = (set(vocab._tokens) - set(vocab.specials)  # pylint: disable=protected-access
                          - set(vocab.lang_tags))

    def copy_cfg_file(self, model_dir: Path) -> None:
        shutil.copy2(self.codes, (model_dir / self.codes.name).as_posix())

    def __repr__(self):
        return (f"{self.__class__.__name__}({self._describe()}, "
                f"separator={self.separator}, dropout={self.dropout})")


class FastBPETokenizer(SubwordNMTTokenizer):
    """fastBPE files use the same codes format; served by the first-party BPE
    (joeynmt/tokenizers.py:390-430). Separator fixed to '@@', no dropout."""

    def __init__(self, level: str = "bpe", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        kwargs.setdefault("separator", "@@")
        super().__init__(level, lowercase, normalize, max_length, min_length,
                         **kwargs)
        self.dropout = 0.0


class SpeechProcessor:
    """Fbank feature lookup + filters + CMVN/SpecAugment ordering
    (joeynmt/tokenizers.py:433-508)."""

    def __init__(self, level: str = "frame", num_freq: int = 80,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        self.level = level
        self.num_freq = num_freq
        self.normalize = normalize
        self.max_length = max_length
        self.min_length = min_length
        self.specaugment: Callable = (SpecAugment(**kwargs["specaugment"])
                                      if "specaugment" in kwargs else None)
        self.cmvn: Callable = CMVN(**kwargs["cmvn"]) if "cmvn" in kwargs else None
        self.root_path = ""  # assigned later in dataset.__init__()

    def __call__(self, line: str, is_train: bool = False) -> np.ndarray:
        """Feature lookup -> (num_frames, num_freq) or None if filtered.

        Too-short utterances are dropped even at test time (they cannot be
        convolved by the subsampler); too-long ones are dropped in training
        and truncated in inference. CMVN may run before or after SpecAugment
        per its `before` flag."""
        feats = get_features(self.root_path, line)
        n_frames = feats.shape[0]
        assert feats.shape[1] == self.num_freq

        if 0 < n_frames < self.min_length:
            return None
        if self.max_length > 0 and n_frames > self.max_length:
            if is_train:
                return None
            feats = feats[:self.max_length, :]

        if self.cmvn and self.cmvn.before:
            feats = self.cmvn(feats)
        if is_train and self.specaugment:
            feats = self.specaugment(feats)
        if self.cmvn and not self.cmvn.before:
            feats = self.cmvn(feats)
        return feats

    def set_vocab(self, vocab) -> None:
        pass

    def copy_cfg_file(self, model_dir: Path) -> None:
        pass

    def __repr__(self):
        return (f"{self.__class__.__name__}("
                f"level={self.level}, normalize={self.normalize}, "
                f"filter_by_length=({self.min_length}, {self.max_length}), "
                f"cmvn={self.cmvn}, specaugment={self.specaugment})")


class EvaluationTokenizer(BasicTokenizer):
    """sacrebleu tokenization + lowercase + punctuation removal, used for WER
    (joeynmt/tokenizers.py:511-553)."""

    ALL_TOKENIZER_TYPES = ["none", "13a", "intl", "zh", "ja-mecab"]

    def __init__(self, lowercase: bool = False, tokenize: str = "13a",
                 **kwargs):
        super().__init__(level="word", lowercase=lowercase, normalize=False,
                         max_length=-1, min_length=-1)
        assert tokenize in self.ALL_TOKENIZER_TYPES, \
            f"`{tokenize}` not supported."
        from sacrebleu.metrics.bleu import _get_tokenizer

        self.tokenizer = _get_tokenizer(tokenize)()
        self.no_punc = kwargs.get("no_punc", False)

    def __call__(self, raw_input: str, is_train: bool = False) -> List[str]:
        text = self.tokenizer(raw_input)
        if self.lowercase:
            text = text.lower()
        if self.no_punc:
            text = remove_punctuation(text, space=_SPACE)
        return text.split()

    def __repr__(self):
        return (f"{self.__class__.__name__}(level={self.level}, "
                f"lowercase={self.lowercase}, tokenizer={self.tokenizer}, "
                f"no_punc={self.no_punc})")


_BPE_BACKENDS = {
    "sentencepiece": (SentencePieceTokenizer, "model_file"),
    "subword-nmt": (SubwordNMTTokenizer, "codes"),
    "fastbpe": (FastBPETokenizer, "codes"),
}


def _build_tokenizer(cfg: Dict) -> BasicTokenizer:
    """One side's tokenizer from its data-config section
    (joeynmt/tokenizers.py:556-625)."""
    level = cfg["level"]
    extra = cfg.get("tokenizer_cfg", {})
    if extra.get("pretokenizer", "none") == "moses":
        extra["lang"] = cfg["lang"]
    common = dict(
        level=level,
        lowercase=cfg.get("lowercase", False),
        normalize=cfg.get("normalize", False),
        max_length=cfg.get("max_length", -1),
        min_length=cfg.get("min_length", -1),
    )

    if level in ("word", "char"):
        return BasicTokenizer(**common, **extra)
    if level == "bpe":
        backend = cfg.get("tokenizer_type", cfg.get("bpe_type", "sentencepiece"))
        if backend not in _BPE_BACKENDS:
            raise ConfigurationError(
                f"{backend}: Unknown tokenizer type. "
                "Valid options: {'sentencepiece', 'subword-nmt'}.")
        cls, required_key = _BPE_BACKENDS[backend]
        assert required_key in extra
        return cls(**common, **extra)
    if level == "frame":
        return SpeechProcessor(num_freq=cfg["num_freq"], **common, **extra)
    raise ConfigurationError(
        f"{level}: Unknown tokenization level. "
        "Valid options: {'word', 'bpe', 'char'}.")


def build_tokenizer(cfg: Dict, task: str) -> Dict[str, BasicTokenizer]:
    """Both sides keyed by language (joeynmt/tokenizers.py:628-637)."""
    src_lang = cfg["src"]["lang"] if task == "MT" else "src"
    trg_lang = cfg["trg"]["lang"] if task == "MT" else "trg"
    tokenizer = {
        src_lang: _build_tokenizer(cfg["src"]),
        trg_lang: _build_tokenizer(cfg["trg"]),
    }
    logger.info("%s Tokenizer: %s", src_lang, tokenizer[src_lang])
    logger.info("%s Tokenizer: %s", trg_lang, tokenizer[trg_lang])
    return tokenizer
