# coding: utf-8
"""
Tokenizers (counterpart of joeynmt/tokenizers.py).

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


class BasicTokenizer:
    """Word/char tokenizer (joeynmt/tokenizers.py:24-186)."""

    SPACE = chr(32)  # ' '
    SPACE_ESCAPE = chr(9601)  # '▁'

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

    def pre_process(self, raw_input: str, allow_empty: bool = False) -> str:
        """joeynmt/tokenizers.py:72-102."""
        if not allow_empty:
            assert isinstance(raw_input, str) and raw_input.strip() != "", \
                "Got an empty input sentence — tokenization needs " \
                "non-empty text."
        if self.normalize:
            raw_input = remove_extra_spaces(unicode_normalize(raw_input))
        if self.pretokenizer == "moses":
            if self.normalize:
                raw_input = self.moses_normalizer.normalize(raw_input)
            raw_input = self.moses_tokenizer.tokenize(raw_input, return_str=True)
        if self.lowercase:
            raw_input = raw_input.lower()
        if not allow_empty:
            assert raw_input is not None and len(raw_input) > 0, raw_input
        return raw_input

    def __call__(self, raw_input: str, is_train: bool = False) -> List[str]:
        if raw_input is None:
            return None
        if self.level == "word":
            sequence = raw_input.split(self.SPACE)
        elif self.level == "char":
            sequence = list(raw_input.replace(self.SPACE, self.SPACE_ESCAPE))
        if is_train and self._filter_by_length(len(sequence)):
            return None
        return sequence

    def _filter_by_length(self, length: int) -> bool:
        """True if the token count falls outside the configured [min, max]
        window; a bound of <= 0 disables that side of the filter."""
        too_long = self.max_length > 0 and length > self.max_length
        too_short = self.min_length > 0 and 0 < length < self.min_length
        return too_long or too_short

    def _remove_special(self, sequence: List[str], generate_unk: bool = False):
        specials = self.specials if generate_unk else self.specials + [self.unk_token]
        valid = [token for token in sequence if token not in specials]
        if len(valid) == 0:
            valid = [self.unk_token]
        return valid

    def post_process(self, sequence: Union[List[str], str],
                     generate_unk: bool = True, cut_at_sep: bool = True) -> str:
        """Detokenize (joeynmt/tokenizers.py:134-165)."""
        if isinstance(sequence, list):
            if cut_at_sep and getattr(self, "sep_token", None):
                try:
                    sep_pos = sequence.index(self.sep_token)
                    sequence = sequence[sep_pos + 1:]
                except ValueError:
                    pass
            sequence = self._remove_special(sequence, generate_unk=generate_unk)
            if self.level == "word":
                if self.pretokenizer == "moses":
                    sequence = self.moses_detokenizer.detokenize(sequence)
                else:
                    sequence = self.SPACE.join(sequence)
            elif self.level == "char":
                sequence = "".join(sequence).replace(self.SPACE_ESCAPE, self.SPACE)
        if self.normalize:
            sequence = remove_extra_spaces(sequence)
        assert sequence is not None and len(sequence) > 0, sequence
        return sequence

    def set_vocab(self, vocab) -> None:
        """joeynmt/tokenizers.py:167-178."""
        self.unk_token = vocab.specials[vocab.unk_index]
        self.eos_token = vocab.specials[vocab.eos_index]
        self.sep_token = vocab.specials[vocab.sep_index] if vocab.sep_index else None
        specials = vocab.specials + vocab.lang_tags
        self.specials = [token for token in specials if token != self.unk_token]
        self.lang_tags = vocab.lang_tags

    def copy_cfg_file(self, model_dir: Path) -> None:
        pass

    def __repr__(self):
        return (f"{self.__class__.__name__}(level={self.level}, "
                f"lowercase={self.lowercase}, normalize={self.normalize}, "
                f"filter_by_length=({self.min_length}, {self.max_length}), "
                f"pretokenizer={self.pretokenizer})")


class SentencePieceTokenizer(BasicTokenizer):
    """SentencePiece BPE/unigram (joeynmt/tokenizers.py:189-284). Uses the C++
    sentencepiece library when available; otherwise the first-party reader."""

    def __init__(self, level: str = "bpe", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        super().__init__(level, lowercase, normalize, max_length, min_length, **kwargs)
        assert self.level == "bpe"
        self.model_file: Path = Path(kwargs["model_file"])
        assert self.model_file.is_file(), f"model file {self.model_file} not found."

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

    def __call__(self, raw_input: str, is_train: bool = False) -> List[str]:
        if raw_input is None:
            return None
        if is_train and self.alpha > 0:
            tokenized = self.spm.sample_encode_as_pieces(
                raw_input, nbest_size=self.nbest_size, alpha=self.alpha)
        else:
            tokenized = self.spm.encode(raw_input, out_type=str)
        if is_train and self._filter_by_length(len(tokenized)):
            return None
        return tokenized

    def post_process(self, sequence: Union[List[str], str],
                     generate_unk: bool = True, cut_at_sep: bool = True) -> str:
        """joeynmt/tokenizers.py:230-260."""
        if isinstance(sequence, list):
            if cut_at_sep and getattr(self, "sep_token", None):
                try:
                    sep_pos = sequence.index(self.sep_token)
                    sequence = sequence[sep_pos:]
                except ValueError:
                    pass
            sequence = self._remove_special(sequence, generate_unk=generate_unk)
            sequence = self.spm.decode(sequence)
            sequence = sequence.replace(self.SPACE_ESCAPE, self.SPACE).strip()
        if self.pretokenizer == "moses":
            sequence = self.moses_detokenizer.detokenize(sequence.split())
        if self.normalize:
            sequence = remove_extra_spaces(sequence)
        assert sequence is not None and len(sequence) > 0, sequence
        return sequence

    def set_vocab(self, vocab) -> None:
        super().set_vocab(vocab)
        self.spm.SetVocabulary(vocab._itos)  # pylint: disable=protected-access

    def copy_cfg_file(self, model_dir: Path) -> None:
        """joeynmt/tokenizers.py:267-274."""
        if (model_dir / self.model_file.name).is_file():
            logger.warning("%s already exists. Stop copying.",
                           (model_dir / self.model_file.name).as_posix())
            return
        shutil.copy2(self.model_file, (model_dir / self.model_file.name).as_posix())

    def __repr__(self):
        return (f"{self.__class__.__name__}(level={self.level}, "
                f"lowercase={self.lowercase}, normalize={self.normalize}, "
                f"filter_by_length=({self.min_length}, {self.max_length}), "
                f"pretokenizer={self.pretokenizer}, "
                f"tokenizer={self.spm.__class__.__name__}, "
                f"nbest_size={self.nbest_size}, alpha={self.alpha})")


class SubwordNMTTokenizer(BasicTokenizer):
    """subword-nmt-style BPE via the first-party implementation
    (joeynmt/tokenizers.py:287-387)."""

    def __init__(self, level: str = "bpe", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        super().__init__(level, lowercase, normalize, max_length, min_length, **kwargs)
        assert self.level == "bpe"
        codes_file = Path(kwargs["codes"])
        assert codes_file.is_file(), f"codes file {codes_file} not found."
        self.separator: str = kwargs.get("separator", "@@")
        self.dropout: float = kwargs.get("dropout", 0.0)
        self.bpe = BPE.from_file(codes_file, separator=self.separator)
        # glossary terms are isolated from segmentation (subword-nmt option)
        self.bpe.glossaries = list(kwargs.get("glossaries") or [])
        self.codes: Path = codes_file

    def __call__(self, raw_input: str, is_train: bool = False) -> List[str]:
        if raw_input is None:
            return None
        dropout = self.dropout if is_train else 0.0
        tokenized = self.bpe.process_line(raw_input, dropout).strip().split()
        if is_train and self._filter_by_length(len(tokenized)):
            return None
        return tokenized

    def post_process(self, sequence: Union[List[str], str],
                     generate_unk: bool = True, cut_at_sep: bool = True) -> str:
        """joeynmt/tokenizers.py:334-367."""
        if isinstance(sequence, list):
            if cut_at_sep and getattr(self, "sep_token", None):
                try:
                    sep_pos = sequence.index(self.sep_token)
                    sequence = sequence[sep_pos:]
                except ValueError:
                    pass
            sequence = self._remove_special(sequence, generate_unk=generate_unk)
            sequence = self.SPACE.join(sequence).replace(self.separator + self.SPACE, "")
            if sequence.endswith(self.separator):
                sequence = sequence[:-len(self.separator)]
        if self.pretokenizer == "moses":
            sequence = self.moses_detokenizer.detokenize(sequence.split())
        if self.normalize:
            sequence = remove_extra_spaces(sequence)
        assert sequence is not None and len(sequence) > 0, sequence
        return sequence

    def set_vocab(self, vocab) -> None:
        super().set_vocab(vocab)
        self.bpe.vocab = set(vocab._itos) - set(vocab.specials) - set(vocab.lang_tags)

    def copy_cfg_file(self, model_dir: Path) -> None:
        shutil.copy2(self.codes, (model_dir / self.codes.name).as_posix())

    def __repr__(self):
        return (f"{self.__class__.__name__}(level={self.level}, "
                f"lowercase={self.lowercase}, normalize={self.normalize}, "
                f"filter_by_length=({self.min_length}, {self.max_length}), "
                f"pretokenizer={self.pretokenizer}, "
                f"separator={self.separator}, dropout={self.dropout})")


class FastBPETokenizer(SubwordNMTTokenizer):
    """fastBPE files use the same codes format; served by the first-party BPE
    (joeynmt/tokenizers.py:390-430). Separator fixed to '@@', no dropout."""

    def __init__(self, level: str = "bpe", lowercase: bool = False,
                 normalize: bool = False, max_length: int = -1,
                 min_length: int = -1, **kwargs):
        kwargs.setdefault("separator", "@@")
        super().__init__(level, lowercase, normalize, max_length, min_length, **kwargs)
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
        self.specaugment: Callable = SpecAugment(**kwargs["specaugment"]) \
            if "specaugment" in kwargs else None
        self.cmvn: Callable = CMVN(**kwargs["cmvn"]) if "cmvn" in kwargs else None
        self.root_path = ""  # assigned later in dataset.__init__()

    def __call__(self, line: str, is_train: bool = False) -> np.ndarray:
        """Feature lookup -> (num_frames, num_freq) or None if filtered."""
        item = get_features(self.root_path, line)
        num_frames_, num_freq = item.shape
        assert num_freq == self.num_freq

        if self._filter_too_short_item(num_frames_):
            return None  # cannot be convolved; filtered even at test time
        if self._filter_too_long_item(num_frames_):
            if is_train:
                return None
            item = item[:self.max_length, :]  # test: truncate
            num_frames_ = item.shape[0]
            assert num_frames_ <= self.max_length

        if self.cmvn and self.cmvn.before:
            item = self.cmvn(item)
        if is_train and self.specaugment:
            item = self.specaugment(item)
        if self.cmvn and not self.cmvn.before:
            item = self.cmvn(item)
        return item

    def _filter_too_short_item(self, length: int) -> bool:
        return self.min_length > length > 0

    def _filter_too_long_item(self, length: int) -> bool:
        return length > self.max_length > 0

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

    def __init__(self, lowercase: bool = False, tokenize: str = "13a", **kwargs):
        super().__init__(level="word", lowercase=lowercase, normalize=False,
                         max_length=-1, min_length=-1)
        assert tokenize in self.ALL_TOKENIZER_TYPES, f"`{tokenize}` not supported."
        from sacrebleu.metrics.bleu import _get_tokenizer

        self.tokenizer = _get_tokenizer(tokenize)()
        self.no_punc = kwargs.get("no_punc", False)

    def __call__(self, raw_input: str, is_train: bool = False) -> List[str]:
        tokenized = self.tokenizer(raw_input)
        if self.lowercase:
            tokenized = tokenized.lower()
        if self.no_punc:
            tokenized = remove_punctuation(tokenized, space=self.SPACE)
        return tokenized.split()

    def __repr__(self):
        return (f"{self.__class__.__name__}(level={self.level}, "
                f"lowercase={self.lowercase}, tokenizer={self.tokenizer}, "
                f"no_punc={self.no_punc})")


def _build_tokenizer(cfg: Dict) -> BasicTokenizer:
    """joeynmt/tokenizers.py:556-625."""
    tokenizer = None
    tokenizer_cfg = cfg.get("tokenizer_cfg", {})

    if tokenizer_cfg.get("pretokenizer", "none") == "moses":
        tokenizer_cfg["lang"] = cfg["lang"]

    common = dict(
        level=cfg["level"],
        lowercase=cfg.get("lowercase", False),
        normalize=cfg.get("normalize", False),
        max_length=cfg.get("max_length", -1),
        min_length=cfg.get("min_length", -1),
    )
    if cfg["level"] in ["word", "char"]:
        tokenizer = BasicTokenizer(**common, **tokenizer_cfg)
    elif cfg["level"] == "bpe":
        tokenizer_type = cfg.get("tokenizer_type", cfg.get("bpe_type", "sentencepiece"))
        if tokenizer_type == "sentencepiece":
            assert "model_file" in tokenizer_cfg
            tokenizer = SentencePieceTokenizer(**common, **tokenizer_cfg)
        elif tokenizer_type == "subword-nmt":
            assert "codes" in tokenizer_cfg
            tokenizer = SubwordNMTTokenizer(**common, **tokenizer_cfg)
        elif tokenizer_type == "fastbpe":
            assert "codes" in tokenizer_cfg
            tokenizer = FastBPETokenizer(**common, **tokenizer_cfg)
        else:
            raise ConfigurationError(
                f"{tokenizer_type}: Unknown tokenizer type. "
                "Valid options: {'sentencepiece', 'subword-nmt'}.")
    elif cfg["level"] == "frame":
        tokenizer = SpeechProcessor(
            level=cfg["level"],
            num_freq=cfg["num_freq"],
            normalize=cfg.get("normalize", False),
            max_length=cfg.get("max_length", -1),
            min_length=cfg.get("min_length", -1),
            **tokenizer_cfg,
        )
    else:
        raise ConfigurationError(
            f"{cfg['level']}: Unknown tokenization level. "
            "Valid options: {'word', 'bpe', 'char'}.")
    return tokenizer


def build_tokenizer(cfg: Dict, task: str) -> Dict[str, BasicTokenizer]:
    """joeynmt/tokenizers.py:628-637."""
    src_lang = cfg["src"]["lang"] if task == "MT" else "src"
    trg_lang = cfg["trg"]["lang"] if task == "MT" else "trg"
    tokenizer = {
        src_lang: _build_tokenizer(cfg["src"]),
        trg_lang: _build_tokenizer(cfg["trg"]),
    }
    logger.info("%s Tokenizer: %s", src_lang, tokenizer[src_lang])
    logger.info("%s Tokenizer: %s", trg_lang, tokenizer[trg_lang])
    return tokenizer
