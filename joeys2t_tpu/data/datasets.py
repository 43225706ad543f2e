# coding: utf-8
"""
Datasets (counterpart of joeynmt/datasets.py), torch-free.

Same dataset taxonomy as the reference: Plaintext / Tsv / Speech (tsv with
audio feature paths) / Stream / SpeechStream / Huggingface. ``make_iter``
returns a plain Python iterator of joeys2t_tpu Batch objects with optional
background-thread prefetch (the reference uses torch DataLoader workers,
joeynmt/datasets.py:313-323; here host tokenization/feature IO overlaps with
device steps via a bounded queue).
"""
import queue
import threading
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from joeys2t_tpu.config import ConfigurationError
from joeys2t_tpu.data.batch import Batch
from joeys2t_tpu.data.samplers import (
    RandomSubsetSampler,
    SentenceBatchSampler,
    ShardedSubsetSampler,
    TokenBatchSampler,
)
from joeys2t_tpu.helpers import read_list_from_file
from joeys2t_tpu.tokenizers import BasicTokenizer, SpeechProcessor
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _multi_process() -> bool:
    try:
        import jax

        return jax.process_count() > 1
    except Exception:  # pragma: no cover
        return False


def _strip_tag_escape(pieces, tok):
    """Drop a stray leading space-escape ('▁') when it precedes a language
    tag — subword models emit it when a tag opens the sequence."""
    if (pieces is not None and tok is not None and len(pieces) > 1
            and pieces[0] == tok.SPACE_ESCAPE and pieces[1] in tok.lang_tags):
        return pieces[1:]
    return pieces


class BaseDataset:
    """Base dataset: holds tokenizers + sequence encoders, subset indices,
    prompt concatenation (behavioral spec: joeynmt/datasets.py:28-335)."""

    # pylint: disable=too-many-instance-attributes

    def __init__(
        self,
        path: str,
        src_lang: str,
        trg_lang: str,
        split: str = "train",
        has_trg: bool = False,
        has_prompt: Dict[str, bool] = None,
        tokenizer: Dict[str, BasicTokenizer] = None,
        sequence_encoder: Dict[str, Callable] = None,
        random_subset: int = -1,
        task: str = "MT",
    ):
        self.path, self.split, self.task = path, split, task
        self.src_lang, self.trg_lang = src_lang, trg_lang
        self.has_trg = has_trg
        assert self.has_trg or split != "train"

        self.tokenizer = tokenizer
        self.sequence_encoder = sequence_encoder
        self.has_prompt = has_prompt
        # every per-language table must cover the languages this dataset
        # will query (src always; trg only when references exist)
        langs = (src_lang, trg_lang) if has_trg else (src_lang,)
        for table in (self.tokenizer, self.sequence_encoder, self.has_prompt):
            missing = [l for l in langs if l not in table]
            assert not missing, (missing, table)

        self.random_subset = random_subset
        # `indices` drives every sampler; subsampling replaces it with a
        # sorted subset (samplers.RandomSubsetSampler) — order randomness
        # lives in the samplers, never here
        self.indices = None
        self.seed = 1

    def reset_indices(self, random_subset: int = None):
        n = len(self)
        self.indices = list(range(n))
        if random_subset is not None:
            self.random_subset = random_subset
        if self.random_subset > 0:
            assert self.split != "test" and self.random_subset < n, \
                (f"random_subset={self.random_subset} needs a train/dev set "
                 f"with more than that many examples (got {n}).")

    def load_data(self, path: Path, **kwargs) -> Any:
        raise NotImplementedError

    def get_item(self, idx: int, lang: str, is_train: bool = None) -> List[str]:
        """Tokenize one item; prompt concat `prompt + <sep> + item` with
        truncation (joeynmt/datasets.py:105-140)."""
        if is_train is None:
            is_train = self.split == "train"
        tok = self.tokenizer[lang]
        line, prompt = self.lookup_item(idx, lang)
        item = _strip_tag_escape(tok(line, is_train=is_train), tok)

        if self.has_prompt[lang] and prompt is not None:
            # splice `prompt <sep> item`, truncating the PROMPT (keeping its
            # tail, and a leading language tag if present) so the combined
            # sequence fits the tokenizer's max_length
            # (joeynmt/datasets.py:105-140 semantics)
            prompt = _strip_tag_escape(tok(prompt, is_train=False), tok)
            item = item or []
            limit = tok.max_length
            combined_len = len(prompt) + 1 + len(item)  # +1 for <sep>
            if 0 < limit < combined_len:
                keep = limit - 1 - len(item)  # prompt tokens that still fit
                # negative-index slice deliberately mirrors the reference's
                # edge behavior: keep <= 0 degrades to keeping the full
                # prompt tail rather than raising
                if prompt[0] in tok.lang_tags:
                    prompt = [prompt[0]] + prompt[-(keep - 1):]
                else:
                    prompt = prompt[-keep:]
            item = prompt + [tok.sep_token] + item
        return item

    def lookup_item(self, idx: int, lang: str) -> Tuple[str, str]:
        raise NotImplementedError

    def _src_example(self, idx: int):
        """Hook: the source side of one example (speech datasets bypass
        get_item and run the SpeechProcessor directly)."""
        return self.get_item(idx=idx, lang=self.src_lang)

    def __getitem__(self, idx: Union[int, str]) -> Tuple[int, List[str], List[str]]:
        if idx > len(self):
            raise KeyError
        src = self._src_example(idx)
        trg = None
        # a filtered-out target drops the whole pair (src=None marks it)
        if self.has_trg or self.has_prompt[self.trg_lang]:
            trg = self.get_item(idx=idx, lang=self.trg_lang)
            if trg is None:
                src = None
        return idx, src, trg

    def get_list(self, lang: str, tokenized: bool = False,
                 subsampled: bool = True) -> Union[List[str], List[List[str]]]:
        raise NotImplementedError

    @property
    def src(self) -> List[str]:
        return self.get_list(self.src_lang)

    @property
    def trg(self) -> List[str]:
        if not self.has_trg:
            return []
        return self.get_list(self.trg_lang)

    def collate_fn(self, batch: List[Tuple], pad_index: int,
                   eos_index: int) -> Batch:
        """joeynmt/datasets.py:186-242."""
        idx, src_list, trg_list = zip(*batch)
        assert len(batch) == len(src_list) == len(trg_list)
        assert all(s is not None for s in src_list), src_list
        src, src_length, src_prompt_mask = self.sequence_encoder[self.src_lang](src_list)

        if self.has_trg or self.has_prompt[self.trg_lang]:
            if self.has_trg:
                assert all(t is not None for t in trg_list), trg_list
            trg, trg_length, trg_prompt_mask = self.sequence_encoder[self.trg_lang](
                trg_list, bos=True, eos=self.has_trg)  # no EOS if not has_trg
        else:
            assert all(t is None for t in trg_list)
            trg, trg_length, trg_prompt_mask = None, None, None

        return Batch(
            src=(np.asarray(src, dtype=np.int32) if self.task == "MT"
                 else np.asarray(src, dtype=np.float32)),
            src_length=np.asarray(src_length, dtype=np.int32),
            src_prompt_mask=(np.asarray(src_prompt_mask, dtype=np.int32)
                             if self.has_prompt[self.src_lang] else None),
            trg=np.asarray(trg, dtype=np.int32) if trg is not None else None,
            trg_length=(np.asarray(trg_length, dtype=np.int32)
                        if trg_length is not None else None),
            trg_prompt_mask=(np.asarray(trg_prompt_mask, dtype=np.int32)
                             if self.has_prompt[self.trg_lang] else None),
            indices=np.asarray(idx, dtype=np.int32),
            pad_index=pad_index,
            eos_index=eos_index,
            is_train=self.split == "train",
            task=self.task,
        )

    def make_iter(
        self,
        batch_size: int,
        batch_type: str = "sentence",
        seed: int = 42,
        shuffle: bool = False,
        num_workers: int = 0,
        pad_index: int = 1,
        eos_index: int = 3,
        generator_state=None,
        return_sampler: bool = False,
    ):
        """Build the (sampler, batch iterator) pipeline
        (joeynmt/datasets.py:244-323). ``num_workers > 0`` enables a
        background prefetch thread."""
        shuffle = shuffle and self.split == "train"

        # Multi-host: training data shards rank-strided across processes
        # (joeynmt/helpers_for_ddp.py:244-343 semantics). Evaluation batches
        # are produced identically on every process (deterministic sampler,
        # shuffle=False) — the DECODE work is then sharded round-robin over
        # batches inside predict() and gathered with order restoration
        # (prediction._eval_shard_info / _merge_sharded_eval), matching
        # joeynmt/prediction.py:220-257 without shape reconciliation.
        if _multi_process() and self.split == "train":
            sampler = ShardedSubsetSampler(self, shuffle=shuffle, seed=seed)
        else:
            sampler = RandomSubsetSampler(self, shuffle=shuffle, seed=seed)

        if batch_type == "sentence":
            batch_sampler = SentenceBatchSampler(sampler, batch_size=batch_size,
                                                 drop_last=False, seed=seed)
        elif batch_type == "token":
            batch_sampler = TokenBatchSampler(sampler, batch_size=batch_size,
                                              drop_last=False, seed=seed)
        else:
            raise ConfigurationError(f"{batch_type}: Unknown batch type")

        batch_sampler.set_seed(seed)
        if generator_state is not None:
            batch_sampler.set_state(generator_state)

        assert self.sequence_encoder[self.src_lang] is not None
        if self.has_trg:
            assert self.sequence_encoder[self.trg_lang] is not None

        collate = partial(self.collate_fn, eos_index=eos_index, pad_index=pad_index)
        iterator = _BatchIterator(self, batch_sampler, collate, num_workers)
        if return_sampler:
            return iterator, batch_sampler
        return iterator

    def __len__(self) -> int:
        raise NotImplementedError

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(split={self.split}, len={len(self)}, "
                f'src_lang="{self.src_lang}", trg_lang="{self.trg_lang}", '
                f"has_trg={self.has_trg}, random_subset={self.random_subset}, "
                f"has_src_prompt={self.has_prompt[self.src_lang]}, "
                f"has_trg_prompt={self.has_prompt[self.trg_lang]})")


class _BatchIterator:
    """Re-iterable batch pipeline: each ``__iter__`` replays the (seeded)
    batch sampler, so epoch loops can traverse it repeatedly (torch DataLoader
    semantics). ``num_workers > 0`` adds a background prefetch thread."""

    def __init__(self, dataset, batch_sampler, collate, num_workers: int):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate = collate
        self.num_workers = num_workers

    def __iter__(self) -> Iterator[Batch]:
        def gen():
            for index_batch in self.batch_sampler:
                yield self.collate([self.dataset[i] for i in index_batch])

        if self.num_workers > 0:
            return _prefetch(gen(), self.num_workers)
        return gen()


def _prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Bounded background-thread prefetch."""
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    _sentinel = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            break
        yield item


class PlaintextDataset(BaseDataset):
    """One sentence per line text pairs (joeynmt/datasets.py:338-430)."""

    def __init__(self, path, src_lang, trg_lang, split="train", has_trg=True,
                 has_prompt=None, tokenizer=None, sequence_encoder=None,
                 random_subset=-1, task="MT", **kwargs):
        super().__init__(path=path, src_lang=src_lang, trg_lang=trg_lang, split=split,
                         has_trg=has_trg, has_prompt=has_prompt, tokenizer=tokenizer,
                         sequence_encoder=sequence_encoder,
                         random_subset=random_subset, task=task)
        self.data = self.load_data(path, **kwargs)
        self.reset_indices()

    def load_data(self, path: str, **kwargs) -> Any:
        # one file per side: <path>.<lang>, cleaned through pre_process
        base = Path(path)
        sides = [self.src_lang] + ([self.trg_lang] if self.has_trg else [])
        data, raw_counts = {}, []
        for lang in sides:
            side_file = base.with_suffix(f"{base.suffix}.{lang}")
            assert side_file.is_file(), f"{side_file} not found. Abort."
            lines = read_list_from_file(side_file)
            raw_counts.append(len(lines))
            tok = self.tokenizer[lang]
            if tok is not None:
                lines = [tok.pre_process(s) for s in lines if len(s) > 0]
            data[lang] = lines
        assert len(set(raw_counts)) == 1, "src/trg line counts differ"
        return data

    def lookup_item(self, idx: int, lang: str) -> Tuple[str, str]:
        line = self.data[lang][idx]
        prompt = (self.data[f"{lang}_prompt"][idx]
                  if f"{lang}_prompt" in self.data else None)
        return line, prompt

    def get_list(self, lang, tokenized=False, subsampled=True):
        rows = self.indices if subsampled else range(len(self))
        raw = [self.lookup_item(i, lang)[0] for i in rows]
        if not tokenized:
            return raw
        tok = self.tokenizer[lang]
        return [tok(line, is_train=False) for line in raw]

    def __len__(self) -> int:
        return len(self.data[self.src_lang])


class TsvDataset(BaseDataset):
    """TSV with `src_lang`/`trg_lang` header columns
    (joeynmt/datasets.py:433-539)."""

    def __init__(self, path, src_lang, trg_lang, split="train", has_trg=True,
                 has_prompt=None, tokenizer=None, sequence_encoder=None,
                 random_subset=-1, task="MT", **kwargs):
        super().__init__(path=path, src_lang=src_lang, trg_lang=trg_lang, split=split,
                         has_trg=has_trg, has_prompt=has_prompt, tokenizer=tokenizer,
                         sequence_encoder=sequence_encoder,
                         random_subset=random_subset, task=task)
        self.df = self.load_data(path, **kwargs)
        self.reset_indices()

    def load_data(self, path: str, **kwargs) -> Any:
        base = Path(path)
        tsv = base.with_suffix(f"{base.suffix}.tsv")
        assert tsv.is_file(), f"{tsv} not found. Abort."

        df = pd.read_csv(tsv.as_posix(), sep="\t", header=0,
                         encoding="utf-8", index_col=None)
        df = df.dropna().reset_index()

        assert self.src_lang in df.columns, \
            f"{tsv}: missing the {self.src_lang} column"
        # a reference-less tsv is only legal for test-time decoding
        if self.trg_lang not in df.columns:
            assert self.split == "test", \
                f"{tsv}: {self.trg_lang} column required outside test"
            self.has_trg = False

        sides = [self.src_lang] + ([self.trg_lang] if self.has_trg else [])
        for lang in sides:
            df[lang] = df[lang].apply(self.tokenizer[lang].pre_process)
        # optional "<lang>_prompt" columns switch on prompting per side
        for lang in (self.src_lang, self.trg_lang):
            col = f"{lang}_prompt"
            if col in df.columns:
                self.has_prompt[lang] = True
                clean = partial(self.tokenizer[lang].pre_process,
                                allow_empty=True)
                df[col] = df[col].apply(clean)
        return df

    def lookup_item(self, idx: int, lang: str) -> Tuple[str, str]:
        row = self.df.iloc[idx]
        line = row[lang]
        prompt = row.get(f"{lang}_prompt", None)
        return line, prompt

    def get_list(self, lang, tokenized=False, subsampled=True):
        indices = self.indices if subsampled else range(len(self))
        df = self.df.iloc[list(indices)]
        return (df[lang].apply(self.tokenizer[lang]).to_list()
                if tokenized else df[lang].to_list())

    def __len__(self) -> int:
        return len(self.df)


class SpeechDataset(TsvDataset):
    """Speech TSV: `id|src|n_frames|trg` manifest; src column holds feature
    paths resolved by the SpeechProcessor (joeynmt/datasets.py:542-660)."""

    def __init__(self, path, src_lang="src", trg_lang="trg", split="train",
                 has_trg=True, has_prompt=None, tokenizer=None,
                 sequence_encoder=None, random_subset=-1, task="S2T", **kwargs):
        BaseDataset.__init__(self, path=path, src_lang=src_lang, trg_lang=trg_lang,
                             split=split, has_trg=has_trg, has_prompt=has_prompt,
                             tokenizer=tokenizer, sequence_encoder=sequence_encoder,
                             random_subset=random_subset, task=task)
        self.df = self.load_data(path, **kwargs)
        assert isinstance(self.tokenizer["src"], SpeechProcessor)
        self.tokenizer["src"].root_path = Path(path).parent
        self.reset_indices()

    def load_data(self, path: str, **kwargs) -> Any:
        path = Path(path)
        file_path = path.with_suffix(f"{path.suffix}.tsv")
        assert file_path.is_file(), f"{file_path} not found. Abort."

        manifest_types = {"id": str, "src": str, "trg": str, "n_frames": int}
        df = pd.read_csv(file_path.as_posix(), sep="\t", header=0,
                         encoding="utf-8", escapechar="\\", quoting=3,
                         na_filter=False, dtype=manifest_types)

        # drop rows too short for the conv subsampler (cannot be convolved)
        # and rows with blank fields, in one NaN sweep
        min_frames = int(self.tokenizer["src"].min_length)
        df["n_frames"] = df[df["n_frames"] > min_frames]["n_frames"]
        df = df.replace(r"^\s*$", float("nan"), regex=True).dropna()

        assert "src" in df.columns, f"{file_path}: missing the src column"
        # column-driven switches: audio manifests never carry a src prompt,
        # and a manifest without transcripts is only legal at test time
        self.has_prompt["src"] = False
        if "trg" not in df.columns:
            assert self.split == "test", \
                f"{file_path}: trg column required outside test"
            self.has_trg = False
        clean_trg = self.tokenizer["trg"].pre_process
        if self.has_trg:
            df["trg"] = df["trg"].map(clean_trg)
        if "trg_prompt" in df.columns:
            self.has_prompt["trg"] = True
            df["trg_prompt"] = df["trg_prompt"].map(
                partial(clean_trg, allow_empty=True))
        return df

    def _src_example(self, idx: int):
        # feature path -> (T, 80) fbank array via the SpeechProcessor
        # (filters/truncation/CMVN/SpecAugment applied there)
        feature_path, _ = self.lookup_item(idx=idx, lang="src")
        return self.tokenizer["src"](feature_path,
                                     is_train=self.split == "train")

    @property
    def src(self) -> List[str]:
        return self.df["src"]


class StreamDataset(BaseDataset):
    """Interactive stream input for translate mode
    (joeynmt/datasets.py:663-789)."""

    def __init__(self, path, src_lang, trg_lang, split="test", has_trg=False,
                 has_prompt=None, tokenizer=None, sequence_encoder=None,
                 random_subset=-1, task="MT", **kwargs):
        super().__init__(path=path, src_lang=src_lang, trg_lang=trg_lang, split=split,
                         has_trg=has_trg, has_prompt=has_prompt, tokenizer=tokenizer,
                         sequence_encoder=sequence_encoder,
                         random_subset=random_subset, task=task)
        self.cache = []

    def _split_at_sep(self, line: str, prompt: str, lang: str, sep_token: str):
        """An inline "<prompt> <sep> <text>" input is split into its two
        parts unless an explicit prompt was already given
        (joeynmt/datasets.py:701-722 semantics)."""
        inline_prompt = (prompt is None and sep_token is not None
                         and line is not None and sep_token in line)
        if inline_prompt:
            line, prompt = line.split(sep_token)
        clean = self.tokenizer[lang].pre_process
        line = clean(line, allow_empty=False) if line else line
        if prompt:
            prompt = clean(prompt, allow_empty=True)
            self.has_prompt[lang] = True
        return line, prompt

    def set_item(self, src_line: str, trg_line: Optional[str] = None,
                 src_prompt: Optional[str] = None,
                 trg_prompt: Optional[str] = None) -> None:
        assert isinstance(src_line, str) and src_line.strip() != "", \
            "Got an empty input sentence — tokenization needs " \
            "non-empty text."
        src_line, src_prompt = self._split_at_sep(
            src_line, src_prompt, self.src_lang,
            getattr(self.tokenizer[self.src_lang], "sep_token", None))
        assert src_line is not None
        trg_line, trg_prompt = self._split_at_sep(
            trg_line, trg_prompt, self.trg_lang,
            getattr(self.tokenizer[self.trg_lang], "sep_token", None))
        if self.has_trg:
            assert trg_line is not None
        self.cache.append((src_line, trg_line, src_prompt, trg_prompt))
        self.reset_indices()

    def lookup_item(self, idx: int, lang: str) -> Tuple[str, str]:
        assert lang in [self.src_lang, self.trg_lang]
        src_line, trg_line, src_prompt, trg_prompt = self.cache[idx]
        if lang == self.src_lang:
            return src_line, src_prompt
        return trg_line, trg_prompt

    def reset_cache(self) -> None:
        self.cache = []
        self.reset_indices()

    def __len__(self) -> int:
        return len(self.cache)


class SpeechStreamDataset(StreamDataset):
    """Audio file path stream input (joeynmt/datasets.py:792-863)."""

    def __init__(self, path, src_lang="src", trg_lang="trg", split="test",
                 has_trg=False, has_prompt=None, tokenizer=None,
                 sequence_encoder=None, random_subset=-1, task="S2T", **kwargs):
        super().__init__(path=path, src_lang=src_lang, trg_lang=trg_lang, split=split,
                         has_trg=has_trg, has_prompt=has_prompt, tokenizer=tokenizer,
                         sequence_encoder=sequence_encoder,
                         random_subset=random_subset, task=task)
        self.has_prompt["src"] = False
        assert isinstance(self.tokenizer["src"], SpeechProcessor)
        self.tokenizer["src"].root_path = Path("")

    def set_item(self, src_line: str, trg_line: Optional[str] = None,
                 src_prompt: Optional[str] = None,
                 trg_prompt: Optional[str] = None) -> None:
        assert Path(src_line).is_file(), \
            f"{src_line} not found. Please provide the absolute path to the file!"
        if trg_line is not None or trg_prompt is not None:
            trg_line, trg_prompt = self._split_at_sep(
                trg_line, trg_prompt, "trg",
                getattr(self.tokenizer["trg"], "sep_token", None))
        self.cache.append((src_line, trg_line, None, trg_prompt))
        self.reset_indices()

    def _src_example(self, idx: int):
        # audio file path -> features; never train mode (stream = inference)
        wav_path, _ = self.lookup_item(idx=idx, lang="src")
        return self.tokenizer["src"](wav_path, is_train=False)


class BaseHuggingfaceDataset(BaseDataset):
    """HF datasets wrapper (joeynmt/datasets.py:866-969)."""

    COLUMN_NAME = "sentence"

    def __init__(self, path, src_lang, trg_lang, has_trg=True, has_prompt=None,
                 tokenizer=None, sequence_encoder=None, random_subset=-1,
                 task="MT", **kwargs):
        super().__init__(path=path, src_lang=src_lang, trg_lang=trg_lang,
                         split=kwargs["split"], has_trg=has_trg,
                         has_prompt=has_prompt, tokenizer=tokenizer,
                         sequence_encoder=sequence_encoder,
                         random_subset=random_subset, task=task)
        self.dataset = self.load_data(path, **kwargs)
        self._kwargs = kwargs
        self.reset_indices()

    def load_data(self, path: str, **kwargs) -> Any:
        from datasets import Dataset as Dataset_hf
        from datasets import DatasetDict, config, load_dataset, load_from_disk

        on_disk = any(
            Path(path, marker).exists()
            for marker in (config.DATASET_STATE_JSON_FILENAME,
                           config.DATASETDICT_JSON_FILENAME))
        if on_disk:
            hf_dataset = load_from_disk(path)
            if isinstance(hf_dataset, DatasetDict):
                split = kwargs["split"]
                assert split in hf_dataset
                hf_dataset = hf_dataset[split]
        else:
            hf_dataset = load_dataset(path, **kwargs)
        assert isinstance(hf_dataset, Dataset_hf)
        assert self.COLUMN_NAME in hf_dataset.features
        return hf_dataset

    def lookup_item(self, idx: int, lang: str) -> Tuple[str, str]:
        line = self.dataset[idx]
        assert lang in line[self.COLUMN_NAME], (line, lang)
        prompt = line.get(f"{lang}_prompt", None)
        return line[self.COLUMN_NAME][lang], prompt

    def get_list(self, lang, tokenized=False, subsampled=True):
        dataset = self.dataset
        if subsampled:
            dataset = dataset.filter(lambda x, idx: idx in self.indices,
                                     with_indices=True)
            assert len(dataset) == len(self.indices)
        if tokenized:
            def _tok(item):
                item[f"tok_{lang}"] = self.tokenizer[lang](item[self.COLUMN_NAME][lang])
                return item

            return dataset.map(_tok, desc=f"Tokenizing {lang}...")[f"tok_{lang}"]
        return dataset.flatten()[f"{self.COLUMN_NAME}.{lang}"]

    def __len__(self) -> int:
        return self.dataset.num_rows


class HuggingfaceTranslationDataset(BaseHuggingfaceDataset):
    """datasets.features.Translation wrapper (joeynmt/datasets.py:972-1027)."""

    COLUMN_NAME = "translation"

    def load_data(self, path: str, **kwargs) -> Any:
        dataset = super().load_data(path=path, **kwargs)
        from datasets.features import Translation as Translation_hf

        assert isinstance(dataset.features[self.COLUMN_NAME], Translation_hf), \
            f"Please cast `{self.COLUMN_NAME}` column to " \
            "datasets.features.Translation class."
        assert self.src_lang in dataset.features[self.COLUMN_NAME].languages
        if self.has_trg:
            assert self.trg_lang in dataset.features[self.COLUMN_NAME].languages

        def _pre_process(item):
            sl, tl = self.src_lang, self.trg_lang
            item[self.COLUMN_NAME][sl] = self.tokenizer[sl].pre_process(
                item[self.COLUMN_NAME][sl])
            if self.has_trg:
                item[self.COLUMN_NAME][tl] = self.tokenizer[tl].pre_process(
                    item[self.COLUMN_NAME][tl])
            if self.has_prompt[sl]:
                item[f"{sl}_prompt"] = self.tokenizer[sl].pre_process(
                    item[f"{sl}_prompt"], allow_empty=True)
            if self.has_prompt[tl]:
                item[f"{tl}_prompt"] = self.tokenizer[tl].pre_process(
                    item[f"{tl}_prompt"], allow_empty=True)
            return item

        def _drop_nan(item):
            sides = [self.src_lang] + ([self.trg_lang] if self.has_trg else [])
            cells = (item[self.COLUMN_NAME][lang] for lang in sides)
            return all(c is not None and len(c) > 0 for c in cells)

        dataset = dataset.filter(_drop_nan, desc="Dropping NaN...")
        dataset = dataset.map(_pre_process, desc="Preprocessing...")
        return dataset


def build_dataset(dataset_type: str, path: str, src_lang: str, trg_lang: str,
                  split: str, tokenizer: Dict = None, sequence_encoder: Dict = None,
                  has_prompt: Dict = None, random_subset: int = -1,
                  task: str = "MT", **kwargs):
    """Dataset factory (joeynmt/datasets.py:1030-1161)."""
    dataset = None
    has_trg = True
    _placeholder = {src_lang: None, trg_lang: None}
    tokenizer = _placeholder if tokenizer is None else tokenizer
    sequence_encoder = _placeholder if sequence_encoder is None else sequence_encoder
    has_prompt = _placeholder if has_prompt is None else has_prompt

    common = dict(src_lang=src_lang, trg_lang=trg_lang, split=split,
                  has_prompt=has_prompt, tokenizer=tokenizer,
                  sequence_encoder=sequence_encoder, task=task)

    if dataset_type == "plain":
        if not Path(path).with_suffix(f"{Path(path).suffix}.{trg_lang}").is_file():
            has_trg = False
        dataset = PlaintextDataset(path=path, has_trg=has_trg,
                                   random_subset=random_subset, **common, **kwargs)
    elif dataset_type == "tsv":
        dataset = TsvDataset(path=path, has_trg=has_trg,
                             random_subset=random_subset, **common, **kwargs)
    elif dataset_type == "speech":
        assert task == "S2T", task
        common.update(src_lang="src", trg_lang="trg")
        dataset = SpeechDataset(path=path, has_trg=has_trg,
                                random_subset=random_subset, **common, **kwargs)
    elif dataset_type == "stream":
        assert task == "MT", task
        assert split == "test", split
        dataset = StreamDataset(path=path, has_trg=False, random_subset=-1,
                                **common, **kwargs)
    elif dataset_type == "speech_stream":
        assert task == "S2T", task
        assert split == "test", split
        common.update(src_lang="src", trg_lang="trg")
        dataset = SpeechStreamDataset(path=None, has_trg=False, random_subset=-1,
                                      **common, **kwargs)
    elif dataset_type == "huggingface":
        if "hf_split" in kwargs:
            kwargs["split"] = kwargs.pop("hf_split")
        elif "split" not in kwargs:
            kwargs["split"] = "validation" if split == "dev" else split
        common.pop("split")
        dataset = HuggingfaceTranslationDataset(path=path, has_trg=has_trg,
                                                random_subset=random_subset,
                                                **common, **kwargs)
    else:
        raise ConfigurationError(f"{dataset_type}: Unknown dataset type.")
    return dataset
