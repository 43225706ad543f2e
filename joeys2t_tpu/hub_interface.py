# coding: utf-8
"""
Library/model-zoo interface (behavioral counterpart of
joeynmt/hub_interface.py + the hubconf.py entry points).

`load_model_dir("path/to/pretrained")` -> TranslatorHubInterface with
.generate() / .score() / .plot_attention(); the named zoo entries in
joeys2t_tpu.zoo resolve local snapshot dirs or download from a configured
mirror (joeynmt/hubconf.py:41-107 downloads from the Heidelberg server; in
air-gapped environments pass a local dir).
"""
from pathlib import Path
from typing import List, NamedTuple, Optional, Union

import numpy as np

from joeys2t_tpu.config import (
    BaseConfig,
    TestConfig,
    _check_options,
    load_config,
    parse_global_args,
)
from joeys2t_tpu.data.datasets import BaseDataset, SpeechStreamDataset, StreamDataset
from joeys2t_tpu.prediction import predict, prepare
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class PredictionOutput(NamedTuple):
    """One input's scored decode: surface text plus (optional) token-level
    and sequence-level probabilities and cross-attention."""

    translation: List[str]
    tokens: Optional[List[List[str]]]
    token_probs: Optional[List[List[float]]]
    sequence_probs: Optional[List[float]]
    attention_probs: Optional[List[List[float]]]


def _in_snapshot(path: Union[str, Path, None],
                 model_dir: Path) -> Optional[Path]:
    """Published configs carry the publisher's absolute paths; remap any
    file that doesn't exist locally to its basename inside the snapshot
    (joeynmt/hub_interface.py:38-46 contract)."""
    if path is None:
        return None
    candidate = Path(path)
    if not candidate.is_file():
        candidate = model_dir / candidate.name
    assert candidate.is_file(), candidate
    return candidate


def _localize_side_files(cfg: dict, model_dir: Path, task: str) -> None:
    """Rewrite every per-side file reference (vocab, subword model/codes)
    into the snapshot dir."""
    for side in ("src", "trg"):
        if task == "S2T" and side == "src":
            assert cfg["data"]["dataset_type"] == "speech"
            continue
        section = cfg["data"][side]
        if section.get("voc_file"):
            section["voc_file"] = _in_snapshot(
                section["voc_file"], model_dir).as_posix()
        tok_cfg = section.get("tokenizer_cfg", {})
        for key in ("codes", "model_file"):
            if key in tok_cfg:
                tok_cfg[key] = _in_snapshot(tok_cfg[key],
                                            model_dir).as_posix()


def _from_pretrained(model_name_or_path: Union[str, Path],
                     cfg_file: Union[str, Path] = "config.yaml", **kwargs):
    """Prepare model + stream dataset from a pretrained snapshot dir
    (joeynmt/hub_interface.py:49-99)."""
    model_dir = Path(model_name_or_path)
    assert model_dir.is_dir(), model_dir

    cfg = load_config(_in_snapshot(cfg_file, model_dir))
    if "load_model" in kwargs:  # convenience: select a checkpoint by name
        cfg.setdefault("testing", {})["load_model"] = kwargs.pop("load_model")
    cfg.update(kwargs)
    cfg["model_dir"] = model_dir.as_posix()

    if "task" in cfg["data"]:
        cfg["task"] = cfg["data"]["task"]
    task = cfg.get("task", "MT").upper()
    _check_options("task", task, ["MT", "S2T"])

    _localize_side_files(cfg, model_dir, task)
    if cfg["testing"].get("load_model"):
        cfg["testing"]["load_model"] = _in_snapshot(
            cfg["testing"]["load_model"], model_dir).as_posix()

    args = parse_global_args(cfg, rank=0, mode="translate")
    model, spec, params, loss_fn, _, _, test_data = prepare(
        args, rank=0, mode="translate")
    return model, spec, params, loss_fn, test_data, args


class TranslatorHubInterface:
    """generate()/score() interface over a pretrained model
    (joeynmt/hub_interface.py:102-251)."""

    def __init__(self, model, spec, params, loss_fn, dataset: BaseDataset,
                 args: BaseConfig):
        self.args = args
        self.dataset = dataset
        self.model = model
        self.spec = spec
        self.params = params
        self.loss_fn = loss_fn

    def generate(self, src: List[str], **kwargs) -> List[str]:
        """Decode a list of sentences (MT) or audio paths (S2T)."""
        assert isinstance(src, list), "Please provide a list of sentences!"
        kwargs["return_prob"] = "none"
        return self._generate(src, **kwargs)[0]

    def score(self, src: List[str], trg: Optional[List[str]] = None,
              **kwargs) -> List[PredictionOutput]:
        """Score hypotheses (trg=None: decode + hyp probs) or references
        (trg given: forced-decode probs)."""
        assert isinstance(src, list), "Please provide a list of sentences!"
        kwargs["return_prob"] = "hyp" if trg is None else "ref"
        kwargs["return_attention"] = True

        translations, tokens, probs, attn, test_cfg = self._generate(
            src, trg, **kwargs)
        n_best = test_cfg.get("n_best", 1)
        greedy = test_cfg.get("beam_size", 1) == 1

        def rows(seq, i):
            return seq[i * n_best:(i + 1) * n_best]

        out = []
        for i in range(len(src)):
            p = rows(probs, i) if len(probs) else []
            out.append(PredictionOutput(
                translation=trg[i] if trg else rows(translations, i),
                tokens=rows(tokens, i),
                token_probs=list(p) if greedy and p else None,
                sequence_probs=[q[0] for q in p] if not greedy and p else None,
                attention_probs=list(rows(attn, i)) if attn else None,
            ))
        return out

    def _stage_inputs(self, src, trg, src_prompt, trg_prompt) -> None:
        """Fill the stream dataset's cache with the call's inputs."""

        def per_item(aux, what):
            if not aux:
                return [None] * len(src)
            assert len(aux) == len(src), \
                f"src and {what} must have the same length!"
            return aux

        trg = per_item(trg, "trg")
        src_prompt = per_item(src_prompt, "src_prompt")
        trg_prompt = per_item(trg_prompt, "trg_prompt")
        self.dataset.reset_cache()
        for items in zip(src, trg, src_prompt, trg_prompt):
            self.dataset.set_item(*items)
        assert len(self.dataset) == len(src), \
            (len(self.dataset), self.dataset.cache)

    def _generate(self, src: List[str], trg: Optional[List[str]] = None,
                  src_prompt: Optional[List[str]] = None,
                  trg_prompt: Optional[List[str]] = None, **kwargs):
        stream_cls = StreamDataset if self.args.task == "MT" \
            else SpeechStreamDataset
        assert isinstance(self.dataset, stream_cls), self.dataset

        test_cfg = dict(self.args.test.__dict__)
        test_cfg.update(kwargs)
        test_cfg["batch_type"] = "sentence"
        test_cfg["batch_size"] = len(src)
        self.dataset.has_trg = trg is not None
        if trg is not None:
            # reference scoring is a forced decode: no search knobs apply
            test_cfg.update(n_best=1, beam_size=1, return_prob="ref")
        self._stage_inputs(src, trg, src_prompt, trg_prompt)

        _, _, translations, tokens, probs, attention_probs = predict(
            params=self.params, model=self.model, spec=self.spec,
            data=self.dataset, loss_fn=self.loss_fn,
            compute_loss=trg is not None,
            normalization=self.args.train.normalization,
            num_workers=self.args.num_workers,
            args=TestConfig(**{k: v for k, v in test_cfg.items()
                               if k in TestConfig.__dataclass_fields__}))
        if translations:
            assert len(src) * test_cfg.get("n_best", 1) == len(translations)

        self.dataset.reset_cache()
        return translations, tokens, probs, attention_probs, test_cfg

    def plot_attention(self, src: str, trg: str,
                       attention_scores: np.ndarray) -> None:
        """Attention heatmap for one (src, trg) pair
        (joeynmt/hub_interface.py:223-251); matplotlib instead of plotly."""
        from joeys2t_tpu.plotting import plot_heatmap

        self.dataset.reset_cache()
        self.dataset.has_trg = True
        self.dataset.set_item(src, trg)
        tokens, eos = {}, {}
        for axis, lang in (("col", self.dataset.src_lang),
                           ("row", self.dataset.trg_lang)):
            tokens[axis] = self.dataset.get_item(idx=0, lang=lang,
                                                 is_train=False)
            eos[axis] = getattr(self.dataset.tokenizer[lang], "eos_token",
                                "</s>")
        self.dataset.reset_cache()

        return plot_heatmap(
            scores=np.asarray(attention_scores),
            column_labels=tokens["col"] + [eos["col"]],
            row_labels=tokens["row"] + [eos["row"]],
            output_path=None)


def load_model_dir(model_dir: Union[str, Path],
                   cfg_file: str = "config.yaml",
                   **kwargs) -> TranslatorHubInterface:
    """Load a pretrained snapshot dir into a TranslatorHubInterface."""
    model, spec, params, loss_fn, dataset, args = _from_pretrained(
        model_dir, cfg_file, **kwargs)
    return TranslatorHubInterface(model, spec, params, loss_fn, dataset, args)
