# coding: utf-8
"""
Library/model-zoo interface (counterpart of joeynmt/hub_interface.py + the
hubconf.py entry points).

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

PredictionOutput = NamedTuple(
    "PredictionOutput",
    [
        ("translation", List[str]),
        ("tokens", Optional[List[List[str]]]),
        ("token_probs", Optional[List[List[float]]]),
        ("sequence_probs", Optional[List[float]]),
        ("attention_probs", Optional[List[List[float]]]),
    ],
)


def _check_file_path(path: Union[str, Path], model_dir: Path) -> Optional[Path]:
    """Resolve a config-relative file into the snapshot dir
    (joeynmt/hub_interface.py:38-46)."""
    if path is None:
        return None
    p = Path(path) if isinstance(path, str) else path
    if not p.is_file():
        p = model_dir / p.name
    assert p.is_file(), p
    return p


def _from_pretrained(model_name_or_path: Union[str, Path],
                     cfg_file: Union[str, Path] = "config.yaml", **kwargs):
    """Prepare model + stream dataset from a pretrained snapshot dir
    (joeynmt/hub_interface.py:49-99)."""
    model_dir = Path(model_name_or_path)
    assert model_dir.is_dir(), model_dir

    cfg_file = _check_file_path(cfg_file, model_dir)
    cfg = load_config(cfg_file)
    if "load_model" in kwargs:  # convenience: select a checkpoint by name
        cfg.setdefault("testing", {})["load_model"] = kwargs.pop("load_model")
    cfg.update(kwargs)
    cfg["model_dir"] = model_dir.as_posix()

    if "task" in cfg["data"]:
        cfg["task"] = cfg["data"]["task"]
    task = cfg.get("task", "MT").upper()
    _check_options("task", task, ["MT", "S2T"])

    for side in ["src", "trg"]:
        if task == "S2T" and side == "src":
            assert cfg["data"]["dataset_type"] == "speech"
        else:
            data_side = cfg["data"][side]
            if data_side.get("voc_file"):
                data_side["voc_file"] = _check_file_path(
                    data_side["voc_file"], model_dir).as_posix()
            if "tokenizer_cfg" in data_side:
                for tok_model in ["codes", "model_file"]:
                    if tok_model in data_side["tokenizer_cfg"]:
                        data_side["tokenizer_cfg"][tok_model] = _check_file_path(
                            data_side["tokenizer_cfg"][tok_model],
                            model_dir).as_posix()

    if cfg["testing"].get("load_model"):
        cfg["testing"]["load_model"] = _check_file_path(
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

    def score(self, src: List[str], trg: Optional[List[str]] = None,
              **kwargs) -> List[PredictionOutput]:
        assert isinstance(src, list), "Please provide a list of sentences!"
        kwargs["return_prob"] = "hyp" if trg is None else "ref"
        kwargs["return_attention"] = True

        translations, tokens, probs, attn, test_cfg = self._generate(
            src, trg, **kwargs)

        beam_size = test_cfg.get("beam_size", 1)
        n_best = test_cfg.get("n_best", 1)

        out = []
        for i in range(len(src)):
            offset = i * n_best
            pred = PredictionOutput(
                translation=trg[i] if trg else translations[offset:offset + n_best],
                tokens=tokens[offset:offset + n_best],
                token_probs=(list(probs[offset:offset + n_best])
                             if beam_size == 1 and len(probs) else None),
                sequence_probs=([p[0] for p in probs[offset:offset + n_best]]
                                if beam_size > 1 and len(probs) else None),
                attention_probs=(list(attn[offset:offset + n_best])
                                 if attn else None),
            )
            out.append(pred)
        return out

    def generate(self, src: List[str], **kwargs) -> List[str]:
        assert isinstance(src, list), "Please provide a list of sentences!"
        kwargs["return_prob"] = "none"
        translations, _, _, _, _ = self._generate(src, **kwargs)
        return translations

    def _generate(self, src: List[str], trg: Optional[List[str]] = None,
                  src_prompt: Optional[List[str]] = None,
                  trg_prompt: Optional[List[str]] = None, **kwargs):
        test_cfg = dict(self.args.test.__dict__)
        test_cfg.update(kwargs)

        if self.args.task == "MT":
            assert isinstance(self.dataset, StreamDataset), self.dataset
        elif self.args.task == "S2T":
            assert isinstance(self.dataset, SpeechStreamDataset), self.dataset
        test_cfg["batch_type"] = "sentence"
        test_cfg["batch_size"] = len(src)

        if src_prompt:
            assert len(src) == len(src_prompt), \
                "src and src_prompt must have the same length!"
        else:
            src_prompt = [None] * len(src)
        if trg_prompt:
            assert len(src) == len(trg_prompt), \
                "trg and trg_prompt must have the same length!"
        else:
            trg_prompt = [None] * len(src)

        self.dataset.reset_cache()
        if trg is not None:
            assert len(src) == len(trg), "src and trg must have the same length!"
            self.dataset.has_trg = True
            test_cfg["n_best"] = 1
            test_cfg["beam_size"] = 1
            test_cfg["return_prob"] = "ref"
            for src_sent, trg_sent, src_p, trg_p in zip(src, trg, src_prompt,
                                                        trg_prompt):
                self.dataset.set_item(src_sent, trg_sent, src_p, trg_p)
        else:
            self.dataset.has_trg = False
            for src_sent, src_p, trg_p in zip(src, src_prompt, trg_prompt):
                self.dataset.set_item(src_sent, None, src_p, trg_p)

        assert len(self.dataset) == len(src), (len(self.dataset), self.dataset.cache)

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
        src_tokens = self.dataset.get_item(idx=0, lang=self.dataset.src_lang,
                                           is_train=False)
        trg_tokens = self.dataset.get_item(idx=0, lang=self.dataset.trg_lang,
                                           is_train=False)
        self.dataset.reset_cache()

        eos_src = getattr(self.dataset.tokenizer[self.dataset.src_lang],
                          "eos_token", "</s>")
        eos_trg = getattr(self.dataset.tokenizer[self.dataset.trg_lang],
                          "eos_token", "</s>")
        return plot_heatmap(
            scores=np.asarray(attention_scores),
            column_labels=src_tokens + [eos_src],
            row_labels=trg_tokens + [eos_trg],
            output_path=None)


def load_model_dir(model_dir: Union[str, Path],
                   cfg_file: str = "config.yaml", **kwargs) -> TranslatorHubInterface:
    """Load a pretrained snapshot dir into a TranslatorHubInterface."""
    model, spec, params, loss_fn, dataset, args = _from_pretrained(
        model_dir, cfg_file, **kwargs)
    return TranslatorHubInterface(model, spec, params, loss_fn, dataset, args)
