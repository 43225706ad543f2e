# coding: utf-8
"""
Configuration system.

Loads the same YAML schema as the reference (joeynmt/config.py:26-249) into
frozen dataclasses. All keys, defaults, deprecation shims and validation rules
are kept so that existing configs (configs/*.yaml in the reference) parse
unchanged. Device handling is JAX-native: `use_cuda: True` maps to "run on the
default JAX backend (TPU)", fp16 maps to bfloat16 compute on TPU.
"""
import dataclasses
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class ConfigurationError(Exception):
    """Custom exception for misspecifications of configuration."""


@dataclasses.dataclass(frozen=True)
class SpecialSymbols:
    """Special symbol ids/tokens (defaults: joeynmt/config.py:128-140)."""

    unk_id: int = 0
    unk_token: str = "<unk>"
    pad_id: int = 1
    pad_token: str = "<pad>"
    bos_id: int = 2
    bos_token: str = "<s>"
    eos_id: int = 3
    eos_token: str = "</s>"
    sep_id: Optional[int] = None
    sep_token: Optional[str] = None
    lang_tags: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """`training` section (joeynmt/config.py:26-65, defaults :252-353)."""

    load_model: Optional[Path] = None
    load_encoder: Optional[Path] = None
    load_decoder: Optional[Path] = None
    reset_best_ckpt: bool = False
    reset_scheduler: bool = False
    reset_optimizer: bool = False
    reset_iter_state: bool = False
    loss: str = "crossentropy"
    normalization: str = "batch"
    label_smoothing: float = 0.0
    optimizer: str = "adam"
    adam_betas: List[float] = dataclasses.field(default_factory=lambda: [0.9, 0.999])
    # beyond-reference TPU knob: dtype of the Adam/AdamW first moment
    # ("bfloat16" halves its HBM footprint; None keeps the param dtype).
    moment_dtype: Optional[str] = None
    # beyond-reference TPU knob: host->device dtype of float speech
    # features. "auto" uploads bfloat16 whenever the encoder computes in
    # bfloat16 (the encoder casts inputs to its compute dtype on device
    # anyway, so this halves the dominant sustained-train transfer with
    # bit-identical downstream math); "float32"/"bfloat16" force.
    feature_dtype: str = "auto"
    learning_rate: float = 0.005
    learning_rate_min: float = 0.0001
    learning_rate_factor: float = 1
    learning_rate_warmup: int = 4000
    scheduling: Optional[str] = None
    patience: int = 5
    decrease_factor: float = 0.5
    weight_decay: float = 0.0
    clip_grad_norm: Optional[float] = None
    clip_grad_val: Optional[float] = None
    keep_best_ckpts: int = 5
    logging_freq: int = 100
    validation_freq: int = 1000
    print_valid_sents: List[int] = dataclasses.field(default_factory=lambda: [0, 1, 2])
    early_stopping_metric: str = "ppl"
    minimize_metric: bool = True
    shuffle: bool = True
    epochs: int = 3
    max_updates: float = float("inf")
    batch_size: int = 1
    batch_type: str = "sentence"
    batch_multiplier: int = 1
    ctc_weight: float = 0.0
    # beyond-reference: capture an XLA profiler trace of train steps 10-20
    # into this directory (tensorboard xplane format). Env var
    # JOEYS2T_PROFILE_DIR overrides (training.py profile hook).
    profile_dir: Optional[Path] = None
    # beyond-reference: tensor-parallel degree (`model` mesh axis). The
    # reference is dp-only (SURVEY.md §2.3); here the same YAML drives the
    # 2-D (data, model) mesh — Megatron-style param sharding (parallel/tp.py)
    # plus optional sequence parallelism (model.sequence_parallel) and
    # expert parallelism (MoE expert dim rides the same axis).
    model_parallel: int = 1
    # beyond-reference: GPipe pipeline-parallel degree (`pipe` mesh axis).
    # Stages the encoder layer stack over pipeline_parallel devices with
    # microbatched ppermute rotation (parallel/pp.py). Mutually exclusive
    # with model_parallel > 1 (each owns the second mesh dim).
    pipeline_parallel: int = 1
    # microbatches per pipeline step; 0 = auto (2 * pipeline_parallel,
    # bubble fraction (S-1)/(M+S-1))
    pipeline_microbatches: int = 0


@dataclasses.dataclass(frozen=True)
class TestConfig:
    """`testing` section (joeynmt/config.py:67-86, defaults :356-446)."""

    __test__ = False  # the Test* name is domain jargon, not a pytest class

    load_model: Optional[Path] = None
    batch_size: int = 64
    batch_type: str = "sentence"
    max_output_length: int = -1
    min_output_length: int = 1
    eval_metrics: List[str] = dataclasses.field(default_factory=list)
    sacrebleu_cfg: Dict = dataclasses.field(default_factory=dict)
    beam_size: int = 1
    beam_alpha: float = -1
    n_best: int = 1
    return_attention: bool = False
    return_prob: str = "none"
    generate_unk: bool = True
    repetition_penalty: float = -1
    no_repeat_ngram_size: int = -1
    # beyond-reference: beam self-cache reorder strategy. "auto"/"lazy" =
    # ancestry-indexed self attention (no physical cache permute),
    # "physical" = classic cache[select]. Env var JOEYS2T_BEAM_REORDER
    # overrides (search.py beam_search).
    beam_reorder: str = "auto"


@dataclasses.dataclass(frozen=True)
class BaseConfig:
    """Top-level parsed config (joeynmt/config.py:88-106)."""

    name: str
    model_dir: Path
    task: str = "MT"
    joeynmt_version: Optional[str] = "2.3.0"
    use_device: bool = True  # counterpart of use_cuda: run on default accelerator
    n_devices: int = 1
    num_workers: int = 0
    fp16: bool = False  # on TPU this selects bfloat16 compute
    seed: int = 42
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    test: TestConfig = dataclasses.field(default_factory=TestConfig)
    data: Dict = dataclasses.field(default_factory=dict)
    model: Dict = dataclasses.field(default_factory=dict)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.fp16 else jnp.float32


def _check_path(path, allow_empty: bool = True) -> Optional[Path]:
    """joeynmt/config.py:109-115"""
    if path is not None:
        path = Path(path).absolute()
        if not allow_empty:
            assert path.exists(), f"{path} not found."
    return path


def _check_options(name: str, choice: Any, valid_options: List[Any]) -> None:
    """joeynmt/config.py:118-125"""
    if choice not in valid_options:
        valids = "{" + ", ".join([f"`{option}`" for option in valid_options]) + "}"
        raise ConfigurationError(f"Invalid setting for `{name}`. Valid choices: {valids}.")


def parse_special_symbols(cfg: Dict) -> SpecialSymbols:
    """Apply special-symbol defaults (joeynmt/config.py:128-140)."""
    if isinstance(cfg, SpecialSymbols):
        return cfg
    cfg = dict(cfg or {})
    return SpecialSymbols(
        unk_id=cfg.get("unk_id", 0),
        unk_token=cfg.get("unk_token", "<unk>"),
        pad_id=cfg.get("pad_id", 1),
        pad_token=cfg.get("pad_token", "<pad>"),
        bos_id=cfg.get("bos_id", 2),
        bos_token=cfg.get("bos_token", "<s>"),
        eos_id=cfg.get("eos_id", 3),
        eos_token=cfg.get("eos_token", "</s>"),
        sep_id=cfg.get("sep_id", None),
        sep_token=cfg.get("sep_token", None),
        lang_tags=cfg.get("lang_tags", []),
    )


def log_config(cfg: Dict, prefix: str = "cfg") -> None:
    """Echo config to log (joeynmt/config.py:143-156)."""
    for k, v in cfg.items():
        if isinstance(v, dict):
            log_config(v, prefix=".".join([prefix, k]))
        else:
            logger.info("%34s : %s", ".".join([prefix, k]), v)


def load_config(cfg_file: str = "configs/default.yaml") -> Dict:
    """Load raw YAML config (joeynmt/config.py:159-173)."""
    cfg_file = _check_path(cfg_file, allow_empty=False)
    with cfg_file.open("r", encoding="utf-8") as ymlfile:
        cfg = yaml.safe_load(ymlfile)
    if "model_dir" not in cfg:
        cfg["model_dir"] = cfg["training"]["model_dir"]
    return cfg


def parse_global_args(cfg: Dict = None, rank: int = 0, mode: str = "train") -> BaseConfig:
    """Parse + validate full config (joeynmt/config.py:176-249)."""
    del rank  # JAX runtime owns process placement
    task = cfg.get("task", cfg["data"].get("task", "MT")).upper()
    _check_options("task", task, ["MT", "S2T"])

    # `use_cuda` key accepted for config compatibility; means "use accelerator"
    use_device = cfg.get("use_cuda", cfg["training"].get("use_cuda", True))
    import jax

    try:
        n_devices = jax.device_count() if use_device else 1
    except RuntimeError:  # pragma: no cover
        use_device, n_devices = False, 1

    num_workers = cfg.get("num_workers", cfg["training"].get("num_workers", 0))

    fp16 = cfg.get("fp16", cfg["training"].get("fp16", False))

    special_symbols = parse_special_symbols(cfg["data"].get("special_symbols", {}))
    cfg["data"]["special_symbols"] = special_symbols

    return BaseConfig(
        name=cfg["name"],
        joeynmt_version=cfg.get("joeynmt_version", "2.3.0"),
        task=task,
        model_dir=_check_path(cfg["model_dir"]),
        use_device=use_device,
        n_devices=n_devices,
        num_workers=num_workers,
        fp16=fp16,
        seed=cfg.get("random_seed", 42),
        train=parse_train_args(cfg["training"], mode),
        test=parse_test_args(cfg["testing"], mode),
        data=cfg["data"],
        model=cfg["model"],
    )


def parse_train_args(cfg: Dict = None, mode: str = "train") -> TrainConfig:
    """Parse + validate `training` section (joeynmt/config.py:252-353)."""
    normalization = cfg.get("normalization", "batch").lower()
    _check_options("normalization", normalization, ["batch", "tokens", "none"])

    loss_type = cfg.get("loss", "crossentropy")
    _check_options("loss", loss_type, ["crossentropy", "crossentropy-ctc"])

    keep_best_ckpts = int(cfg.get("keep_best_ckpts", 5))
    _keep_last_ckpts = cfg.get("keep_last_ckpts", None)
    if _keep_last_ckpts is not None:  # backward compatibility
        keep_best_ckpts = _keep_last_ckpts
        logger.warning("`keep_last_ckpts` option is outdated. Please use `keep_best_ckpts`, instead.")

    early_stopping_metric = cfg.get("early_stopping_metric", "ppl").lower()
    _check_options("early_stopping_metric", early_stopping_metric,
                   ["acc", "loss", "ppl", "bleu", "chrf", "wer"])
    minimize_metric = early_stopping_metric in ["ppl", "loss", "wer"]

    batch_type = cfg.get("batch_type", "sentence").lower()
    _check_options("batch_type", batch_type, ["sentence", "token"])

    model_parallel = int(cfg.get("model_parallel", 1))
    if model_parallel < 1:
        raise ConfigurationError("`model_parallel` must be >= 1.")
    pipeline_parallel = int(cfg.get("pipeline_parallel", 1))
    if pipeline_parallel < 1:
        raise ConfigurationError("`pipeline_parallel` must be >= 1.")
    if pipeline_parallel > 1 and model_parallel > 1:
        raise ConfigurationError(
            "`pipeline_parallel` and `model_parallel` are mutually exclusive.")
    pipeline_microbatches = int(cfg.get("pipeline_microbatches", 0))
    if pipeline_microbatches < 0:
        raise ConfigurationError("`pipeline_microbatches` must be >= 0.")

    feature_dtype = str(cfg.get("feature_dtype", "auto")).lower()
    _check_options("feature_dtype", feature_dtype,
                   ["auto", "float32", "bfloat16"])

    # fail at parse time, not as a TypeError from jnp.dtype() when the
    # optimizer is built (optim.py consumes this as a dtype string)
    moment_dtype = cfg.get("moment_dtype", None)
    if moment_dtype is not None:
        moment_dtype = str(moment_dtype).lower()
    _check_options("moment_dtype", moment_dtype,
                   [None, "bfloat16", "float32"])

    logging_freq = cfg.get("logging_freq", 100)
    validation_freq = cfg.get("validation_freq", 1000)
    if logging_freq > validation_freq:
        raise ConfigurationError("`logging_freq` must be smaller than `validation_freq`.")
    if validation_freq % logging_freq != 0:
        raise ConfigurationError("`validation_freq` must be divisible by `logging_freq`.")

    is_test = mode != "train"

    return TrainConfig(
        load_model=_check_path(cfg.get("load_model", None), allow_empty=is_test),
        load_encoder=_check_path(cfg.get("load_encoder", None), allow_empty=is_test),
        load_decoder=_check_path(cfg.get("load_decoder", None), allow_empty=is_test),
        reset_best_ckpt=cfg.get("reset_best_ckpt", False),
        reset_scheduler=cfg.get("reset_scheduler", False),
        reset_optimizer=cfg.get("reset_optimizer", False),
        reset_iter_state=cfg.get("reset_iter_state", False),
        normalization=normalization,
        loss=loss_type,
        label_smoothing=cfg.get("label_smoothing", 0.0),
        optimizer=cfg.get("optimizer", "adam").lower(),
        adam_betas=cfg.get("adam_betas", [0.9, 0.999]),
        moment_dtype=moment_dtype,
        feature_dtype=feature_dtype,
        learning_rate=cfg.get("learning_rate", 0.005),
        learning_rate_min=cfg.get("learning_rate_min", 0.0001),
        learning_rate_factor=cfg.get("learning_rate_factor", 1),
        learning_rate_warmup=cfg.get("learning_rate_warmup", 4000),
        scheduling=cfg.get("scheduling", None),  # None == constant
        patience=cfg.get("patience", 5),
        decrease_factor=cfg.get("decrease_factor", 0.5),
        weight_decay=cfg.get("weight_decay", 0.0),
        clip_grad_norm=cfg.get("clip_grad_norm", None),
        clip_grad_val=cfg.get("clip_grad_val", None),
        keep_best_ckpts=keep_best_ckpts,
        logging_freq=logging_freq,
        validation_freq=validation_freq,
        print_valid_sents=cfg.get("print_valid_sents", [0, 1, 2]),
        early_stopping_metric=early_stopping_metric,
        minimize_metric=minimize_metric,
        shuffle=cfg.get("shuffle", True),
        epochs=cfg.get("epochs", 3),
        max_updates=cfg.get("updates", float("inf")),
        batch_size=cfg["batch_size"],
        batch_type=batch_type,
        batch_multiplier=cfg.get("batch_multiplier", 1),
        ctc_weight=cfg.get("ctc_weight", 0.0),
        profile_dir=_check_path(cfg.get("profile_dir", None)),
        model_parallel=model_parallel,
        pipeline_parallel=pipeline_parallel,
        pipeline_microbatches=pipeline_microbatches,
    )


def parse_test_args(cfg: Dict = None, mode: str = "test") -> TestConfig:
    """Parse + validate `testing` section (joeynmt/config.py:356-446)."""
    batch_size = cfg.get("batch_size", 64)
    batch_type = cfg.get("batch_type", "sentence").lower()
    _check_options("batch_type", batch_type, ["sentence", "token"])
    if batch_size > 1000 and batch_type == "sentence":
        logger.warning(
            "WARNING: Are you sure you meant to work on huge batches like this? "
            "`batch_size` is > 1000 for sentence-batching. Consider decreasing it "
            "or switching to `batch_type: 'token'`.")

    if "eval_metrics" in cfg:
        eval_metrics = [s.strip().lower() for s in cfg["eval_metrics"]]
    elif "eval_metric" in cfg:
        eval_metrics = [cfg["eval_metric"].strip().lower()]
        logger.warning("`eval_metric` option is obsolete. Please use `eval_metrics`, instead.")
    else:
        eval_metrics = []
    for eval_metric in eval_metrics:
        _check_options("eval_metric", eval_metric,
                       ["bleu", "chrf", "token_accuracy", "sequence_accuracy", "wer"])

    sacrebleu_cfg: Dict = cfg.get("sacrebleu_cfg", {})
    if "sacrebleu" in cfg:
        sacrebleu_cfg = cfg["sacrebleu"]
        logger.warning("`sacrebleu` option is obsolete. Please use `sacrebleu_cfg`, instead.")

    n_best = cfg.get("n_best", 1)
    if n_best < 1:
        raise ConfigurationError("N-best size must be > 0.")
    beam_size = cfg.get("beam_size", 1)
    if beam_size < 1:
        raise ConfigurationError("Beam size must be > 0.")
    if n_best > beam_size:
        raise ConfigurationError("`n_best` must be smaller than or equal to `beam_size`.")

    beam_alpha = cfg.get("beam_alpha", -1)
    if "alpha" in cfg:
        beam_alpha = cfg["alpha"]
        logger.warning("`alpha` option is obsolete. Please use `beam_alpha`, instead.")

    return_prob = cfg.get("return_prob", "none")
    _check_options("return_prob", return_prob, ["hyp", "ref", "none"])

    repetition_penalty: float = cfg.get("repetition_penalty", -1)
    if 0 < repetition_penalty < 1:
        raise ConfigurationError(
            "Repetition penalty must be > 1. (-1 indicates no repetition penalty.)")

    # env var overrides the YAML (operational escape hatch); resolved HERE,
    # at parse time — the decode hot path never reads the environment
    beam_reorder = os.environ.get(
        "JOEYS2T_BEAM_REORDER", cfg.get("beam_reorder", "auto")).lower()
    _check_options("beam_reorder", beam_reorder, ["auto", "lazy", "physical"])

    return TestConfig(
        load_model=_check_path(cfg.get("load_model", None), allow_empty=mode == "train"),
        batch_size=batch_size,
        batch_type=batch_type,
        max_output_length=cfg.get("max_output_length", -1),
        min_output_length=cfg.get("min_output_length", 1),
        eval_metrics=eval_metrics,
        sacrebleu_cfg=sacrebleu_cfg,
        beam_size=beam_size,
        beam_alpha=beam_alpha,
        n_best=n_best,
        return_attention=cfg.get("return_attention", False),
        return_prob=return_prob,
        generate_unk=cfg.get("generate_unk", True),
        repetition_penalty=repetition_penalty,
        no_repeat_ngram_size=cfg.get("no_repeat_ngram_size", -1),
        beam_reorder=beam_reorder,
    )


def set_validation_args(args: TestConfig) -> TestConfig:
    """Greedy-only overrides for in-training validation (joeynmt/config.py:449-472)."""
    return dataclasses.replace(
        args,
        beam_size=1,
        n_best=1,
        return_prob="none",
        generate_unk=True,
        repetition_penalty=-1,
        no_repeat_ngram_size=-1,
    )
