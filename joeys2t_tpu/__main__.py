# coding: utf-8
"""
CLI entry point: `python -m joeys2t_tpu {train,test,translate} config.yaml`
(counterpart of joeynmt/__main__.py:15-101).

The `-d/--use-ddp` flag of the reference (torch mp.spawn + NCCL) maps to the
JAX runtime: multi-chip execution is automatic via the device mesh; multi-host
launches initialize jax.distributed from the environment.
"""
import argparse
import shutil
from pathlib import Path

from joeys2t_tpu import __version__
from joeys2t_tpu.config import load_config
from joeys2t_tpu.helpers import make_model_dir
from joeys2t_tpu.prediction import test, translate
from joeys2t_tpu.training import train
from joeys2t_tpu.utils.logging import add_file_handler, get_logger


def main():
    ap = argparse.ArgumentParser("joeys2t_tpu")

    ap.add_argument("mode", choices=["train", "test", "translate"],
                    help="train a model or test or translate")
    ap.add_argument("config_path", type=str, help="path to YAML config file")
    ap.add_argument("-o", "--output-path", type=str,
                    help="path for saving translation output")
    ap.add_argument("-a", "--save-attention", action="store_true",
                    help="save attention visualizations")
    ap.add_argument("-s", "--save-scores", action="store_true",
                    help="save scores")
    ap.add_argument("-t", "--skip-test", action="store_true",
                    help="skip test after training")
    ap.add_argument("-d", "--use-ddp", action="store_true",
                    help="(accepted for config compatibility; JAX shards over "
                         "the device mesh automatically)")
    ap.add_argument("--version", action="version",
                    version=f"%(prog)s {__version__}")
    args = ap.parse_args()

    cfg = load_config(Path(args.config_path))

    # multi-host: initialize the JAX distributed runtime when a coordinator is
    # configured (replaces the reference's mp.spawn + NCCL rendezvous,
    # joeynmt/__main__.py:72-86 / helpers_for_ddp.py:17-38)
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    if args.mode == "train":
        model_dir = make_model_dir_and_copy_config(cfg, Path(args.config_path))
        logger = get_logger()
        add_file_handler(logger, model_dir / "train.log")
        train(cfg=cfg, skip_test=args.skip_test)
    elif args.mode == "test":
        logger = get_logger()
        model_dir = Path(cfg["model_dir"])
        if model_dir.is_dir():
            add_file_handler(logger, model_dir / "test.log")
        test(cfg=cfg, output_path=args.output_path,
             save_attention=args.save_attention, save_scores=args.save_scores)
    elif args.mode == "translate":
        translate(cfg=cfg, output_path=args.output_path)
    else:
        raise ValueError("Unknown mode")


def make_model_dir_and_copy_config(cfg: dict, config_path: Path) -> Path:
    """Create model dir + copy config into it (joeynmt/__main__.py:56-67)."""
    model_dir = Path(cfg["model_dir"])
    overwrite = cfg["training"].get("overwrite", False)
    make_model_dir(model_dir, overwrite=overwrite)
    shutil.copy2(config_path, (model_dir / "config.yaml").as_posix())
    return model_dir


if __name__ == "__main__":
    main()
