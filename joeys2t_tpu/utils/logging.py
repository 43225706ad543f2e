# coding: utf-8
"""
Logging utilities.

Replaces the reference's DDP-aware logging substrate
(joeynmt/helpers_for_ddp.py:177-241) with jax.process_index()-gated logging:
only process 0 emits records; other hosts stay silent.
"""
import functools
import logging
from pathlib import Path
from typing import Optional


def _is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover - jax not initialised yet
        return True


class MainProcessFilter(logging.Filter):
    """Only let records through on the main (process_index 0) host."""

    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        return _is_main_process()


@functools.lru_cache(maxsize=None)
def get_logger(name: str = "joeys2t_tpu") -> logging.Logger:
    """Create a logger with a stream handler (rank-0 gated)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setLevel(logging.INFO)
        handler.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
        handler.addFilter(MainProcessFilter())
        logger.addHandler(handler)
        logger.propagate = False
    return logger


def add_file_handler(logger: logging.Logger, log_file: Path,
                     level: int = logging.DEBUG) -> Optional[logging.Handler]:
    """Attach a file handler (main process only), mirroring per-mode log files
    of the reference (joeynmt/helpers_for_ddp.py:200-241)."""
    if not _is_main_process():
        return None
    log_file.parent.mkdir(parents=True, exist_ok=True)
    fh = logging.FileHandler(log_file.as_posix())
    fh.setLevel(level)
    fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
    fh.addFilter(MainProcessFilter())
    logger.addHandler(fh)
    return fh
