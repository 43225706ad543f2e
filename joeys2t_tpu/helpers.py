# coding: utf-8
"""
Host-side helper functions (counterpart of joeynmt/helpers.py).

Device-side math helpers (subsequent masks etc.) live in joeys2t_tpu/ops; this
module hosts the pure-Python utilities: file IO, model-dir management, seeding,
checkpoint path resolution, text normalization.
"""
import random
import re
import shutil
import unicodedata
from itertools import chain
from pathlib import Path
from typing import Any, List, Optional, Union

import numpy as np

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def flatten(array: List[List[Any]]) -> List[Any]:
    """Flatten a nested 2D list (joeynmt/helpers.py)."""
    return list(chain.from_iterable(array))


def read_list_from_file(input_path: Path) -> List[str]:
    """Read list of str from file, one item per line."""
    if input_path is None:
        return []
    return [
        line.rstrip("\n")
        for line in Path(input_path).read_text(encoding="utf-8").splitlines()
    ]


def write_list_to_file(output_path: Path, array: List[Any]) -> None:
    """Write list of str to file, one item per line."""
    with Path(output_path).open("w", encoding="utf-8") as opened_file:
        for entry in array:
            if isinstance(entry, np.ndarray):
                entry = entry.tolist()
            opened_file.write(f"{entry}\n")


def make_model_dir(model_dir: Path, overwrite: bool = False) -> None:
    """Create a new directory for the model (joeynmt/helpers.py:30-46)."""
    model_dir = model_dir.absolute()
    if model_dir.is_dir():
        if not overwrite:
            raise FileExistsError(f"Model directory {model_dir} exists and overwriting is disabled.")
        shutil.rmtree(model_dir)
    model_dir.mkdir(parents=True)


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (joeynmt/helpers.py:93-104). Device-side randomness
    uses explicit jax.random keys derived from the same seed."""
    random.seed(seed)
    np.random.seed(seed)


def unicode_normalize(s: str) -> str:
    """Apply NFKC normalization + special quote/hyphen normalization
    (joeynmt/helpers.py:409-427)."""
    s = unicodedata.normalize("NFKC", s)
    s = s.replace("’", "'").replace("“", '"').replace("”", '"')
    return s


def remove_extra_spaces(s: str) -> str:
    """Remove extra spaces (joeynmt/helpers.py:429-444)."""
    s = re.sub("​", "", s)
    s = re.sub("[ 　]+", " ", s)
    s = s.replace(" ?", "?").replace(" !", "!")
    s = s.replace(" ,", ",").replace(" .", ".").replace(" :", ":")
    return s.strip()


def remove_punctuation(text: str, space: str = " "):
    """Remove punctuation (for WER eval tokenizer; joeynmt/tokenizers.py:536-546)."""
    return space.join(
        t for t in text.split(space)
        if not all(unicodedata.category(char)[0] == "P" for char in t)
    ).strip()


def lengths_to_mask(lengths: np.ndarray, max_len: Optional[int] = None) -> np.ndarray:
    """Bool mask (batch, max_len), True at valid positions
    (counterpart of joeynmt/helpers.py:459-469, inverted semantics: the
    reference's lengths_to_padding_mask marks padding; ours marks validity,
    matching how masks are consumed by the models)."""
    lengths = np.asarray(lengths)
    if max_len is None:
        max_len = int(lengths.max())
    return np.arange(max_len)[None, :] < lengths[:, None]


def symlink_update(target: Path, link_name: Path) -> Optional[Path]:
    """Atomically update a symlink (joeynmt/helpers.py:349-370)."""
    if link_name.is_symlink():
        current_last = link_name.resolve()
        link_name.unlink()
        link_name.symlink_to(target)
        return current_last
    link_name.symlink_to(target)
    return None


def latest_checkpoint_update(target: Path, link_name: str) -> Optional[Path]:
    """Update the `latest.ckpt` symlink."""
    link = target.parent / link_name
    return symlink_update(target.name, link)


def resolve_ckpt_path(load_model: Optional[Path], model_dir: Path) -> Path:
    """Resolve checkpoint path (joeynmt/helpers.py:245-261):
    explicit path > best.ckpt > latest.ckpt."""
    if load_model is None:
        if (model_dir / "best.ckpt").is_file():
            load_model = model_dir / "best.ckpt"
        else:
            load_model = get_latest_checkpoint(model_dir)
    assert load_model is not None and Path(load_model).is_file(), \
        f"Checkpoint not found: {load_model}"
    return Path(load_model)


def get_latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    """Newest checkpoint file in dir (joeynmt/helpers.py:210-230)."""
    if (ckpt_dir / "latest.ckpt").is_file():
        return (ckpt_dir / "latest.ckpt").resolve()
    ckpts = list(ckpt_dir.glob("*.ckpt"))
    if not ckpts:
        return None
    return max(ckpts, key=lambda f: f.stat().st_mtime)


def expand_reverse_index(reverse_index: List[int], n_best: int = 1) -> List[int]:
    """Expand a reverse permutation index for n-best outputs
    (joeynmt/helpers.py:384-406)."""
    if n_best == 1:
        return reverse_index
    resort_reverse_index = []
    for ix in reverse_index:
        for n in range(n_best):
            resort_reverse_index.append(ix * n_best + n)
    assert len(resort_reverse_index) == len(reverse_index) * n_best
    return resort_reverse_index


def cast_features_for_upload(src, model) -> np.ndarray:
    """bf16 host->device upload of float speech features when the encoder
    computes in bfloat16. The encoder casts inputs to its compute dtype at
    its first op, so rounding on the host instead (one f32->bf16
    round-to-nearest-even either way) is bit-identical downstream while
    halving the upload bytes — the dominant transfer on remote TPU
    topologies. Int token ids (MT) and f32-compute models pass through."""
    if src is None or getattr(src, "dtype", None) != np.float32:
        return src
    import jax.numpy as jnp
    import ml_dtypes

    if getattr(getattr(model, "encoder", None), "dtype", None) == jnp.bfloat16:
        return src.astype(ml_dtypes.bfloat16)
    return src


def adjust_mask_size(mask: Optional[np.ndarray], batch_size: int,
                     hyp_len: int) -> Optional[np.ndarray]:
    """Trim or zero-pad a (batch, len) mask to (batch_size, hyp_len)
    (joeynmt/helpers.py adjust_mask_size)."""
    if mask is None:
        return None
    if mask.shape[1] < hyp_len:
        pad = np.zeros((mask.shape[0], hyp_len - mask.shape[1]), dtype=mask.dtype)
        mask = np.concatenate([mask, pad], axis=1)
    elif mask.shape[1] > hyp_len:
        mask = mask[:, :hyp_len]
    assert mask.shape == (batch_size, hyp_len), (mask.shape, (batch_size, hyp_len))
    return mask


def save_hypothese(output_path: Path, hypotheses: List[str], n_best: int = 1) -> None:
    """Save hypotheses to file; n-best goes to per-rank files
    (joeynmt/helpers.py:136-151)."""
    output_path = Path(output_path)
    if n_best > 1:
        for n in range(n_best):
            write_list_to_file(
                output_path.parent / f"{output_path.stem}-{n}.{output_path.suffix}",
                [hypotheses[i] for i in range(n, len(hypotheses), n_best)],
            )
    else:
        write_list_to_file(output_path, hypotheses)


def pad_2d(arr: np.ndarray, length: int, pad_value: Union[int, float], axis: int = 1) -> np.ndarray:
    """Pad array along `axis` up to `length` with `pad_value`."""
    if arr.shape[axis] >= length:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, length - arr.shape[axis])
    return np.pad(arr, widths, constant_values=pad_value)
