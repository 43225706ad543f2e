# coding: utf-8
"""
Pretrained model zoo (counterpart of hubconf.py:110-290).

Named entries resolve to a local snapshot dir (downloaded + extracted on
first use, with torch-format checkpoints converted via joeys2t_tpu.convert).
Usage:
    from joeys2t_tpu.zoo import load
    model = load("librispeech_960h_en_asr")          # downloads if needed
    model = load("local", model_dir="path/to/dir")   # local snapshot
    model.generate(["audio.wav"])
"""
import shutil
import tarfile
from pathlib import Path
from typing import Optional

from joeys2t_tpu.hub_interface import TranslatorHubInterface, load_model_dir
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)

BASE_URL = "https://www.cl.uni-heidelberg.de/statnlpgroup/joeynmt2"

# name -> (archive name, checkpoint file inside the snapshot)
ENTRIES = {
    "iwslt14_prompt": ("iwslt14_prompt.tar.gz", "best.ckpt"),
    "transformer_iwslt14_deen_bpe": ("transformer_iwslt14_deen_bpe.tar.gz", "best.ckpt"),
    "rnn_iwslt14_deen_bpe": ("rnn_iwslt14_deen_bpe.tar.gz", "best.ckpt"),
    "wmt14_deen": ("wmt14_deen.tar.gz", "best.ckpt"),
    "wmt14_ende": ("wmt14_ende.tar.gz", "best.ckpt"),
    "jparacrawl_jaen": ("jparacrawl_jaen.tar.gz", "best.ckpt"),
    "jparacrawl_enja": ("jparacrawl_enja.tar.gz", "best.ckpt"),
    "librispeech_960h_en_asr": ("librispeech960h.tar.gz", "avg10.ckpt"),
    "librispeech_100h_en_asr": ("librispeech100h.tar.gz", "avg5.ckpt"),
    "mustc_v2_en_asr": ("mustc_asr.tar.gz", "avg5.ckpt"),
    "mustc_v2_ende_mt": ("mustc_mt.tar.gz", "avg5.ckpt"),
    "mustc_v2_ende_st": ("mustc_st.tar.gz", "avg5.ckpt"),
}


def _cache_dir() -> Path:
    d = Path.home() / ".cache" / "joeys2t_tpu" / "zoo"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _download_and_extract(name: str) -> Path:
    """Download + extract a zoo archive (joeynmt/hubconf.py:41-107)."""
    archive, _ = ENTRIES[name]
    target = _cache_dir() / name
    if target.is_dir() and any(target.iterdir()):
        return target

    url = f"{BASE_URL}/{archive}"
    tar_path = _cache_dir() / archive
    logger.info("Downloading %s ...", url)
    import urllib.request

    try:
        urllib.request.urlretrieve(url, tar_path.as_posix())
    except Exception as e:
        raise RuntimeError(
            f"Could not download {url} ({e}). In offline environments, place "
            f"the extracted snapshot at {target} manually, or use "
            f"load('local', model_dir=...).") from e

    tmp = _cache_dir() / f"_extract_{name}"
    with tarfile.open(tar_path) as tar:
        # 'data' filter rejects absolute/parent-escaping member paths
        # (CVE-2007-4559 path traversal); fall back to a manual check on
        # Pythons without extraction filters (<3.12 backports vary)
        try:
            tar.extractall(tmp, filter="data")
        except TypeError:
            import os

            root = str(tmp.resolve()) + os.sep
            for member in tar.getmembers():
                if member.issym() or member.islnk():
                    raise RuntimeError(
                        f"archive contains a link member: {member.name}")
                dest = (tmp / member.name).resolve()
                if not str(dest).startswith(root):
                    raise RuntimeError(
                        f"archive member escapes extraction dir: {member.name}")
            tar.extractall(tmp)
    # archives contain one top-level dir
    inner = next(p for p in tmp.iterdir() if p.is_dir())
    shutil.move(inner.as_posix(), target.as_posix())
    shutil.rmtree(tmp, ignore_errors=True)
    tar_path.unlink(missing_ok=True)
    return target


def _ensure_native_ckpt(model_dir: Path, ckpt_name: str) -> None:
    """Convert a torch-format checkpoint into this framework's format once."""
    ckpt = model_dir / ckpt_name
    if not ckpt.exists():
        candidates = sorted(model_dir.glob("*.ckpt"))
        assert candidates, f"no checkpoint found in {model_dir}"
        ckpt = candidates[0]
    import pickle

    try:  # already native?
        with ckpt.open("rb") as f:
            head = f.read(2)
        if head == b"\x80\x05" or head[:1] == b"\x80":
            with ckpt.open("rb") as f:
                obj = pickle.load(f)
            if isinstance(obj, dict) and "model_state" in obj and not hasattr(
                    next(iter(_leaves(obj["model_state"]))), "cpu"):
                return  # native numpy checkpoint
    except Exception:
        pass

    from joeys2t_tpu.checkpoints import save_checkpoint
    from joeys2t_tpu.convert import load_torch_checkpoint

    logger.info("Converting torch checkpoint %s ...", ckpt)
    native = load_torch_checkpoint(ckpt)
    save_checkpoint(ckpt, native)


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def load(name: str, model_dir: Optional[str] = None,
         ckpt_name: Optional[str] = None, **kwargs) -> TranslatorHubInterface:
    """Load a named zoo model (or `local` with model_dir)."""
    if name == "local":
        assert model_dir is not None, "load('local') requires model_dir"
        snapshot = Path(model_dir)
        if ckpt_name:
            _ensure_native_ckpt(snapshot, ckpt_name)
    else:
        assert name in ENTRIES, \
            f"Unknown model {name}. Available: {sorted(ENTRIES)} or 'local'."
        snapshot = _download_and_extract(name)
        _ensure_native_ckpt(snapshot, ENTRIES[name][1])
    return load_model_dir(snapshot, **kwargs)


# named entry points (hubconf.py-style)
def __getattr__(name):
    if name in ENTRIES:
        return lambda **kwargs: load(name, **kwargs)
    raise AttributeError(name)
