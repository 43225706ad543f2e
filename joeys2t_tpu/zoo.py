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
HF_ORG = "may-ohta"  # reference hubconf.py:93 snapshot_download repo owner

# name -> (snapshot base name, checkpoint file, cfg file, primary source).
# Base names, ckpt/cfg file names and per-entry primary source mirror the
# reference hubconf.py:110-290 (iwslt14_prompt is huggingface-first there,
# everything else Heidelberg-URL-first); the other source is the fallback.
ENTRIES = {
    "iwslt14_prompt": ("iwslt14_prompt", "avg5.ckpt", "config.yaml", "hf"),
    "transformer_iwslt14_deen_bpe": (
        "transformer_iwslt14_deen_bpe", "best.ckpt", "config_v2.3.yaml",
        "remote"),
    "rnn_iwslt14_deen_bpe": (
        "rnn_iwslt14_deen_bpe", "best.ckpt", "config_v2.3.yaml", "remote"),
    "wmt14_deen": ("wmt14_deen", "avg5.ckpt", "config.yaml", "remote"),
    "wmt14_ende": ("wmt14_ende", "avg5.ckpt", "config.yaml", "remote"),
    "jparacrawl_jaen": ("jparacrawl_jaen", "avg5.ckpt", "config.yaml",
                        "remote"),
    "jparacrawl_enja": ("jparacrawl_enja", "avg5.ckpt", "config.yaml",
                        "remote"),
    "librispeech_960h_en_asr": ("librispeech960h", "avg10.ckpt",
                                "config.yaml", "remote"),
    "librispeech_100h_en_asr": ("librispeech100h", "avg10.ckpt",
                                "config.yaml", "remote"),
    "mustc_v2_en_asr": ("mustc_asr", "avg10.ckpt", "config.yaml", "remote"),
    "mustc_v2_ende_mt": ("mustc_mt", "avg5.ckpt", "config.yaml", "remote"),
    "mustc_v2_ende_st": ("mustc_st", "avg10.ckpt", "config.yaml", "remote"),
}


def _cache_dir() -> Path:
    d = Path.home() / ".cache" / "joeys2t_tpu" / "zoo"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _snapshot_complete(snapshot: Path, cfg_name: str) -> bool:
    """A usable cached snapshot has the entry's config plus a checkpoint —
    `any(iterdir())` is not enough: a failed download can leave metadata or
    partial files behind, which must not count as a cache hit."""
    return (snapshot.is_dir() and (snapshot / cfg_name).is_file()
            and any(snapshot.glob("*.ckpt")))


def _download_and_extract(name: str) -> Path:
    """Materialize the snapshot dir for a zoo entry, attempting the entry's
    primary source first and the other as fallback (reference
    hubconf.py:41-107 `_download_and_extract` + :80-107
    `_load_from_huggingface`): Heidelberg URL tarball <-> huggingface-hub
    snapshot (repo ``may-ohta/<base>``).

    Each source downloads into a fresh staging dir that is atomically
    renamed to the cache path only on success, so a transient transport
    failure can never poison the cache with a half-written snapshot."""
    base, _, cfg_name, primary = ENTRIES[name]
    target = _cache_dir() / name
    if _snapshot_complete(target, cfg_name):
        return target
    if target.exists():
        logger.warning("Discarding incomplete cached snapshot %s", target)
        shutil.rmtree(target, ignore_errors=True)

    sources = (("hf", "remote") if primary == "hf" else ("remote", "hf"))
    errors = []
    for source in sources:
        fetch = (_fetch_remote_tarball if source == "remote"
                 else _fetch_hf_snapshot)
        staging = _cache_dir() / f"_staging_{name}"
        shutil.rmtree(staging, ignore_errors=True)
        try:
            fetch(base, staging)
            if not _snapshot_complete(staging, cfg_name):
                raise RuntimeError(
                    f"snapshot is missing {cfg_name} or a *.ckpt file")
            staging.replace(target)
            return target
        except Exception as e:  # noqa: BLE001 — collect, try next source
            errors.append(f"{source}: {e}")
            logger.warning("zoo source %s failed for %s: %s", source, name, e)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    raise RuntimeError(
        f"Could not fetch '{name}' from any source ({'; '.join(errors)}). "
        f"In offline environments, place the extracted snapshot at {target} "
        f"manually, or use load('local', model_dir=...).")


def _fetch_hf_snapshot(base: str, target: Path) -> None:
    """huggingface_hub.snapshot_download into the cache dir (reference
    hubconf.py:91-97)."""
    from huggingface_hub import snapshot_download

    snapshot_download(repo_id=f"{HF_ORG}/{base}", local_dir=target)
    assert target.is_dir() and any(target.iterdir()), target


def _fetch_remote_tarball(base: str, target: Path) -> None:
    """Heidelberg-URL tarball download + safe extraction."""
    name = target.name
    archive = f"{base}.tar.gz"
    url = f"{BASE_URL}/{archive}"
    tar_path = _cache_dir() / archive
    logger.info("Downloading %s ...", url)
    import urllib.request

    urllib.request.urlretrieve(url, tar_path.as_posix())

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
        kwargs.setdefault("cfg_file", ENTRIES[name][2])
    return load_model_dir(snapshot, **kwargs)


# named entry points (hubconf.py-style)
def __getattr__(name):
    if name in ENTRIES:
        return lambda **kwargs: load(name, **kwargs)
    raise AttributeError(name)
