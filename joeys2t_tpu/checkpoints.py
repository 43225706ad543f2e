# coding: utf-8
"""
Checkpointing: save/load with best-K retention, symlinks, and averaging
(counterpart of joeynmt/training.py:149-309 and
scripts/average_checkpoints.py).

Checkpoint = pickled dict with the same logical contents as the reference:
  model_state (param pytree), optimizer_state, scheduler_state,
  train_iter_state (sampler RNG state), stats_state.
"""
import heapq
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from joeys2t_tpu.helpers import symlink_update
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: Path, state: Dict[str, Any]) -> None:
    """Write a checkpoint dict (device arrays are pulled to host)."""
    state = dict(state)
    for key in ("model_state", "optimizer_state"):
        if state.get(key) is not None:
            state[key] = _to_numpy_tree(state[key])
    path = Path(path)
    tmp = path.with_suffix(".tmp")
    with tmp.open("wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)  # atomic on POSIX


def load_checkpoint(path: Path) -> Dict[str, Any]:
    """joeynmt/helpers.py load_checkpoint equivalent."""
    path = Path(path)
    assert path.is_file(), f"Checkpoint {path} not found."
    with path.open("rb") as f:
        return pickle.load(f)


def delete_ckpt(path: Path) -> None:
    try:
        logger.info("delete %s", path.as_posix())
        path.unlink()
    except FileNotFoundError as e:
        logger.warning("Wanted to delete old checkpoint %s but file does not exist. (%s)",
                       path, e)


class CheckpointManager:
    """Best-K heap + latest/best symlinks (joeynmt/training.py:149-218)."""

    def __init__(self, model_dir: Path, keep_best_ckpts: int = 5,
                 minimize_metric: bool = True):
        self.model_dir = Path(model_dir)
        self.keep_best_ckpts = keep_best_ckpts
        self.minimize_metric = minimize_metric
        self.ckpt_queue: List[Tuple[float, Path]] = []  # heap

    def save(self, steps: int, state: Dict[str, Any], new_best: bool,
             score: float) -> Path:
        model_path = self.model_dir / f"{steps}.ckpt"
        save_checkpoint(model_path, state)
        logger.info("Checkpoint saved in %s.", model_path)

        symlink_target = Path(f"{steps}.ckpt")
        last_path = self.model_dir / "latest.ckpt"
        prev_path = symlink_update(symlink_target, last_path)
        best_path = self.model_dir / "best.ckpt"
        if new_best:
            prev_path = symlink_update(symlink_target, best_path)
            assert best_path.resolve().stem == str(steps)

        to_delete = None
        if not (isinstance(score, float) and np.isnan(score)) \
                and self.keep_best_ckpts > 0:
            # min-heap over a "badness-last" key: for minimized metrics the
            # worst checkpoint has the LARGEST score, so negate it — then
            # heappushpop uniformly evicts the worst of the K+1, keeping the
            # genuinely best K on disk in both directions (no private
            # heapq._heapify_max APIs, no best-ckpt eviction by a worse
            # newcomer).
            key = -score if self.minimize_metric else score
            if len(self.ckpt_queue) < self.keep_best_ckpts:
                heapq.heappush(self.ckpt_queue, (key, model_path))
            else:
                to_delete = heapq.heappushpop(self.ckpt_queue, (key, model_path))

            if to_delete is not None and to_delete[1] != model_path:
                # (if the new ckpt itself is the worst it stays on disk as
                # the latest.ckpt target; the symlink-rotation cleanup below
                # removes it once latest moves on)
                if to_delete[1].stem != best_path.resolve().stem:
                    delete_ckpt(to_delete[1])  # don't delete the best ckpt

            assert len(self.ckpt_queue) <= self.keep_best_ckpts

        # remove old symlink target if it fell out of the queue — outside the
        # scored branch so the score=nan final save (interrupt/end-of-train)
        # also cleans up a deferred worst-of-K+1 newcomer instead of leaving
        # it on disk forever
        if self.keep_best_ckpts > 0 and prev_path is not None:
            prev = self.model_dir / prev_path.name \
                if not Path(prev_path).is_absolute() else Path(prev_path)
            if prev.stem not in [c[1].stem for c in self.ckpt_queue] \
                    and prev.stem != best_path.resolve().stem \
                    and prev.stem != str(steps) and prev.exists():
                delete_ckpt(prev)
        return model_path


def average_checkpoints(paths: List[Path]) -> Dict[str, Any]:
    """Uniform parameter averaging over checkpoints
    (scripts/average_checkpoints.py:17-73)."""
    assert len(paths) > 0
    avg: Optional[Dict] = None
    base = None
    for path in paths:
        ckpt = load_checkpoint(path)
        params = ckpt["model_state"]
        flat = jax.tree.leaves(params)
        if avg is None:
            base = ckpt
            avg = [np.asarray(p, dtype=np.float64) for p in flat]
        else:
            for i, p in enumerate(flat):
                avg[i] = avg[i] + np.asarray(p, dtype=np.float64)
    n = len(paths)
    avg = [(a / n) for a in avg]
    treedef = jax.tree.structure(base["model_state"])
    orig_leaves = jax.tree.leaves(base["model_state"])
    new_leaves = [a.astype(np.asarray(o).dtype) for a, o in zip(avg, orig_leaves)]
    base["model_state"] = jax.tree.unflatten(treedef, new_leaves)
    # averaged checkpoints carry no optimizer state (fresh start semantics)
    base["optimizer_state"] = None
    base["scheduler_state"] = None
    base["train_iter_state"] = None
    return base


def partial_load(params: Dict, ckpt_params: Dict, prefix: str) -> Dict:
    """Load a sub-tree (`encoder`/`decoder`) from another checkpoint
    (joeynmt/training.py:294-309 load_encoder/load_decoder).

    Matches the reference's `load_state_dict(..., strict=False)` semantics:
    leaves are merged BY PATH — paths present in both load from the
    checkpoint, paths only in the target keep their init (missing), paths
    only in the checkpoint are ignored (unexpected), and a shape mismatch
    on a matching path raises (torch errors on size mismatch even with
    strict=False). This is what makes the reference's documented ST recipe
    work: mustc_st.yaml:68 loads a 16-layer ASR encoder into a 12-layer ST
    encoder — layers 0-11 load, 12-15 are ignored."""
    if prefix not in ckpt_params:
        logger.warning("No `%s` sub-tree found in the checkpoint.", prefix)
        return params

    stats = {"loaded": 0, "missing": 0, "unexpected": 0}

    def merge(target, source, path):
        if not isinstance(target, dict):
            t_shape = getattr(target, "shape", None)
            s_shape = getattr(source, "shape", None)
            if t_shape != s_shape:
                raise ValueError(
                    f"partial_load: shape mismatch at {path}: "
                    f"checkpoint {s_shape} vs model {t_shape}")
            stats["loaded"] += 1
            return source
        out = {}
        for k, v in target.items():
            if isinstance(source, dict) and k in source:
                out[k] = merge(v, source[k], f"{path}.{k}")
            else:
                stats["missing"] += 1
                out[k] = v
        if isinstance(source, dict):
            stats["unexpected"] += sum(1 for k in source if k not in target)
        return out

    new = dict(params)
    new[prefix] = merge(dict(params[prefix]), ckpt_params[prefix], prefix)
    logger.info(
        "partial_load(%s): %d tensors loaded, %d kept at init (missing in "
        "ckpt), %d ckpt entries ignored (not in model)", prefix,
        stats["loaded"], stats["missing"], stats["unexpected"])
    return new


# ------------------------------------------------------- sharded (orbax)
def save_sharded(directory: Path, params) -> None:
    """Save (possibly sharded) params with orbax — every process writes its
    own shards, no host gather. For multi-host / model-parallel training
    where pickling a gathered copy (save_checkpoint) would not scale; the
    logical checkpoint layout stays the pickle dict for everything else."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory, params, force=True)


def load_sharded(directory: Path, template) -> Dict:
    """Restore params saved by save_sharded. ``template`` is a pytree of
    arrays or jax.ShapeDtypeStruct(+sharding) giving the target placement —
    pass sharded abstract arrays to restore directly onto a mesh."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(directory, template)


def check_params_structure(expected, loaded, _path=""):
    """Compare a loaded model_state tree against the built model's param
    structure and raise a readable error on mismatch (flax's own failure
    mode is a cryptic missing-param exception deep inside apply).

    Special-cases the conformer-conversion foot-gun: converted reference
    conformer checkpoints carry ``batch_norm_*`` tensors that only exist
    when the model is built with ``conv_norm: batchnorm``."""
    exp_keys = set(expected) if isinstance(expected, dict) else None
    got_keys = set(loaded) if isinstance(loaded, dict) else None
    if (exp_keys is None) != (got_keys is None):
        kind = ("a parameter tensor but the checkpoint has a sub-module"
                if exp_keys is None else
                "a sub-module but the checkpoint has a bare tensor")
        raise ValueError(
            f"Checkpoint does not match the built model at '{_path or '/'}': "
            f"the model expects {kind} here.")
    if exp_keys == got_keys:
        if exp_keys:
            for k in exp_keys:
                check_params_structure(expected[k], loaded[k], f"{_path}/{k}")
        return
    missing = sorted((exp_keys or set()) - (got_keys or set()))
    extra = sorted((got_keys or set()) - (exp_keys or set()))
    # extra leaf tensors are harmless (flax apply ignores them — e.g. constant
    # PE buffers carried by old conversions), but an extra *subtree* is a
    # whole unused module (e.g. a 6-layer checkpoint loaded into a 4-layer
    # config) — that is an architecture mismatch, not clutter
    extra_subtrees = [k for k in extra if isinstance(loaded[k], dict)]
    if not missing and not extra_subtrees:
        logger.warning("Checkpoint carries unused entries at '%s': %s",
                       _path or "/", extra)
        if exp_keys:
            for k in exp_keys:
                check_params_structure(expected[k], loaded[k], f"{_path}/{k}")
        return
    hint = ""
    if any("batch_norm" in k for k in extra):
        hint = (" Hint: the checkpoint carries conformer BatchNorm tensors "
                "— set `conv_norm: batchnorm` in the encoder config to load "
                "a converted reference conformer.")
    elif any("batch_norm" in k for k in missing):
        hint = (" Hint: the model was built with `conv_norm: batchnorm` but "
                "the checkpoint has no BatchNorm tensors — drop the setting "
                "or convert a conformer checkpoint.")
    if missing:
        raise ValueError(
            f"Checkpoint does not match the built model at '{_path or '/'}': "
            f"missing {missing}, unexpected {extra or '[]'}.{hint}")
    raise ValueError(
        f"Checkpoint does not match the built model at '{_path or '/'}': "
        f"it carries whole unused sub-modules {extra_subtrees} (e.g. more "
        f"layers than the config builds) — trained weights would be "
        f"silently ignored.{hint}")
