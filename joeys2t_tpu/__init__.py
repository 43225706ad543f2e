"""JoeyS2T-TPU: a TPU-native (JAX/XLA/Pallas) speech-to-text and MT framework.

A ground-up rebuild of the capabilities of JoeyS2T (joeynmt v2.3 + S2T
extensions) designed for TPU hardware: functional flax models, jit-compiled
train/decode steps with static shapes, KV-cached beam search, pjit/shard_map
data parallelism over a device mesh, and JAX/Pallas kernels for the audio
front end and attention hot paths.

Behavioral contracts kept from the reference (cited per-module):
  - YAML config schema (same keys/defaults as joeynmt/config.py)
  - special symbol ids: unk=0 pad=1 bos=2 eos=3 (+ optional sep, lang_tags)
  - teacher-forcing shift, loss interpolation (1-w)*xent + w*ctc
  - GNMT length penalty, corpus-level WER, checkpoint best-K semantics
"""

__version__ = "0.1.0"

__all__ = [
    "load_config", "parse_global_args", "train", "test", "translate",
    "predict", "prepare", "search", "load_model_dir",
]


def __getattr__(name):
    """Lazy top-level API (keeps `import joeys2t_tpu` light)."""
    if name in ("load_config", "parse_global_args"):
        from joeys2t_tpu import config as _m

        return getattr(_m, name)
    if name == "train":
        from joeys2t_tpu.training import train as _f

        return _f
    if name in ("test", "translate", "predict", "prepare"):
        from joeys2t_tpu import prediction as _m

        return getattr(_m, name)
    if name == "search":
        from joeys2t_tpu.search import search as _f

        return _f
    if name == "load_model_dir":
        from joeys2t_tpu.hub_interface import load_model_dir as _f

        return _f
    raise AttributeError(name)
