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
