# coding: utf-8
"""
Embeddings (joeynmt/embeddings.py:20-128) as a flax module.
"""
import math
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class Embeddings(nn.Module):
    """Token embedding lookup with optional sqrt(d) scaling
    (joeynmt/embeddings.py:55-64)."""

    vocab_size: int
    embedding_dim: int = 64
    scale: bool = False
    padding_idx: int = 1
    freeze: bool = False  # honored by the optimizer mask, not here
    dtype: Any = jnp.float32

    def setup(self):
        self.lut = nn.Embed(num_embeddings=self.vocab_size, features=self.embedding_dim,
                            dtype=self.dtype, name="lut")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        emb = self.lut(x)
        if self.scale:
            emb = emb * math.sqrt(self.embedding_dim)
        return emb

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        """Project hidden states onto the (tied) embedding table -> logits."""
        return self.lut.attend(x)


def load_pretrained_embeddings(embed_path: Path, vocab,
                               embedding_dim: int) -> np.ndarray:
    """Parse a GloVe/word2vec-style text file into a partial embedding matrix
    update (joeynmt/embeddings.py:74-128). Returns (vocab_len, dim) array of
    NaN except at rows found in the file; callers merge it into initialized
    params with np.where(~isnan)."""
    table = np.full((len(vocab), embedding_dim), np.nan, dtype=np.float32)
    with Path(embed_path).open("r", encoding="utf-8", errors="ignore") as f_embed:
        vocab_size, d = map(int, f_embed.readline().split())
        assert embedding_dim == d, "Embedding dimension doesn't match."
        loaded = 0
        for line in f_embed.readlines():
            tokens = line.rstrip().split(" ")
            if tokens[0] in vocab.specials or not vocab.is_unk(tokens[0]):
                idx = vocab.lookup(tokens[0])
                if idx < len(vocab):
                    table[idx] = np.array([float(t) for t in tokens[1:]], dtype=np.float32)
                    loaded += 1
    logger.warning("Loaded %d of %d pre-trained embedding vectors.", loaded, vocab_size)
    return table
