# coding: utf-8
"""
Samplers and batch samplers (counterparts of joeynmt/helpers_for_ddp.py:244-391
and joeynmt/datasets.py:1164-1295), torch-free.

Randomness uses numpy Generators; their state is serializable for
checkpoint/resume (the reference checkpoints the torch generator state,
joeynmt/training.py:175). Data-parallel sharding of eval batches happens at
the device level via pjit, so no rank-strided DistributedSubsetSampler is
needed on a single host; ``ShardedSubsetSampler`` provides the rank-strided
behavior for multi-host (process-level) data loading.
"""
import math
from typing import Iterator, List, Optional

import numpy as np

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class RandomSubsetSampler:
    """Seeded subset sampling + optional shuffling
    (joeynmt/helpers_for_ddp.py:345-391). Subset indices stay sorted; the
    permutation happens at iteration time only."""

    def __init__(self, data_source, shuffle: bool, seed: int = 42):
        self.data_source = data_source
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    @property
    def num_samples(self) -> int:
        return len(self.data_source.indices)

    def __iter__(self) -> Iterator[int]:
        indices = self.data_source.indices
        if self.shuffle:
            perm = self.rng.permutation(len(indices))
            return iter([indices[i] for i in perm])
        return iter(indices)

    def __len__(self) -> int:
        return self.num_samples

    def _subsample(self):
        """Random subset; indices kept sorted (no permutation)."""
        orig_len = len(self.data_source)
        subset_len = self.data_source.random_subset
        if 0 < subset_len < orig_len:
            subset = self.rng.permutation(orig_len)[:subset_len].tolist()
            self.data_source.indices = sorted(subset)
            assert len(subset) == self.num_samples

    def reset(self):
        self.data_source.reset_indices()

    def set_seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)
        self._subsample()

    def get_state(self):
        return self.rng.bit_generator.state

    def set_state(self, state) -> None:
        self.rng.bit_generator.state = state


class ShardedSubsetSampler(RandomSubsetSampler):
    """Rank-strided sharding for multi-host data loading
    (joeynmt/helpers_for_ddp.py:244-343): drop to divisible, stride by rank."""

    def __init__(self, data_source, shuffle: bool, seed: int = 42,
                 num_replicas: Optional[int] = None, rank: Optional[int] = None,
                 drop_last: bool = True):
        super().__init__(data_source, shuffle, seed)
        if num_replicas is None or rank is None:
            import jax

            num_replicas = jax.process_count()
            rank = jax.process_index()
        assert 0 <= rank < num_replicas, (rank, num_replicas)
        self.num_replicas = num_replicas
        self.rank = rank
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[int]:
        indices = self.data_source.indices
        if self.shuffle:
            perm = self.rng.permutation(len(indices))
            indices = [indices[i] for i in perm]
        if len(indices) % self.num_replicas != 0 and not self.drop_last:
            raise RuntimeError("`len(dataset)` must be divisible by `world_size`.")
        total = (len(self.data_source.indices) // self.num_replicas) * self.num_replicas
        indices = indices[:total]
        self.data_source.indices = indices  # reference resets after dropping
        per_replica = indices[self.rank:total:self.num_replicas]
        assert len(per_replica) == math.ceil(total / self.num_replicas) or total == 0
        return iter(per_replica)


class SentenceBatchSampler:
    """Yield batches of indices by sentence count; drops None-filtered items
    (joeynmt/datasets.py:1164-1246)."""

    def __init__(self, sampler, batch_size: int, drop_last: bool, seed: int):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.seed = seed

    @property
    def num_samples(self) -> int:
        assert self.sampler.data_source.indices is not None
        return len(self.sampler.data_source.indices)

    def __iter__(self) -> Iterator[List[int]]:
        batch = []
        d = self.sampler.data_source
        for idx in self.sampler:
            _, src, trg = d[idx]
            if src is not None:  # otherwise drop instance
                batch.append(idx)
                if len(batch) >= self.batch_size:
                    yield batch
                    batch = []
        if len(batch) > 0:
            if not self.drop_last:
                yield batch
            else:
                logger.warning("Drop indices %s.", batch)

    def __len__(self) -> int:
        if self.drop_last:
            return self.num_samples // self.batch_size
        return (self.num_samples + self.batch_size - 1) // self.batch_size

    def set_seed(self, seed: int) -> None:
        assert seed is not None, seed
        self.sampler.data_source.seed = seed
        self.sampler.set_seed(seed)
        if self.num_samples < len(self.sampler.data_source):
            logger.info("Sample random subset from %s data: n=%d, seed=%d",
                        self.sampler.data_source.split, self.num_samples, seed)

    def reset(self) -> None:
        self.sampler.reset()

    def get_state(self):
        return self.sampler.get_state()

    def set_state(self, state) -> None:
        if state is not None:
            self.sampler.set_state(state)


class TokenBatchSampler(SentenceBatchSampler):
    """Batch by token count incl. padding, no bucketing
    (joeynmt/datasets.py:1249-1295)."""

    def __iter__(self) -> Iterator[List[int]]:
        batch = []
        max_tokens = 0
        d = self.sampler.data_source
        for idx in self.sampler:
            _, src, trg = d[idx]
            if src is not None:
                src_len = 0 if src is None else len(src)
                trg_len = 0 if trg is None else len(trg)
                n_tokens = 0 if src_len == 0 else max(src_len + 1, trg_len + 1)
                batch.append(idx)
                if n_tokens > max_tokens:
                    max_tokens = n_tokens
                if max_tokens * len(batch) >= self.batch_size:
                    yield batch
                    batch = []
                    max_tokens = 0
        if len(batch) > 0:
            if not self.drop_last:
                yield batch
            else:
                logger.warning("Drop indices %s.", batch)

    def __len__(self):
        raise NotImplementedError
