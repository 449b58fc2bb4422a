"""Grain input pipeline.

Replaces the reference's torch DataLoader + DistributedSampler
(inference.py:264-269) with grain: multi-worker CPU rendering of the
19-channel condition panoramas, per-JAX-process sharding, deterministic
shuffling, and dict batching (string prompts collect into lists).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np


class _ClipSource:
    """Random-access source over valid clip end-indices of a
    NuScenesVideoDataset."""

    def __init__(self, dataset):
        self.dataset = dataset
        t = dataset.queue_length
        self.valid = [
            i for i in range(len(dataset)) if dataset._frame_indices(i)
        ]

    def __len__(self) -> int:
        return len(self.valid)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.dataset[self.valid[idx]]


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    from panacea_tpu.data.nuscenes.dataset import collate

    return collate(samples)


def make_dataloader(
    dataset,
    batch_size: int = 1,
    shuffle: bool = False,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    shard_by_process: bool = True,
) -> Iterator[Dict[str, Any]]:
    """Yields collated (B, T, ...) batches; sharded across jax processes like
    the reference's DistributedSampler."""
    import grain.python as grain
    import jax

    source = _ClipSource(dataset)
    if shard_by_process and jax.process_count() > 1:
        shard = grain.ShardOptions(
            shard_index=jax.process_index(), shard_count=jax.process_count(),
            drop_remainder=True,
        )
    else:
        shard = grain.NoSharding()

    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=shard,
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )

    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[],
        worker_count=worker_count,
    )

    def batches():
        buf: List[Dict[str, Any]] = []
        for item in loader:
            buf.append(item)
            if len(buf) == batch_size:
                yield _collate(buf)
                buf = []
        if buf:
            yield _collate(buf)

    return batches()
