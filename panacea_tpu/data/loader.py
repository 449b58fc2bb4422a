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


class DataModuleFromConfig:
    """Config-driven data module (reference sgm/data/dataset.py:67-182,
    DataModuleFromConfig): per-split ``{target, params}`` dataset configs,
    lazily instantiated in ``setup()``; ``train/val/test/predict_dataloader``
    yield collated batches via the grain pipeline (train shuffles, val/test
    follow the shuffle flags, everything shards across jax processes in
    place of the torch DistributedSampler)."""

    def __init__(self, batch_size, train=None, validation=None, test=None,
                 predict=None, wrap=False, num_workers=None,
                 shuffle_test_loader=False, use_worker_init_fn=False,
                 shuffle_val_dataloader=False, seed: int = 0):
        self.batch_size = batch_size
        self.num_workers = (num_workers if num_workers is not None
                            else batch_size * 2)
        self.seed = seed
        self.dataset_configs: Dict[str, Any] = {}
        self._shuffle = {"train": True, "validation": shuffle_val_dataloader,
                         "test": shuffle_test_loader, "predict": False}
        for name, cfg in (("train", train), ("validation", validation),
                          ("test", test), ("predict", predict)):
            if cfg is not None:
                self.dataset_configs[name] = cfg
        self.datasets: Dict[str, Any] = {}

    def setup(self, stage=None):
        from panacea_tpu.registry import instantiate_from_config

        self.datasets = {k: instantiate_from_config(cfg)
                         for k, cfg in self.dataset_configs.items()}

    def _loader(self, split: str):
        if split not in self.dataset_configs:
            raise KeyError(
                f"no '{split}' dataset was configured "
                f"(configured splits: {sorted(self.dataset_configs)})")
        if split not in self.datasets:
            from panacea_tpu.registry import instantiate_from_config

            # instantiate lazily, only the missing split — a full setup()
            # here would rebuild (and orphan) datasets already in use
            self.datasets[split] = instantiate_from_config(
                self.dataset_configs[split])
        return make_dataloader(
            self.datasets[split], batch_size=self.batch_size,
            shuffle=self._shuffle[split], seed=self.seed,
            worker_count=self.num_workers)

    def train_dataloader(self):
        return self._loader("train")

    def val_dataloader(self):
        return self._loader("validation")

    def test_dataloader(self):
        return self._loader("test")

    def predict_dataloader(self):
        return self._loader("predict")
