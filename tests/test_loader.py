"""Grain dataloader tests."""

import numpy as np
import pytest

from panacea_tpu.data.loader import make_dataloader
from panacea_tpu.data.nuscenes.dataset import NuScenesVideoDataset
from panacea_tpu.data.nuscenes.synthetic import (
    make_synthetic_infos,
    synthetic_image_loader,
)


def make_ds(t=2, frames=6):
    infos = make_synthetic_infos(num_frames=frames, num_boxes=3, seed=0)
    return NuScenesVideoDataset(
        infos=infos, queue_length=t, final_dim=(32, 64),
        image_loader=synthetic_image_loader, seed=0,
    )


def test_loader_yields_batches():
    ds = make_ds()
    batches = list(make_dataloader(ds, batch_size=2, num_epochs=1))
    assert len(batches) >= 2
    b = batches[0]
    assert b["jpg"].shape == (2, 2, 32, 384, 3)
    assert len(b["txt"]) == 2


def test_datamodule_from_config():
    """Config-driven data module (sgm/data/dataset.py DataModuleFromConfig
    equivalent): per-split dataset configs resolve through the registry,
    loaders yield collated batches; absent splits raise."""
    from panacea_tpu.data.loader import DataModuleFromConfig

    cfg = {"target": "test_loader.make_ds", "params": {"t": 2, "frames": 6}}
    dm = DataModuleFromConfig(batch_size=2, train=cfg, validation=cfg,
                              num_workers=0)
    b = next(dm.train_dataloader())
    assert b["jpg"].shape == (2, 2, 32, 384, 3)
    bv = next(dm.val_dataloader())
    assert bv["jpg"].shape == (2, 2, 32, 384, 3)
    with pytest.raises(KeyError):
        next(dm.test_dataloader())
    # the reference alias resolves to it
    from panacea_tpu.registry import resolve_target

    assert resolve_target(
        "sgm.data.dataset.DataModuleFromConfig") is DataModuleFromConfig


def test_loader_deterministic_with_seed():
    ds = make_ds()
    a = next(make_dataloader(ds, batch_size=1, shuffle=True, seed=5))
    b = next(make_dataloader(ds, batch_size=1, shuffle=True, seed=5))
    np.testing.assert_array_equal(a["jpg"], b["jpg"])


@pytest.mark.slow
def test_loader_with_workers():
    ds = make_ds()
    batches = list(
        make_dataloader(ds, batch_size=1, num_epochs=1, worker_count=2)
    )
    assert len(batches) == 5  # 6 frames, queue 2 -> 5 valid clips
