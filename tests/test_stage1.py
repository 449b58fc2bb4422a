"""Stage-1 (single-frame multi-view image generation) configurations —
BASELINE.json configs 1-3: single-frame denoise, with/without cross-view,
with/without ControlNet, and 'full' spatial attention (single-view capable)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import panacea_tpu.config as C
from panacea_tpu.registry import instantiate_from_config

CFG = os.path.join(os.path.dirname(__file__), "..", "panacea_tpu", "configs",
                   "tiny_stage1.yaml")
IH, IW = 16, 192


def build(overrides=()):
    cfg = C.load_config(CFG)
    C.apply_dotlist(cfg, list(overrides))
    eng = instantiate_from_config(cfg["model"])
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24), image_hw=(IH, IW))
    return eng


def batch(t=1):
    rs = np.random.RandomState(0)
    return {
        "jpg": rs.uniform(-1, 1, (1, t, IH, IW, 3)).astype(np.float32),
        "cond_img": rs.uniform(0, 1, (1, t, IH, IW, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((1, t, IH, IW, 3), dtype=np.float32),
        "txt": ["six-view street scene"],
    }


@pytest.mark.slow
def test_stage1_single_frame_with_controlnet():
    """Config 3: 6-view single-frame + ControlNet BEV conditioning."""
    eng = build()
    assert eng.num_frames == 1
    log = eng.log_images(batch(1), N=1, rng=jax.random.PRNGKey(0))
    assert log["samples"].shape == (1, IH, IW, 3)
    assert np.all(np.isfinite(np.asarray(log["samples"])))


@pytest.mark.slow
def test_stage1_full_attention_single_view():
    """Config 1: 'full' spatial attention, no cross-view — the single-view
    single-frame denoise slice (works for any panorama width, incl. 1 view)."""
    eng = build((
        "model.params.network_config.params.spatial_only_attn_type=full",
        "model.params.network_config.params.insert_crossview=False",
        "model.params.network_config.params.controlnet_config.params."
        "spatial_only_attn_type=full",
        "model.params.network_config.params.controlnet_config.params."
        "insert_crossview=False",
    ))
    log = eng.log_images(batch(1), N=1, rng=jax.random.PRNGKey(2))
    assert log["samples"].shape == (1, IH, IW, 3)
    assert np.all(np.isfinite(np.asarray(log["samples"])))
