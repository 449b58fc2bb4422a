"""Tail sgm embedders (modules.py:290-1014 ports in models/conditioner.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panacea_tpu.models.conditioner import (
    ClassEmbedderForMultiCond,
    GaussianEncoder,
    LowScaleEncoder,
    SpatialRescaler,
)


def test_spatial_rescaler_stages_and_remap():
    sr = SpatialRescaler(n_stages=2, out_channels=8)
    y = sr(np.ones((2, 16, 16, 3), np.float32))
    assert y.shape == (2, 4, 4, 8)
    # no remap: channels preserved
    sr2 = SpatialRescaler(n_stages=1, method="nearest")
    y2 = sr2(np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3))
    assert y2.shape == (2, 2, 2, 3)


def test_spatial_rescaler_wrap_video():
    sr = SpatialRescaler(n_stages=1, wrap_video=True)
    y = sr(np.ones((2, 3, 8, 8, 3), np.float32))
    assert y.shape == (2, 3, 4, 4, 3)


def test_class_embedder_multicond_list_roundtrip():
    ce = ClassEmbedderForMultiCond(embed_dim=8, n_classes=5)
    ce.input_key = "cls"
    out = ce({"cls": [np.array([1, 2])]})
    assert isinstance(out["cls"], list) and out["cls"][0].shape == (2, 8)
    out2 = ce({"cls": np.array([0])})
    assert out2["cls"].shape == (1, 8)


def test_gaussian_encoder_flatten_and_kl():
    ge = GaussianEncoder(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=4, resolution=16)
    log, z = ge(np.ones((1, 16, 16, 3), np.float32))
    assert z.shape == (1, 64, 4)  # (B, H*W, C) flatten (modules.py:1011)
    assert np.isfinite(float(log["kl_loss"]))
    assert log["weight"] == 1.0


def test_low_scale_encoder_q_sample_and_resize():
    cfg = {"target": "panacea_tpu.models.vae.AutoencoderKL",
           "params": {"embed_dim": 4, "ddconfig": {
               "double_z": True, "z_channels": 4, "resolution": 32,
               "in_channels": 3, "out_ch": 3, "ch": 16, "ch_mult": [1, 2],
               "num_res_blocks": 1, "attn_resolutions": []}}}
    lse = LowScaleEncoder(cfg, 1e-4, 2e-2, output_size=8,
                          max_noise_level=250)
    z, t = lse(np.ones((2, 32, 32, 3), np.float32),
               rng=jax.random.PRNGKey(1))
    assert z.shape == (2, 8, 8, 4)
    assert t.shape == (2,) and (np.asarray(t) < 250).all()
    # q_sample interpolates signal/noise with the DDPM schedule
    x = jnp.ones((2, 4, 4, 4))
    noised = lse.q_sample(x, jnp.array([0, 249]), jnp.zeros_like(x))
    a = np.asarray(lse.sqrt_alphas_cumprod)
    np.testing.assert_allclose(np.asarray(noised)[0], a[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(noised)[1], a[249], atol=1e-6)
