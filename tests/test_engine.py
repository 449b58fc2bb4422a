"""End-to-end engine tests on the tiny CPU config: full config-driven build,
log_images (conditioning -> encode -> 4-step Euler-EDM CFG sampling -> decode),
and a training loss step. Mirrors BASELINE.json config 1."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.config import load_config
from panacea_tpu.registry import instantiate_from_config

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "panacea_tpu", "configs", "tiny_cpu.yaml"
)

# tiny geometry: 2 frames, image 16 x (6*32) panorama, latent /8 = 2x24
T, IH, IW = 2, 16, 192
LH, LW = 2, 24


@pytest.fixture(scope="module")
def engine():
    cfg = load_config(CFG_PATH)
    eng = instantiate_from_config(cfg["model"])
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(LH, LW), image_hw=(IH, IW))
    return eng


def make_batch(b=1):
    rng = np.random.RandomState(0)
    jpg = rng.uniform(-1, 1, (b, T, IH, IW, 3)).astype(np.float32)
    cond_img = rng.uniform(0, 1, (b, T, IH, IW, 19)).astype(np.float32)
    fcz = np.zeros((b, T, IH, IW, 3), dtype=np.float32)
    fcz[:, -1] = jpg[:, -1]  # use_last_frame conditioning
    return {
        "jpg": jpg,
        "cond_img": cond_img,
        "final_cond_zero": fcz,
        "txt": ["a driving scene with cars"] * b,
    }


def test_engine_builds_from_config(engine):
    assert engine.num_frames == T
    assert engine.share_noise_level == pytest.approx(0.07)
    assert engine.sampler.num_steps == 4
    assert engine.sampler.guider.scale == 5.0


def test_first_stage_roundtrip(engine):
    batch = make_batch()
    x = jnp.asarray(batch["jpg"]).reshape(T, IH, IW, 3)
    z = engine.encode_first_stage(x)
    assert z.shape == (T, LH, LW, 4)
    rec = engine.decode_first_stage(z)
    assert rec.shape == (T, IH, IW, 3)
    assert np.all(np.isfinite(np.asarray(rec)))


def test_conditioner_routing(engine):
    batch = make_batch()
    c = engine.conditioner(batch)
    assert set(c.keys()) == {"crossattn", "cond_feat", "concat"}
    assert c["crossattn"].shape == (1, 77, 64)
    assert c["cond_feat"].shape == (T, IH, IW, 19)
    assert c["concat"].shape == (T, LH, LW, 4)


def test_log_images_end_to_end(engine):
    batch = make_batch()
    log = engine.log_images(batch, N=1, rng=jax.random.PRNGKey(1))
    assert log["inputs"].shape == (T, IH, IW, 3)
    assert log["reconstructions"].shape == (T, IH, IW, 3)
    assert log["samples"].shape == (T, IH, IW, 3)
    for k in ("inputs", "reconstructions", "samples", "control"):
        assert np.all(np.isfinite(np.asarray(log[k]))), k


def test_sampling_is_deterministic_given_rng(engine):
    batch = make_batch()
    l1 = engine.log_images(batch, N=1, rng=jax.random.PRNGKey(3))
    l2 = engine.log_images(batch, N=1, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(l1["samples"]), np.asarray(l2["samples"]), atol=1e-5
    )


@pytest.mark.slow
def test_training_loss(engine):
    cfg = load_config(CFG_PATH)
    loss_fn = instantiate_from_config(cfg["loss_fn_config"])
    engine.loss_fn = loss_fn
    batch = make_batch()
    loss = engine.loss(engine.params["model"], batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # grads flow
    g = jax.grad(lambda p: engine.loss(p, batch, jax.random.PRNGKey(0)))(
        engine.params["model"]
    )
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_freeze_mask_spatial(engine):
    engine.freeze_type = "spatial"
    mask = engine.trainable_mask(engine.params["model"])
    import flax

    flat = flax.traverse_util.flatten_dict(mask)
    trainable = [k for k, v in flat.items() if v]
    frozen = [k for k, v in flat.items() if not v]
    assert trainable and frozen
    assert all(any("temporal" in p for p in k) for k in trainable)
    engine.freeze_type = "none"
