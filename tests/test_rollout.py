"""Autoregressive rollout + remat equivalence tests."""

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
T, IH, IW = 2, 16, 192


@pytest.mark.slow
def test_rollout_two_windows():
    from panacea_tpu.data.nuscenes.dataset import NuScenesVideoDataset
    from panacea_tpu.data.nuscenes.synthetic import (
        make_synthetic_infos,
        synthetic_image_loader,
    )
    from panacea_tpu.rollout import rollout

    cfg = load_config(CFG_PATH)
    eng = instantiate_from_config(cfg["model"])
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24), image_hw=(IH, IW))

    infos = make_synthetic_infos(num_frames=6, seed=0)
    ds = NuScenesVideoDataset(
        infos=infos, queue_length=T, final_dim=(IH, IW // 6),
        image_loader=synthetic_image_loader, seed=0,
    )
    out = rollout(eng, ds, start_idx=T - 1, num_windows=2,
                  rng=jax.random.PRNGKey(5))
    # two windows of T frames overlapping by 1 -> 2T - 1 frames
    assert out["frames"].shape == (2 * T - 1, IH, IW, 3)
    assert np.all(np.isfinite(out["frames"]))
    assert len(out["windows"]) == 2


@pytest.mark.slow
def test_remat_grads_match_no_remat():
    """use_checkpoint=True (jax.remat) must not change loss or gradients."""
    import panacea_tpu.config as C

    cfg = load_config(CFG_PATH)
    cfg_r = load_config(CFG_PATH)
    C.apply_dotlist(cfg, [
        "model.params.network_config.params.use_checkpoint=False",
        "model.params.network_config.params.controlnet_config.params.use_checkpoint=False",
    ])
    C.apply_dotlist(cfg_r, [
        "model.params.network_config.params.use_checkpoint=True",
        "model.params.network_config.params.controlnet_config.params.use_checkpoint=True",
    ])
    eng = instantiate_from_config(cfg["model"])
    eng.loss_fn = instantiate_from_config(cfg["loss_fn_config"])
    eng_r = instantiate_from_config(cfg_r["model"])
    eng_r.loss_fn = instantiate_from_config(cfg_r["loss_fn_config"])
    p = eng.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24),
                        image_hw=(IH, IW))
    p_r = eng_r.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24),
                            image_hw=(IH, IW))
    # identical init (same rng) -> identical trees
    chex = np.testing.assert_allclose
    rng = np.random.RandomState(0)
    batch = {
        "jpg": rng.uniform(-1, 1, (1, T, IH, IW, 3)).astype(np.float32),
        "cond_img": rng.uniform(0, 1, (1, T, IH, IW, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((1, T, IH, IW, 3), dtype=np.float32),
        "txt": ["test"],
    }
    cond = eng.conditioner(batch)
    jpg = jnp.asarray(batch["jpg"])
    key = jax.random.PRNGKey(3)

    def loss(e, params):
        return e.train_loss(params, e.params["first_stage"], jpg, cond, key)

    l1, g1 = jax.value_and_grad(lambda p_: loss(eng, p_))(p["model"])
    l2, g2 = jax.value_and_grad(lambda p_: loss(eng_r, p_))(p_r["model"])
    chex(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        chex(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_share_noise_frame_anchor():
    """share_noise_frame=k must equal manually pre-biasing the injected noise
    with concat[k] (and a zero-level engine); frame 0 vs -1 must differ when
    the conditioning frames differ (rollout continuation windows)."""
    cfg = load_config(CFG_PATH)
    eng0 = instantiate_from_config(cfg["model"])   # level 0 (manual bias)
    eng1 = instantiate_from_config(cfg["model"])   # level > 0 (internal bias)
    lvl = 0.5
    eng0.share_noise_level = 0.0
    eng1.share_noise_level = lvl
    eng0.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24), image_hw=(IH, IW))
    eng1.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24), image_hw=(IH, IW))

    t = eng0.num_frames
    rng = np.random.RandomState(0)
    concat = jnp.asarray(rng.normal(size=(t, 2, 24, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 64)).astype(np.float32))
    c = {"concat": concat, "crossattn": ctx}
    uc = {"concat": concat, "crossattn": jnp.zeros_like(ctx)}
    noise = jnp.asarray(rng.normal(size=(t, 2, 24, 4)).astype(np.float32))

    def manual(frame):
        biased = noise + jnp.broadcast_to(concat[frame][None],
                                          noise.shape) * lvl
        return eng0.sample(c, uc=uc, batch_size=t, shape=(2, 24, 4),
                           rng=jax.random.PRNGKey(1), noise=biased,
                           num_steps=2)

    def internal(frame):
        return eng1.sample(c, uc=uc, batch_size=t, shape=(2, 24, 4),
                           rng=jax.random.PRNGKey(1), noise=noise,
                           num_steps=2, share_noise_frame=frame)

    np.testing.assert_allclose(np.asarray(internal(0)),
                               np.asarray(manual(0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(internal(-1)),
                               np.asarray(manual(-1)), atol=1e-5)
    assert not np.allclose(np.asarray(internal(0)), np.asarray(internal(-1)))
