"""VAE loss stack tests: LPIPS vs torchvision VGG16 features, KL math,
discriminator shapes, hinge losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.losses.lpips import LPIPS, VGG16Features
from panacea_tpu.losses.vae_losses import (
    GeneralLPIPSWithDiscriminator,
    NLayerDiscriminator,
    hinge_d_loss,
    kl_divergence,
)


def test_kl_divergence_analytic():
    # KL(N(0,1) || N(0,1)) = 0
    m = jnp.zeros((2, 4))
    lv = jnp.zeros((2, 4))
    np.testing.assert_allclose(np.asarray(kl_divergence(m, lv)), 0.0)
    # KL(N(mu,1) || N(0,1)) = mu^2/2 per dim
    m = jnp.full((1, 3), 2.0)
    np.testing.assert_allclose(
        np.asarray(kl_divergence(m, jnp.zeros((1, 3)))), 3 * 2.0, rtol=1e-6
    )


def test_vgg16_matches_torchvision_structure():
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")

    tv = torchvision.models.vgg16()
    convs = [m for m in tv.features if isinstance(m, torch.nn.Conv2d)]
    x = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    model = VGG16Features()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # convert all 13 convs
    for i, conv in enumerate(convs):
        params[f"conv{i}"]["kernel"] = jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        params[f"conv{i}"]["bias"] = jnp.asarray(conv.bias.detach().numpy())
    taps = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref_taps = []
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tap_idx = {3, 8, 15, 22, 29}
        for i, m in enumerate(tv.features):
            h = m(h)
            if i in tap_idx:
                ref_taps.append(h.numpy().transpose(0, 2, 3, 1))
    assert len(taps) == len(ref_taps) == 5
    for a, b in zip(taps, ref_taps):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-3, rtol=1e-3)


def test_lpips_zero_for_identical_inputs():
    model = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, x)["params"]
    d_same = model.apply({"params": params}, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = x + 0.5
    d_diff = model.apply({"params": params}, x, y)
    assert np.abs(np.asarray(d_diff)).max() > 0


def test_discriminator_patch_output():
    d = NLayerDiscriminator()
    x = jnp.zeros((2, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    out = d.apply({"params": params}, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 64  # patch logits


def test_generator_and_disc_losses():
    loss = GeneralLPIPSWithDiscriminator(disc_start=0, kl_weight=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    rec = x + 0.1
    mean = jnp.zeros((2, 4, 4, 4))
    logvar = jnp.zeros((2, 4, 4, 4))
    fake_logits = jnp.zeros((2, 3, 3, 1))
    total, parts = loss.generator_loss(x, rec, mean, logvar, fake_logits, 10)
    assert np.isfinite(float(total))
    assert parts["nll"] > 0
    d = loss.discriminator_loss(jnp.ones((2, 3, 3, 1)),
                                -jnp.ones((2, 3, 3, 1)), 10)
    assert float(d) == 0.0  # perfectly separated hinge
    d2 = loss.discriminator_loss(-jnp.ones((2, 3, 3, 1)),
                                 jnp.ones((2, 3, 3, 1)), 10)
    assert float(d2) == 2.0


def test_latent_lpips_semantics():
    """LatentLPIPS (losses/__init__.py:19-85): latent L2 + decoded LPIPS
    weighting, elementwise-tensor quirk when perceptual_weight == 0, and
    the perceptual_weight_on_inputs branch with tgt->input rescale."""
    from panacea_tpu.losses.vae_losses import LatentLPIPS

    rng = np.random.RandomState(0)
    z_in = jnp.asarray(rng.randn(2, 4, 4, 4).astype(np.float32))
    z_pred = jnp.asarray(rng.randn(2, 4, 4, 4).astype(np.float32))
    img = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))

    def decode(z):  # fake decoder: 4x nearest upsample to 3ch
        up = jnp.repeat(jnp.repeat(z[..., :3], 4, axis=1), 4, axis=2)
        return up

    def lpips(x, y):  # fake perceptual metric, per-sample
        return jnp.mean(jnp.abs(x - y), axis=(1, 2, 3))[:, None]

    # main path: scalar loss = latent_weight*l2.mean() + w_p*perc.mean()
    loss_fn = LatentLPIPS(latent_weight=2.0, perceptual_weight=0.5,
                          decode_apply=decode, lpips_apply=lpips)
    loss, log = loss_fn(z_in, z_pred, split="val")
    l2 = float(jnp.mean((z_in - z_pred) ** 2))
    perc = float(lpips(decode(z_in), decode(z_pred)).mean())
    np.testing.assert_allclose(float(loss), 2.0 * l2 + 0.5 * perc, rtol=1e-6)
    np.testing.assert_allclose(float(log["val/latent_l2_loss"]), l2, rtol=1e-6)
    assert "val/perceptual_loss" in log

    # perceptual_weight == 0: the l2 term stays an ELEMENTWISE tensor
    # (reference returns the tensor), and on_inputs broadcasts over it
    loss_fn0 = LatentLPIPS(perceptual_weight=0.0,
                           perceptual_weight_on_inputs=1.0,
                           scale_tgt_to_input_size=True,
                           decode_apply=decode, lpips_apply=lpips)
    loss0, log0 = loss_fn0(z_in, z_pred, image_inputs=img)
    assert loss0.shape == z_in.shape
    p2 = float(lpips(img, decode(z_pred)).mean())
    np.testing.assert_allclose(
        np.asarray(loss0), np.asarray((z_in - z_pred) ** 2) + p2, rtol=1e-5)
    assert "train/perceptual_loss_on_inputs" in log0

    # registry alias resolves
    from panacea_tpu.registry import resolve_target

    assert resolve_target(
        "sgm.modules.autoencoding.losses.LatentLPIPS") is LatentLPIPS
