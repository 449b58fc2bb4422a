"""VAE training losses.

Equivalents of sgm/modules/autoencoding/losses/__init__.py:19-251 and
regularizers/__init__.py:23-41: KL regularizer, PatchGAN discriminator,
reconstruction + perceptual + adaptive-weight adversarial loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def kl_divergence(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-Gaussian KL to N(0, I), per-sample sum
    (DiagonalGaussianDistribution.kl, distributions.py)."""
    logvar = jnp.clip(logvar, -30.0, 20.0)
    kl = 0.5 * (mean**2 + jnp.exp(logvar) - 1.0 - logvar)
    return jnp.sum(kl.reshape(kl.shape[0], -1), axis=-1)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (lpips/model/model.py:1-88), channels-last,
    GroupNorm in place of (Actnorm/BatchNorm) for TPU friendliness."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for i in range(1, self.n_layers + 1):
            mult = min(2**i, 8)
            stride = 2 if i < self.n_layers else 1
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, self.ndf * mult),
                             dtype=jnp.float32)(h.astype(jnp.float32)).astype(
                                 h.dtype)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real))
        + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adaptive_weight(nll_grad_norm, g_grad_norm, max_w: float = 1e4):
    """Adaptive adversarial weight ||grad nll|| / ||grad g||
    (losses/__init__.py calculate_adaptive_weight)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, max_w)


class LatentLPIPS:
    """Latent-space L2 + decoded-image LPIPS loss (reference LatentLPIPS,
    sgm/modules/autoencoding/losses/__init__.py:19-85). Functional like
    GeneralLPIPSWithDiscriminator below: decode/LPIPS enter as callables
    (``decode_apply(latents) -> images``, ``lpips_apply(x, y) -> (N, 1)``)
    so the caller owns all params; ``decoder_config`` is accepted for
    config parity and instantiated through the registry when given.

    ``__call__(latent_inputs, latent_predictions, image_inputs, split)``
    returns ``(loss, log)`` with the reference's exact weighting:
    ``latent_weight * mean((z_in - z_pred)^2)`` plus
    ``perceptual_weight * LPIPS(decode(z_in), decode(z_pred))`` plus
    ``perceptual_weight_on_inputs * LPIPS(image_inputs, decode(z_pred))``.
    The bicubic rescale options use jax.image.resize (the reference's
    antialiased torch bicubic differs slightly at non-integer scales)."""

    def __init__(
        self,
        decoder_config=None,
        perceptual_weight: float = 1.0,
        latent_weight: float = 1.0,
        scale_input_to_tgt_size: bool = False,
        scale_tgt_to_input_size: bool = False,
        perceptual_weight_on_inputs: float = 0.0,
        decode_apply=None,
        lpips_apply=None,
        decoder_params=None,
    ):
        assert not (scale_input_to_tgt_size and scale_tgt_to_input_size)
        self.perceptual_weight = perceptual_weight
        self.latent_weight = latent_weight
        self.scale_input_to_tgt_size = scale_input_to_tgt_size
        self.scale_tgt_to_input_size = scale_tgt_to_input_size
        self.perceptual_weight_on_inputs = perceptual_weight_on_inputs
        self.decode_apply = decode_apply
        self.lpips_apply = lpips_apply
        self.decoder = None
        self._decoder_vars = (
            {"params": decoder_params} if decoder_params is not None
            else None)
        if decoder_config is not None and decode_apply is None:
            from panacea_tpu.registry import instantiate_from_config

            # reference init_decoder drops the encoder tower; our VAE is
            # functional so simply only the decode path is ever applied
            self.decoder = instantiate_from_config(decoder_config)
            if self._decoder_vars is None:
                # initialize decoder variables EAGERLY (fixed key, matching
                # the reference whose init_decoder starts at fresh init
                # unless a ckpt is given): a lazy first-call init inside a
                # jitted/value_and_grad caller would cache TRACERS on the
                # object and blow up (or go stale) on the next call. The
                # decoder is conv-shape-polymorphic, so a tiny 8x8 latent
                # materializes the full param tree.
                zc = int(dict(decoder_config.get("params", {})
                              ).get("ddconfig", {}).get("z_channels", 4))
                self._decoder_vars = jax.jit(
                    lambda: self.decoder.init(
                        jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, zc), jnp.float32),
                        method=self.decoder.decode))()

    def _decode(self, z):
        if self.decode_apply is not None:
            return self.decode_apply(z)
        if self.decoder is None or self._decoder_vars is None:
            raise ValueError(
                "LatentLPIPS needs decoder_config or decode_apply for its "
                "perceptual terms")
        return self.decoder.apply(self._decoder_vars, z,
                                  method=self.decoder.decode)

    @staticmethod
    def _resize_like(img, ref_img):
        if img.shape[1:3] == ref_img.shape[1:3]:
            return img
        return jax.image.resize(
            img, (img.shape[0],) + ref_img.shape[1:3] + (img.shape[3],),
            method="cubic")

    def __call__(self, latent_inputs, latent_predictions, image_inputs=None,
                 split: str = "train") -> Tuple[jnp.ndarray, Dict]:
        log: Dict[str, jnp.ndarray] = {}
        l2 = jnp.square(latent_inputs - latent_predictions)
        log[f"{split}/latent_l2_loss"] = jax.lax.stop_gradient(l2.mean())
        loss = l2
        image_reconstructions = None
        if self.perceptual_weight > 0.0:
            image_reconstructions = self._decode(latent_predictions)
            image_targets = self._decode(latent_inputs)
            p = self.lpips_apply(image_targets, image_reconstructions)
            loss = (self.latent_weight * l2.mean()
                    + self.perceptual_weight * p.mean())
            log[f"{split}/perceptual_loss"] = jax.lax.stop_gradient(p.mean())
        if self.perceptual_weight_on_inputs > 0.0:
            if image_reconstructions is None:
                image_reconstructions = self._decode(latent_predictions)
            if self.scale_input_to_tgt_size:
                image_inputs = self._resize_like(
                    image_inputs, image_reconstructions)
            elif self.scale_tgt_to_input_size:
                image_reconstructions = self._resize_like(
                    image_reconstructions, image_inputs)
            p2 = self.lpips_apply(image_inputs, image_reconstructions)
            # reference quirk preserved: with perceptual_weight == 0 the l2
            # term is still the ELEMENTWISE tensor here, so the scalar
            # perceptual term broadcasts over it (losses/__init__.py:60-84)
            loss = loss + self.perceptual_weight_on_inputs * p2.mean()
            log[f"{split}/perceptual_loss_on_inputs"] = jax.lax.stop_gradient(
                p2.mean())
        return loss, log


class GeneralLPIPSWithDiscriminator:
    """Rec (L1) + perceptual (LPIPS) + KL + adversarial loss orchestrator
    (losses/__init__.py:19-251), functional: the caller owns params/opt for
    both generator and discriminator."""

    def __init__(
        self,
        disc_start: int = 50001,
        kl_weight: float = 1e-6,
        disc_weight: float = 0.5,
        perceptual_weight: float = 1.0,
        disc_loss: str = "hinge",
        lpips_apply=None,
    ):
        assert disc_loss in ("hinge", "vanilla")
        self.disc_start = disc_start
        self.kl_weight = kl_weight
        self.disc_weight = disc_weight
        self.perceptual_weight = perceptual_weight
        self.d_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.lpips_apply = lpips_apply

    def generator_loss(self, inputs, reconstructions, mean, logvar,
                       disc_logits_fake, global_step: int,
                       adaptive_w: float = 1.0) -> Tuple[jnp.ndarray, Dict]:
        rec = jnp.abs(inputs - reconstructions)
        if self.lpips_apply is not None and self.perceptual_weight > 0:
            p = self.lpips_apply(inputs, reconstructions)
            rec = rec + self.perceptual_weight * p.reshape(
                (-1,) + (1,) * (rec.ndim - 1)
            )
        nll = jnp.mean(rec)
        kl = jnp.mean(kl_divergence(mean, logvar))
        disc_on = jnp.where(global_step >= self.disc_start, 1.0, 0.0)
        g_loss = -jnp.mean(disc_logits_fake)
        total = nll + self.kl_weight * kl + \
            disc_on * self.disc_weight * adaptive_w * g_loss
        return total, {"nll": nll, "kl": kl, "g_loss": g_loss}

    def discriminator_loss(self, logits_real, logits_fake,
                           global_step: int) -> jnp.ndarray:
        disc_on = jnp.where(global_step >= self.disc_start, 1.0, 0.0)
        return disc_on * self.d_loss(logits_real, logits_fake)
