"""Training loss (sgm/modules/diffusionmodules/loss.py:11-79).

Pure-functional: takes explicit PRNG keys and the conditioning dict. The Panacea
shared-noise trick — biasing the per-frame noise toward the conditioning frame's
latent — is reproduced (loss.py:54-60).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from panacea_tpu.diffusion.util import append_dims
from panacea_tpu.registry import instantiate_from_config


class StandardDiffusionLoss:
    def __init__(
        self,
        sigma_sampler_config,
        type: str = "l2",
        offset_noise_level: float = 0.0,
        share_noise_level: float = 0.0,
        num_frames: int = 8,
        batch2model_keys=None,
        lpips_fn=None,
    ):
        assert type in ("l2", "l1", "lpips")
        self.type = type
        self.offset_noise_level = offset_noise_level
        self.share_noise_level = share_noise_level
        self.num_frames = num_frames
        self.sigma_sampler = instantiate_from_config(sigma_sampler_config)
        self.lpips_fn = lpips_fn
        if isinstance(batch2model_keys, str):
            batch2model_keys = [batch2model_keys]
        self.batch2model_keys = set(batch2model_keys or [])

    def __call__(
        self,
        network,
        denoiser,
        cond: Dict[str, Any],
        x: jnp.ndarray,
        rng: jax.Array,
        batch: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        """x: clean latents, shape (B*T, H, W, C) channels-last."""
        k_sigma, k_noise, k_offset = jax.random.split(rng, 3)
        sigmas = self.sigma_sampler(x.shape[0], rng=k_sigma)
        noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        if self.offset_noise_level > 0.0:
            noise = noise + self.offset_noise_level * append_dims(
                jax.random.normal(k_offset, (x.shape[0],), dtype=x.dtype), x.ndim
            )
        if self.share_noise_level > 0.0:
            # bias all frames' noise toward the conditioning-frame latent
            # (loss.py:54-60); concat[-1] is the conditioning frame.
            concat_feat = cond["concat"]
            concat_seq = jnp.broadcast_to(
                concat_feat[-1][None], (self.num_frames,) + concat_feat.shape[1:]
            )
            concat_seq = jnp.tile(
                concat_seq, (x.shape[0] // self.num_frames,) + (1,) * (x.ndim - 1)
            )
            noise = noise + concat_seq * self.share_noise_level
        noised = x + noise * append_dims(sigmas, x.ndim)
        model_output = denoiser(network, noised, sigmas, cond)
        w = append_dims(denoiser.w(sigmas), x.ndim)
        return self.get_loss(model_output, x, w)

    def get_loss(self, model_output, target, w):
        if self.type == "l2":
            return jnp.mean(
                (w * (model_output - target) ** 2).reshape(target.shape[0], -1), axis=1
            )
        if self.type == "l1":
            return jnp.mean(
                (w * jnp.abs(model_output - target)).reshape(target.shape[0], -1),
                axis=1,
            )
        if self.lpips_fn is None:
            raise ValueError("lpips loss requested but no lpips_fn provided")
        return self.lpips_fn(model_output, target).reshape(-1)
