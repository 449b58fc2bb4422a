"""Denoiser preconditioning wrappers.

Functional equivalents of sgm/modules/diffusionmodules/denoiser.py:6-63. A denoiser
takes a ``network`` callable ``net(x, c_noise, cond) -> pred`` and applies EDM-style
preconditioning. Everything is jit-friendly: sigma quantization uses an argmin over
a static sigma table.
"""

from __future__ import annotations

import jax.numpy as jnp

from panacea_tpu.diffusion.util import append_dims
from panacea_tpu.registry import instantiate_from_config


class Denoiser:
    def __init__(self, weighting_config, scaling_config):
        self.weighting = instantiate_from_config(weighting_config)
        self.scaling = instantiate_from_config(scaling_config)

    def possibly_quantize_sigma(self, sigma):
        return sigma

    def possibly_quantize_c_noise(self, c_noise):
        return c_noise

    def w(self, sigma):
        return self.weighting(sigma)

    def __call__(self, network, x, sigma, cond):
        sigma = self.possibly_quantize_sigma(sigma)
        sigma_shape = sigma.shape
        sigma = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
        return network(x * c_in, c_noise, cond) * c_out + x * c_skip


class DiscreteDenoiser(Denoiser):
    """Quantizes sigma to the nearest of ``num_idx`` DDPM levels; c_noise becomes the
    integer timestep index (denoiser.py:31-63)."""

    def __init__(
        self,
        weighting_config,
        scaling_config,
        num_idx: int,
        discretization_config,
        do_append_zero: bool = False,
        quantize_c_noise: bool = True,
        flip: bool = True,
    ):
        super().__init__(weighting_config, scaling_config)
        self.sigmas = instantiate_from_config(discretization_config)(
            num_idx, do_append_zero=do_append_zero, flip=flip
        )
        self.quantize_c_noise = quantize_c_noise

    def sigma_to_idx(self, sigma):
        dists = sigma - self.sigmas[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx):
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma):
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise):
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise)
        return c_noise
