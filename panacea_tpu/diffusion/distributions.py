"""Latent distributions (sgm/modules/distributions/distributions.py).

Channels-last, functional randomness: ``sample`` takes an explicit PRNG key
instead of the reference's implicit global RNG. The VAE's inline
encode-and-sample path (models/vae.py) stays the jit hot path; these classes
are the API-parity surface for code that manipulates posteriors directly
(regularizers, VAE training loops).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


class AbstractDistribution:
    def sample(self, rng):
        raise NotImplementedError()

    def mode(self):
        raise NotImplementedError()


class DiracDistribution(AbstractDistribution):
    """Point mass (distributions.py:13-21)."""

    def __init__(self, value):
        self.value = value

    def sample(self, rng=None):
        return self.value

    def mode(self):
        return self.value


class DiagonalGaussianDistribution(AbstractDistribution):
    """Diagonal Gaussian from (..., 2*C) channels-last moments
    (distributions.py:24-72; the reference chunks dim=1 in NCHW)."""

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        if deterministic:
            self.var = self.std = jnp.zeros_like(self.mean)
        else:
            self.std = jnp.exp(0.5 * self.logvar)
            self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype)

    def _reduce_dims(self) -> Tuple[int, ...]:
        return tuple(range(1, self.mean.ndim))

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        dims = self._reduce_dims()
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar,
                axis=dims)
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=dims)

    def nll(self, sample: jnp.ndarray, dims: Optional[Tuple[int, ...]] = None):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        dims = self._reduce_dims() if dims is None else tuple(dims)
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar
            + jnp.square(sample - self.mean) / self.var, axis=dims)

    def mode(self):
        return self.mean


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Broadcasting KL between two diagonal Gaussians
    (distributions.py:75-103, from openai/guided-diffusion)."""
    mean1, logvar1, mean2, logvar2 = map(jnp.asarray,
                                         (mean1, logvar1, mean2, logvar2))
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2))


class AbstractRegularizer:
    """sgm/modules/autoencoding/regularizers/__init__.py:11-21."""

    def __call__(self, z, rng=None):
        raise NotImplementedError()

    def get_trainable_parameters(self):
        yield from ()


class DiagonalGaussianRegularizer(AbstractRegularizer):
    """Sample-or-mode + KL log (regularizers/__init__.py:23-41). Takes the
    (..., 2*C) moments tensor; returns (z, {'kl_loss': scalar})."""

    def __init__(self, sample: bool = True):
        self.sample = sample

    def __call__(self, z: jnp.ndarray, rng: Optional[jax.Array] = None):
        posterior = DiagonalGaussianDistribution(z)
        if self.sample:
            if rng is None:
                raise ValueError(
                    "DiagonalGaussianRegularizer(sample=True) needs a PRNG key")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        kl = posterior.kl()
        return z, {"kl_loss": jnp.sum(kl) / kl.shape[0]}
