"""Golden tests for the diffusion math layer against the reference formulas
(discretizer.py / denoiser_scaling.py / denoiser.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.diffusion.discretization import (
    EDMDiscretization,
    LegacyDDPMDiscretization,
)
from panacea_tpu.diffusion.denoiser import DiscreteDenoiser
from panacea_tpu.diffusion.scaling import EDMScaling, EpsScaling, VScaling
from panacea_tpu.diffusion.util import sincos_1d_embedding, timestep_embedding
from panacea_tpu.diffusion.weighting import EpsWeighting, VWeighting

DDPM_CFG = {
    "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
}
EPS_SCALING_CFG = {
    "target": "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"
}
EPS_WEIGHT_CFG = {
    "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"
}


def test_legacy_ddpm_sigmas_formula():
    """sigma_t = sqrt((1-abar)/abar) with sqrt-linear betas (discretizer.py:42-69)."""
    disc = LegacyDDPMDiscretization()
    sigmas = np.asarray(disc(1000, do_append_zero=False, flip=True))
    betas = (
        np.linspace(0.00085**0.5, 0.0120**0.5, 1000, dtype=np.float64) ** 2
    )
    abar = np.cumprod(1 - betas)
    expected = np.sqrt((1 - abar) / abar)
    np.testing.assert_allclose(sigmas, expected, rtol=1e-5)
    # ascending when flipped
    assert sigmas[0] < sigmas[-1]


def test_legacy_ddpm_subset_25_steps():
    disc = LegacyDDPMDiscretization()
    sigmas = np.asarray(disc(25))  # descending + appended zero
    assert sigmas.shape == (26,)
    assert sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    # first sigma is the max-timestep sigma
    full = np.asarray(disc(1000, do_append_zero=False, flip=True))
    np.testing.assert_allclose(sigmas[0], full[-1], rtol=1e-5)


def test_edm_discretization_endpoints():
    disc = EDMDiscretization(sigma_min=0.02, sigma_max=80.0, rho=7.0)
    s = disc.get_sigmas(10)
    np.testing.assert_allclose(s[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(s[-1], 0.02, rtol=1e-5)


@pytest.mark.parametrize("scaling_cls", [EpsScaling, VScaling, EDMScaling])
def test_scaling_identities(scaling_cls):
    sigma = jnp.asarray([0.1, 1.0, 14.6])
    c_skip, c_out, c_in, c_noise = scaling_cls()(sigma)
    s = np.asarray(sigma)
    if scaling_cls is EpsScaling:
        np.testing.assert_allclose(np.asarray(c_skip), np.ones_like(s))
        np.testing.assert_allclose(np.asarray(c_out), -s)
        np.testing.assert_allclose(np.asarray(c_in), 1 / np.sqrt(s**2 + 1), rtol=1e-5)
    elif scaling_cls is VScaling:
        np.testing.assert_allclose(np.asarray(c_skip), 1 / (s**2 + 1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(c_out), -s / np.sqrt(s**2 + 1), rtol=1e-5)
    else:
        sd = 0.5
        np.testing.assert_allclose(
            np.asarray(c_skip), sd**2 / (s**2 + sd**2), rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(c_noise), 0.25 * np.log(s), rtol=1e-5)


def test_weightings():
    sigma = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(EpsWeighting()(sigma)), [4.0, 0.25])
    np.testing.assert_allclose(
        np.asarray(VWeighting()(sigma)), (np.array([0.5, 2.0]) ** 2 + 1) / np.array([0.5, 2.0]) ** 2
    )


def test_discrete_denoiser_quantization_roundtrip():
    den = DiscreteDenoiser(
        weighting_config=EPS_WEIGHT_CFG,
        scaling_config=EPS_SCALING_CFG,
        num_idx=1000,
        discretization_config=DDPM_CFG,
    )
    # idx -> sigma -> idx is identity
    idx = jnp.asarray([0, 1, 500, 999])
    sig = den.idx_to_sigma(idx)
    np.testing.assert_array_equal(np.asarray(den.sigma_to_idx(sig)), np.asarray(idx))
    # sigmas ascending with timestep index (flip=True)
    assert float(den.sigmas[0]) < float(den.sigmas[-1])


def test_discrete_denoiser_eps_preconditioning():
    """D(x, sigma) = net(x*c_in, t) * (-sigma) + x for EpsScaling (denoiser.py:22-28)."""
    den = DiscreteDenoiser(
        weighting_config=EPS_WEIGHT_CFG,
        scaling_config=EPS_SCALING_CFG,
        num_idx=1000,
        discretization_config=DDPM_CFG,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    sigma = den.idx_to_sigma(jnp.asarray([100, 700]))
    seen = {}

    def network(xin, c_noise, cond):
        seen["c_noise"] = c_noise
        seen["xin"] = xin
        return jnp.ones_like(xin) * 0.5

    out = den(network, x, sigma, cond={})
    # c_noise must be the integer timestep index
    np.testing.assert_array_equal(np.asarray(seen["c_noise"]), [100, 700])
    s = np.asarray(sigma).reshape(2, 1, 1, 1)
    expected_in = np.asarray(x) / np.sqrt(s**2 + 1)
    np.testing.assert_allclose(np.asarray(seen["xin"]), expected_in, rtol=1e-5)
    expected_out = 0.5 * (-s) + np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), expected_out, rtol=1e-5)


def test_timestep_embedding_cos_first():
    """Reference concatenates [cos, sin] (diffusionmodules/util.py:224-246)."""
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0]), 8))
    np.testing.assert_allclose(emb[0, :4], np.ones(4))  # cos(0) = 1
    np.testing.assert_allclose(emb[0, 4:], np.zeros(4))  # sin(0) = 0


def test_legacy_sincos_embedding_quirk():
    """The reference's int-truncated frequencies give [sin t, cos t, 0, 1, ...]
    (attention.py:1140-1159)."""
    pe = sincos_1d_embedding(8, 6, legacy_int_freq=True)
    t = np.arange(8)
    np.testing.assert_allclose(pe[:, 0], np.sin(t), atol=1e-6)
    np.testing.assert_allclose(pe[:, 1], np.cos(t), atol=1e-6)
    np.testing.assert_allclose(pe[:, 2], np.zeros(8), atol=1e-6)
    np.testing.assert_allclose(pe[:, 3], np.ones(8), atol=1e-6)
    # non-legacy variant is a real sinusoid
    pe2 = sincos_1d_embedding(8, 6, legacy_int_freq=False)
    assert np.abs(pe2[:, 2]).max() > 0.1
