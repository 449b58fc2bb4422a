"""Sampler correctness: each scan-based sampler is checked against an independent
NumPy step-by-step implementation of the same update rules (derived from the
k-diffusion math, sampling.py:85-365), using a synthetic analytic denoiser."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.diffusion.samplers import (
    DPMPP2MSampler,
    DPMPP2SAncestralSampler,
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
    LinearMultistepSampler,
)
from panacea_tpu.diffusion.guiders import VanillaCFG

DDPM_CFG = {
    "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
}
CFG_GUIDER = {
    "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
    "params": {"scale": 5.0},
}


def shrink_denoiser(x, sigma, cond):
    """Analytic 'denoiser': pulls x toward cond['mu'] proportionally to sigma."""
    s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
    return (x + cond["mu"] * s) / (1.0 + s)


def np_sigmas(n=8):
    import panacea_tpu.diffusion.discretization as D

    disc = D.LegacyDDPMDiscretization()
    return np.asarray(disc(n))


def make_inputs(shape=(2, 4, 4, 3)):
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), shape), dtype=np.float32)
    mu = np.ones(shape, dtype=np.float32) * 0.3
    return x, mu


def np_denoise(x, sigma, mu):
    s = np.reshape(sigma, (-1,) + (1,) * (x.ndim - 1))
    return (x + mu * s) / (1.0 + s)


def test_euler_edm_matches_numpy_loop():
    x0, mu = make_inputs()
    sig = np_sigmas(8)
    # NumPy loop (independent re-derivation of the Euler-EDM update)
    x = x0 * np.sqrt(1 + sig[0] ** 2)
    for i in range(len(sig) - 1):
        den = np_denoise(x, np.full(x.shape[0], sig[i]), mu)
        d = (x - den) / sig[i]
        x = x + (sig[i + 1] - sig[i]) * d
    sampler = EulerEDMSampler(num_steps=8, discretization_config=DDPM_CFG)
    out = sampler(shrink_denoiser, jnp.asarray(x0), {"mu": jnp.asarray(mu)})
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=1e-5)


def test_heun_matches_numpy_loop():
    x0, mu = make_inputs()
    sig = np_sigmas(6)
    x = x0 * np.sqrt(1 + sig[0] ** 2)
    for i in range(len(sig) - 1):
        den = np_denoise(x, np.full(x.shape[0], sig[i]), mu)
        d = (x - den) / sig[i]
        dt = sig[i + 1] - sig[i]
        xe = x + dt * d
        if sig[i + 1] > 0:
            den2 = np_denoise(xe, np.full(x.shape[0], sig[i + 1]), mu)
            d2 = (xe - den2) / sig[i + 1]
            x = x + dt * (d + d2) / 2
        else:
            x = xe
    sampler = HeunEDMSampler(num_steps=6, discretization_config=DDPM_CFG)
    out = sampler(shrink_denoiser, jnp.asarray(x0), {"mu": jnp.asarray(mu)})
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=1e-5)


def test_dpmpp2m_matches_numpy_loop():
    x0, mu = make_inputs()
    sig = np_sigmas(8).astype(np.float64)
    x = (x0 * np.sqrt(1 + sig[0] ** 2)).astype(np.float64)
    old_denoised = None
    for i in range(len(sig) - 1):
        den = np_denoise(x, np.full(x.shape[0], sig[i]), mu)
        t = -np.log(sig[i])
        t_next = -np.log(max(sig[i + 1], 1e-30))
        h = t_next - t
        mult1 = np.exp(-t_next) / np.exp(-t)
        mult2 = np.expm1(-h)
        x_std = mult1 * x - mult2 * den
        if old_denoised is None or sig[i + 1] == 0:
            x = x_std
        else:
            h_last = t - (-np.log(sig[i - 1]))
            r = h_last / h
            den_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old_denoised
            x = mult1 * x - mult2 * den_d
        old_denoised = den
    sampler = DPMPP2MSampler(num_steps=8, discretization_config=DDPM_CFG)
    out = sampler(shrink_denoiser, jnp.asarray(x0), {"mu": jnp.asarray(mu)})
    np.testing.assert_allclose(np.asarray(out), x, rtol=5e-4, atol=5e-5)


def test_euler_ancestral_deterministic_part():
    """With eta=0 the ancestral sampler reduces to plain Euler on the sigma grid."""
    x0, mu = make_inputs()
    sig = np_sigmas(8)
    x = x0 * np.sqrt(1 + sig[0] ** 2)
    for i in range(len(sig) - 1):
        den = np_denoise(x, np.full(x.shape[0], sig[i]), mu)
        d = (x - den) / sig[i]
        x = x + (sig[i + 1] - sig[i]) * d
    sampler = EulerAncestralSampler(
        eta=0.0, num_steps=8, discretization_config=DDPM_CFG
    )
    out = sampler(
        shrink_denoiser, jnp.asarray(x0), {"mu": jnp.asarray(mu)},
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=1e-5)


def test_dpmpp2s_runs_finite():
    x0, mu = make_inputs()
    sampler = DPMPP2SAncestralSampler(
        num_steps=8, discretization_config=DDPM_CFG
    )
    out = sampler(
        shrink_denoiser, jnp.asarray(x0), {"mu": jnp.asarray(mu)},
        rng=jax.random.PRNGKey(0),
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_lms_matches_numpy_loop():
    from panacea_tpu.diffusion.samplers import linear_multistep_coeff

    x0, mu = make_inputs()
    sig = np_sigmas(6).astype(np.float64)
    x = x0 * np.sqrt(1 + sig[0] ** 2)
    ds = []
    order = 4
    for i in range(len(sig) - 1):
        den = np_denoise(x, np.full(x.shape[0], sig[i]), mu)
        d = (x - den) / sig[i]
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur = min(i + 1, order)
        coeffs = [linear_multistep_coeff(cur, sig, i, j) for j in range(cur)]
        x = x + sum(c * dd for c, dd in zip(coeffs, reversed(ds)))
    sampler = LinearMultistepSampler(num_steps=6, discretization_config=DDPM_CFG)
    out = sampler(shrink_denoiser, jnp.asarray(x0), {"mu": jnp.asarray(mu)})
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=1e-5)


def test_cfg_guider_batching():
    g = VanillaCFG(scale=5.0)
    x = jnp.ones((2, 3))
    s = jnp.ones((2,))
    c = {"crossattn": jnp.ones((2, 4)), "other": "same"}
    uc = {"crossattn": jnp.zeros((2, 4)), "other": "same"}
    x2, s2, cc = g.prepare_inputs(x, s, c, uc)
    assert x2.shape == (4, 3) and s2.shape == (4,)
    np.testing.assert_allclose(np.asarray(cc["crossattn"][:2]), 0.0)
    np.testing.assert_allclose(np.asarray(cc["crossattn"][2:]), 1.0)
    # combine: uncond + scale*(cond - uncond)
    pred = jnp.concatenate([jnp.zeros((2, 3)), jnp.ones((2, 3))])
    out = g(pred, s)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_sampler_jits_once():
    """The whole sampler must trace into a single jitted call."""
    x0, mu = make_inputs()
    sampler = EulerEDMSampler(num_steps=8, discretization_config=DDPM_CFG)

    calls = {"n": 0}

    def denoiser(x, sigma, cond):
        calls["n"] += 1
        return shrink_denoiser(x, sigma, cond)

    f = jax.jit(lambda x, mu: sampler(denoiser, x, {"mu": mu}))
    out1 = f(jnp.asarray(x0), jnp.asarray(mu))
    out2 = f(jnp.asarray(x0), jnp.asarray(mu))
    # traced once inside scan -> python-level denoiser called once
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
