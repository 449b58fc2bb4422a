"""Diffusion samplers as ``lax.scan`` loops.

TPU-native re-design of the reference k-diffusion-style samplers
(sgm/modules/diffusionmodules/sampling.py:24-365). Instead of a Python loop
re-dispatching kernels every step, the whole trajectory is a single ``lax.scan``
body compiled once by XLA — the 25-step Euler-EDM loop becomes one device program.
Sigma schedules (and LMS coefficients) are static NumPy, baked into the trace.

A ``denoiser`` here is a callable ``denoiser(x, sigma, cond) -> denoised`` already
closed over network + params (built by the engine).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.diffusion.util import append_dims
from panacea_tpu.registry import instantiate_from_config

DEFAULT_GUIDER = {"target": "panacea_tpu.diffusion.guiders.IdentityGuider"}

Denoiser = Callable[[jnp.ndarray, jnp.ndarray, Dict[str, Any]], jnp.ndarray]


def to_d(x, sigma, denoised):
    """Convert denoised prediction to the ODE derivative (sampling_utils.py:41-42)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def to_neg_log_sigma(sigma):
    return -jnp.log(sigma)


def to_sigma(neg_log_sigma):
    return jnp.exp(-neg_log_sigma)


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """(sampling_utils.py:27-38)"""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


def linear_multistep_coeff(order: int, t: np.ndarray, i: int, j: int, epsrel=1e-4) -> float:
    """Adams-Bashforth coefficient over the sigma grid (sampling_utils.py:14-24)."""
    from scipy import integrate

    if order - 1 > i:
        raise ValueError(f"order {order} too high for step {i}")

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=epsrel)[0]


class BaseDiffusionSampler:
    def __init__(
        self,
        discretization_config,
        num_steps: Optional[int] = None,
        guider_config=None,
        verbose: bool = False,
        device: str = "tpu",
    ):
        self.num_steps = num_steps
        self.discretization = instantiate_from_config(discretization_config)
        self.guider = instantiate_from_config(guider_config or DEFAULT_GUIDER)
        self.verbose = verbose

    def get_sigmas_np(self, num_steps: Optional[int] = None) -> np.ndarray:
        """Static (NumPy) sigma schedule, descending with appended zero — safe to
        inspect at trace time and bake into the compiled scan."""
        n = num_steps if num_steps is not None else self.num_steps
        if n is None:
            raise ValueError("num_steps must be set on the sampler or the call")
        sigmas = np.asarray(self.discretization.get_sigmas(n), dtype=np.float32)
        return np.append(sigmas, np.float32(0.0))

    def prepare_sampling_loop(self, x, cond, uc=None, num_steps=None):
        sigmas_np = self.get_sigmas_np(num_steps)
        sigmas = jnp.asarray(sigmas_np)
        uc = cond if uc is None else uc
        # EDM init scaling: x ~ N(0, I) -> x * sqrt(1 + sigma_0^2) (sampling.py:50)
        x = x * np.sqrt(1.0 + sigmas_np[0] ** 2, dtype=np.float32)
        s_in = jnp.ones((x.shape[0],), dtype=x.dtype)
        return x, s_in, sigmas, cond, uc

    def denoise(self, x, denoiser, sigma, cond, uc):
        denoised = denoiser(*self.guider.prepare_inputs(x, sigma, cond, uc))
        return self.guider(denoised, sigma)


class EDMSampler(BaseDiffusionSampler):
    """Euler/Heun family with optional churn (sampling.py:85-133)."""

    def __init__(self, s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.s_churn = s_churn
        self.s_tmin = s_tmin
        self.s_tmax = s_tmax
        self.s_noise = s_noise

    def _gammas(self, sigmas_np: np.ndarray) -> np.ndarray:
        n = len(sigmas_np)
        gammas = np.zeros(n - 1, dtype=np.float32)
        if self.s_churn > 0:
            g = min(self.s_churn / (n - 1), 2**0.5 - 1)
            mask = (sigmas_np[:-1] >= self.s_tmin) & (sigmas_np[:-1] <= self.s_tmax)
            gammas[mask] = g
        return gammas

    def _correction(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        raise NotImplementedError

    def __call__(self, denoiser: Denoiser, x, cond, uc=None, num_steps=None,
                 rng: Optional[jax.Array] = None,
                 return_trajectory: bool = False):
        """``return_trajectory`` additionally returns the post-step latent at
        every sampler step, stacked (n_steps, *x.shape) — the fixed-seed
        reference-parity comparison (scripts/compare_latents.py,
        docs/RUNBOOK.md) diffs these against the reference sampler's
        per-step ``x`` (sampling.py euler loop)."""
        x, s_in, sigmas, cond, uc = self.prepare_sampling_loop(x, cond, uc, num_steps)
        sigmas_np = self.get_sigmas_np(num_steps)
        gammas = jnp.asarray(self._gammas(sigmas_np))
        n_loop = len(sigmas_np) - 1
        if rng is None:
            rng = jax.random.PRNGKey(0)
        step_keys = jax.random.split(rng, n_loop)

        def step(carry, xs):
            x = carry
            sigma, next_sigma, gamma, key = xs
            sigma_b = s_in * sigma
            sigma_hat_b = sigma_b * (gamma + 1.0)
            if self.s_churn > 0:
                eps = jax.random.normal(key, x.shape, dtype=x.dtype) * self.s_noise
                churn = eps * append_dims(
                    jnp.sqrt(jnp.maximum(sigma_hat_b**2 - sigma_b**2, 0.0)), x.ndim
                )
                x = jnp.where(gamma > 0, x + churn, x)
            denoised = self.denoise(x, denoiser, sigma_hat_b, cond, uc)
            d = to_d(x, sigma_hat_b, denoised)
            dt = append_dims(s_in * next_sigma - sigma_hat_b, x.ndim)
            euler_step = x + dt * d
            x = self._correction(
                euler_step, x, d, dt, s_in * next_sigma, denoiser, cond, uc
            )
            return x, (x if return_trajectory else None)

        xs = (sigmas[:-1], sigmas[1:], gammas, step_keys)
        x, traj = jax.lax.scan(step, x, xs)
        return (x, traj) if return_trajectory else x


class EulerEDMSampler(EDMSampler):
    """Single-eval Euler step (sampling.py:214-218). The production Panacea sampler:
    25 steps, CFG 5.0 (configs/inference_nuscenes.yaml:115-126)."""

    def _correction(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        return euler_step


class HeunEDMSampler(EDMSampler):
    """2nd-order Heun correction, skipped on the final (sigma->0) step
    (sampling.py:221-241)."""

    def _correction(self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc):
        def corrected(es):
            denoised = self.denoise(es, denoiser, next_sigma, cond, uc)
            d_new = to_d(es, next_sigma, denoised)
            d_prime = (d + d_new) / 2.0
            return jnp.where(append_dims(next_sigma, x.ndim) > 0.0, x + d_prime * dt, es)

        return jax.lax.cond(
            jnp.sum(next_sigma) < 1e-14, lambda es: es, corrected, euler_step
        )


class AncestralSampler(BaseDiffusionSampler):
    def __init__(self, eta=1.0, s_noise=1.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.eta = eta
        self.s_noise = s_noise

    def ancestral_euler_step(self, x, denoised, sigma, sigma_down):
        d = to_d(x, sigma, denoised)
        dt = append_dims(sigma_down - sigma, x.ndim)
        return x + dt * d

    def ancestral_step(self, x, sigma, next_sigma, sigma_up, key):
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        return jnp.where(
            append_dims(next_sigma, x.ndim) > 0.0,
            x + noise * self.s_noise * append_dims(sigma_up, x.ndim),
            x,
        )

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, key):
        raise NotImplementedError

    def __call__(self, denoiser: Denoiser, x, cond, uc=None, num_steps=None,
                 rng: Optional[jax.Array] = None):
        x, s_in, sigmas, cond, uc = self.prepare_sampling_loop(x, cond, uc, num_steps)
        n_loop = sigmas.shape[0] - 1
        if rng is None:
            rng = jax.random.PRNGKey(0)
        step_keys = jax.random.split(rng, n_loop)

        def step(carry, xs):
            x = carry
            sigma, next_sigma, key = xs
            x = self.sampler_step(s_in * sigma, s_in * next_sigma, denoiser, x, cond, uc, key)
            return x, None

        x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:], step_keys))
        return x


class EulerAncestralSampler(AncestralSampler):
    """(sampling.py:244-251)"""

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, key):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised = self.denoise(x, denoiser, sigma, cond, uc)
        x = self.ancestral_euler_step(x, denoised, sigma, sigma_down)
        return self.ancestral_step(x, sigma, next_sigma, sigma_up, key)


class DPMPP2SAncestralSampler(AncestralSampler):
    """DPM-Solver++(2S) ancestral (sampling.py:254-287)."""

    @staticmethod
    def _get_variables(sigma, sigma_down):
        t, t_next = to_neg_log_sigma(sigma), to_neg_log_sigma(sigma_down)
        h = t_next - t
        s = t + 0.5 * h
        return h, s, t, t_next

    @staticmethod
    def _get_mult(h, s, t, t_next):
        mult1 = to_sigma(s) / to_sigma(t)
        mult2 = jnp.expm1(-0.5 * h)
        mult3 = to_sigma(t_next) / to_sigma(t)
        mult4 = jnp.expm1(-h)
        return mult1, mult2, mult3, mult4

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, key):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised = self.denoise(x, denoiser, sigma, cond, uc)
        x_euler = self.ancestral_euler_step(x, denoised, sigma, sigma_down)

        def second_order(_):
            # guard sigma_down=0: the branch result is discarded by the outer where
            sd = jnp.maximum(sigma_down, 1e-20)
            h, s, t, t_next = self._get_variables(sigma, sd)
            m = [append_dims(mm, x.ndim) for mm in self._get_mult(h, s, t, t_next)]
            x2 = m[0] * x - m[1] * denoised
            denoised2 = self.denoise(x2, denoiser, to_sigma(s), cond, uc)
            return m[2] * x - m[3] * denoised2

        x_dpmpp2s = jax.lax.cond(
            jnp.sum(sigma_down) < 1e-14, lambda _: x_euler, second_order, None
        )
        x = jnp.where(append_dims(sigma_down, x.ndim) > 0.0, x_dpmpp2s, x_euler)
        return self.ancestral_step(x, sigma, next_sigma, sigma_up, key)


class DPMPP2MSampler(BaseDiffusionSampler):
    """DPM-Solver++(2M) multistep (sampling.py:290-365)."""

    def __call__(self, denoiser: Denoiser, x, cond, uc=None, num_steps=None,
                 rng: Optional[jax.Array] = None):
        x, s_in, sigmas, cond, uc = self.prepare_sampling_loop(x, cond, uc, num_steps)
        n_loop = sigmas.shape[0] - 1
        # prev_sigma for step i is sigmas[i-1]; slot 0 is a dummy (branch discarded)
        prev_sigmas = jnp.concatenate([sigmas[:1] * 2.0, sigmas[:-2]])
        step_idx = jnp.arange(n_loop)

        def step(carry, xs):
            x, old_denoised = carry
            i, sigma, next_sigma, prev_sigma = xs
            sigma_b, next_b, prev_b = s_in * sigma, s_in * next_sigma, s_in * prev_sigma
            denoised = self.denoise(x, denoiser, sigma_b, cond, uc)

            t = to_neg_log_sigma(sigma_b)
            # next_sigma = 0 on the final step: t_next=inf, mult1=0, mult2=-1 —
            # x_standard collapses to `denoised` exactly as in the reference.
            t_next = to_neg_log_sigma(jnp.maximum(next_b, 1e-30))
            h = t_next - t
            mult1 = append_dims(to_sigma(t_next) / to_sigma(t), x.ndim)
            mult2 = append_dims(jnp.expm1(-h), x.ndim)
            x_standard = mult1 * x - mult2 * denoised

            h_last = t - to_neg_log_sigma(prev_b)
            r = h_last / jnp.maximum(h, 1e-30)
            mult3 = append_dims(1 + 1 / (2 * jnp.maximum(r, 1e-30)), x.ndim)
            mult4 = append_dims(1 / (2 * jnp.maximum(r, 1e-30)), x.ndim)
            denoised_d = mult3 * denoised - mult4 * old_denoised
            x_advanced = mult1 * x - mult2 * denoised_d

            use_standard = jnp.logical_or(i == 0, jnp.sum(next_b) < 1e-14)
            x = jnp.where(use_standard, x_standard, x_advanced)
            return (x, denoised), None

        init = (x, jnp.zeros_like(x))
        (x, _), _ = jax.lax.scan(
            step, init, (step_idx, sigmas[:-1], sigmas[1:], prev_sigmas)
        )
        return x


class LinearMultistepSampler(BaseDiffusionSampler):
    """Adams-Bashforth LMS (sampling.py:179-211). Coefficients are integrated with
    SciPy at trace time over the static sigma grid and baked into the scan."""

    def __init__(self, order: int = 4, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.order = order

    def __call__(self, denoiser: Denoiser, x, cond, uc=None, num_steps=None,
                 rng: Optional[jax.Array] = None):
        x, s_in, sigmas, cond, uc = self.prepare_sampling_loop(x, cond, uc, num_steps)
        sigmas_np = self.get_sigmas_np(num_steps).astype(np.float64)
        n_loop = len(sigmas_np) - 1
        # static (n_loop, order) coefficient table; unused slots zero
        coeff_table = np.zeros((n_loop, self.order), dtype=np.float32)
        for i in range(n_loop):
            cur_order = min(i + 1, self.order)
            for j in range(cur_order):
                coeff_table[i, j] = linear_multistep_coeff(cur_order, sigmas_np, i, j)
        coeffs = jnp.asarray(coeff_table)

        def step(carry, xs):
            x, ds_buf = carry  # ds_buf: (order, *x.shape), newest at index 0
            sigma, coeff = xs
            denoised = self.denoise(x, denoiser, s_in * sigma, cond, uc)
            d = to_d(x, s_in * sigma, denoised)
            ds_buf = jnp.concatenate([d[None], ds_buf[:-1]], axis=0)
            # reference iterates reversed(ds): newest gets coeff[0]
            x = x + jnp.tensordot(coeff, ds_buf, axes=(0, 0))
            return (x, ds_buf), None

        ds0 = jnp.zeros((self.order,) + x.shape, dtype=x.dtype)
        (x, _), _ = jax.lax.scan(step, (x, ds0), (sigmas[:-1], coeffs))
        return x
