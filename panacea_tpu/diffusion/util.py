"""Shared diffusion math utilities (JAX).

Functional equivalents of reference helpers in sgm/util.py and
sgm/modules/diffusionmodules/util.py — re-derived for JAX, not translated.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims until ``x.ndim == target_ndim``.

    (reference semantics: sgm/util.py:192-199)
    """
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def append_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Append a single zero to a 1-D sigma schedule (sgm/util.py:188-189)."""
    return jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])


def make_beta_schedule(
    schedule: str = "linear",
    n_timestep: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
) -> np.ndarray:
    """DDPM beta schedule; 'linear' is sqrt-space linear as in LDM.

    (reference semantics: sgm/modules/diffusionmodules/util.py:19-33)
    """
    if schedule != "linear":
        raise NotImplementedError(f"unsupported beta schedule: {schedule}")
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
        ** 2
    )


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, ``concat([cos, sin])`` ordering.

    NOTE the reference puts cos first (sgm/modules/diffusionmodules/util.py:224-246);
    checkpoint parity requires matching that order.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sincos_1d_embedding(pos_len: int, dim: int, legacy_int_freq: bool = True) -> np.ndarray:
    """1-D absolute sin/cos positional embedding for the temporal attention axis.

    The reference implementation (sgm/modules/attention.py:1140-1159) truncates the
    frequency vector ``1/10000^(i/(d/2))`` to int64, collapsing every frequency
    except the first to zero, so the effective embedding is
    ``[sin(t), cos(t), 0, 1, 0, 1, ...]``. The shipped checkpoint was trained with
    that embedding, so ``legacy_int_freq=True`` reproduces it exactly;
    ``legacy_int_freq=False`` gives the standard transformer sin/cos embedding.
    """
    assert dim % 2 == 0, "embedding dim must be even"
    inv_freq = 1.0 / np.power(
        10000.0, np.arange(dim // 2, dtype=np.float64) / (dim / 2)
    )
    if legacy_int_freq:
        inv_freq = inv_freq.astype(np.int64).astype(np.float64)
    pos = np.arange(pos_len, dtype=np.float64)
    angles = pos[:, None] * inv_freq[None, :]
    emb = np.zeros((pos_len, dim), dtype=np.float32)
    emb[:, 0::2] = np.sin(angles)
    emb[:, 1::2] = np.cos(angles)
    return emb
