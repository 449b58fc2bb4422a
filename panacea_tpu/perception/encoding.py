"""Positional encodings + MLN modulation for the PETR head.

Equivalents of metrics/.../models/utils/positional_encoding.py:14-61 and
misc.py:178-213 (MLN: latent-modulated LayerNorm).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _sine_emb(pos: jnp.ndarray, num_pos_feats: int, temperature: float):
    """(..., 1)-sliced helper: returns interleaved sin/cos of pos/dim_t."""
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    p = pos[..., None] / dim_t
    return jnp.stack(
        [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
    ).reshape(p.shape[:-1] + (num_pos_feats,))


def pos2posemb3d(pos, num_pos_feats: int = 128, temperature: float = 10000):
    """(..., 3) in [0,1] -> (..., 3*num_pos_feats); order (y, x, z)."""
    pos = pos * (2 * math.pi)
    ex = _sine_emb(pos[..., 0], num_pos_feats, temperature)
    ey = _sine_emb(pos[..., 1], num_pos_feats, temperature)
    ez = _sine_emb(pos[..., 2], num_pos_feats, temperature)
    return jnp.concatenate([ey, ex, ez], axis=-1)


def pos2posemb1d(pos, num_pos_feats: int = 256, temperature: float = 10000):
    pos = pos * (2 * math.pi)
    return _sine_emb(pos[..., 0], num_pos_feats, temperature)


def nerf_positional_encoding(x, num_encoding_functions: int = 6):
    """NeRF-style log-sampled sin/cos bands (positional_encoding.py:39-82).

    Feature ORDER matters for checkpoint conversion (this feeds the
    ego_pose_pe/ego_pose_memory MLN reduce weights): the reference emits
    [sin(f)*D, cos(f)*D] PER FREQUENCY (:73-75), not all sins then all
    coses — verified by torch parity (test_deformable_parity.py)."""
    bands = 2.0 ** jnp.linspace(0.0, num_encoding_functions - 1,
                                num_encoding_functions)
    xb = x[..., None, :] * bands[:, None]             # (..., F, D)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)   # (..., F, 2, D)
    return enc.reshape(
        x.shape[:-1] + (2 * num_encoding_functions * x.shape[-1],))


class MLN(nn.Module):
    """Latent-modulated LayerNorm: y = gamma(c) * LN(x) + beta(c), with
    gamma/beta zero-weight + (1,0)-bias init (misc.py:178-213)."""

    f_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        h = nn.Dense(self.f_dim, dtype=self.dtype, name="reduce")(c)
        h = nn.relu(h)
        gamma = nn.Dense(self.f_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, name="gamma")(h)
        beta = nn.Dense(self.f_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="beta")(h)
        out = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                           dtype=self.dtype)(x)
        return gamma * out + beta


class MLNv2(nn.Module):
    """Latent modulation WITHOUT the LayerNorm: y = gamma(c) * x + beta(c)
    (detr3d_transformer.py:24-56). Used by SparseHead's feature spatial
    alignment — NOT interchangeable with MLN (StreamPETRHead's alignment
    does LN, sparse's must not; verified by torch parity)."""

    f_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        h = nn.Dense(self.f_dim, dtype=self.dtype, name="reduce")(c)
        h = nn.relu(h)
        gamma = nn.Dense(self.f_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, name="gamma")(h)
        beta = nn.Dense(self.f_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="beta")(h)
        return gamma * x + beta
