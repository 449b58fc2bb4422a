"""GridMask augmentation for detector training.

Equivalent of metrics/.../models/utils/grid_mask.py (use_grid_mask=True in the
eval config): masks a regular grid of square holes with random period, offset
and rotation-free variant (rotate=1 in the reference config path is a no-op
range). Functional JAX: explicit PRNG key, applied with probability
``prob`` (ratio 0.5, mode=1 -> keep inside squares, zero elsewhere inverted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    imgs: jnp.ndarray,
    ratio: float = 0.5,
    prob: float = 0.7,
    mode: int = 1,
    d_range=None,
) -> jnp.ndarray:
    """imgs: (..., H, W, C). Random grid period d uniform over [2, H) —
    the reference's full range (grid_mask.py:92: np.random.randint(2, h)),
    so tiny AND near-image-size hole periods both occur. ``d_range``
    overrides with absolute (lo, hi)."""
    h, w = imgs.shape[-3], imgs.shape[-2]
    lo, hi = d_range if d_range is not None else (2, max(h, 3))
    k_apply, k_d, k_ox, k_oy = jax.random.split(rng, 4)
    d = jax.random.randint(k_d, (), lo, hi)
    keep = jnp.int32(jnp.ceil(d.astype(jnp.float32) * ratio))
    ox = jax.random.randint(k_ox, (), 0, jnp.maximum(d, 1))
    oy = jax.random.randint(k_oy, (), 0, jnp.maximum(d, 1))
    yy = (jnp.arange(h)[:, None] + oy) % jnp.maximum(d, 1)
    xx = (jnp.arange(w)[None, :] + ox) % jnp.maximum(d, 1)
    hole = (yy < keep) & (xx < keep)
    mask = hole if mode == 1 else ~hole
    mask = mask[..., None].astype(imgs.dtype)
    masked = imgs * (1.0 - mask)
    apply = jax.random.bernoulli(k_apply, prob)
    return jnp.where(apply, masked, imgs)
