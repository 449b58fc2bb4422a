"""Exponential moving average over parameter pytrees.

Functional equivalent of the reference LitEma (sgm/modules/ema.py:5-86):
warmup-ramped decay ``min(decay, (1+n)/(10+n))``, plus store/copy/restore
expressed as pure pytree ops.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    ema_params: Any
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params, use_num_updates: bool = True) -> EmaState:
    n = jnp.asarray(0 if use_num_updates else -1, dtype=jnp.int32)
    return EmaState(jax.tree.map(jnp.asarray, params), n)


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    d = jnp.where(
        n >= 0,
        jnp.minimum(decay, (1.0 + n) / (10.0 + n)),
        decay,
    ).astype(jnp.float32)
    new_ema = jax.tree.map(
        lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)), state.ema_params, params
    )
    return EmaState(new_ema, n)
