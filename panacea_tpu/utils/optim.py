"""Optimizer factories (optax) behind the reference's torch.optim config surface
(sgm/models/diffusion.py:217-230 instantiates torch.optim.AdamW by target)."""

from __future__ import annotations

import optax


def AdamW(params=None, lr: float = 1e-4, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 1e-2, **kwargs):
    """Returns an optax gradient transformation. ``params`` is accepted for
    config-surface parity but unused (optax inits from the pytree at
    ``opt.init``)."""
    return optax.adamw(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay,
    )


def Adam(params=None, lr: float = 1e-4, betas=(0.9, 0.999), eps: float = 1e-8,
         **kwargs):
    return optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
