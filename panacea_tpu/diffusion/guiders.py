"""Classifier-free guidance (sgm/modules/diffusionmodules/guiders.py:8-53).

``VanillaCFG`` batches the unconditional and conditional branches into one network
call — on TPU this doubles the per-chip batch fed to the MXU instead of doing two
launches, and splits afterwards.
"""

from __future__ import annotations

import jax.numpy as jnp

from panacea_tpu.registry import instantiate_from_config

_CFG_CAT_KEYS = ("vector", "crossattn", "concat", "cond_feat", "cond_bev_feat",
                 "guided_hint")


class NoDynamicThresholding:
    def __call__(self, uncond, cond, scale):
        return uncond + scale * (cond - uncond)


class VanillaCFG:
    def __init__(self, scale: float, dyn_thresh_config=None):
        self.scale = scale
        self.dyn_thresh = (
            instantiate_from_config(dyn_thresh_config)
            if dyn_thresh_config is not None
            else NoDynamicThresholding()
        )

    def __call__(self, x, sigma):
        x_u, x_c = jnp.split(x, 2, axis=0)
        return self.dyn_thresh(x_u, x_c, self.scale)

    def prepare_inputs(self, x, s, c, uc):
        c_out = {}
        for k in c:
            if k in _CFG_CAT_KEYS:
                c_out[k] = jnp.concatenate((uc[k], c[k]), axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x]), jnp.concatenate([s, s]), c_out


class IdentityGuider:
    def __call__(self, x, sigma):
        return x

    def prepare_inputs(self, x, s, c, uc):
        return x, s, dict(c)
