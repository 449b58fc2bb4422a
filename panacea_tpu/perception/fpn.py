"""FPN neck for the eval detector (config: metrics/.../streampetr_r50_atss_
512x256_window.py:56-62): in (512,1024,2048) from start_level 1, out 256,
5 levels with extra convs on output (strides 8/16/32/64/128)."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class FPN(nn.Module):
    """use_checkpoint=True gives the reference's CPFPN semantics (cp_fpn.py —
    an FPN whose convs run under torch.utils.checkpoint; here jax.remat on
    the whole neck, the XLA-idiomatic equivalent)."""

    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        if self.use_checkpoint:
            return nn.remat(FPN._forward)(self, tuple(inputs))
        return self._forward(tuple(inputs))

    def _forward(self, inputs) -> Tuple[jnp.ndarray, ...]:
        feats = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        # extra levels from the last OUTPUT (add_extra_convs='on_output')
        src = outs[-1]
        for i in range(len(outs), self.num_outs):
            src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                          dtype=self.dtype, name=f"fpn_{i}")(src)
            outs.append(src)
        return tuple(outs)
