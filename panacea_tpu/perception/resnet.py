"""ResNet-50 backbone (flax, channels-last) for the StreamPETR eval detector.

Equivalent of the mmdet ResNet used by the reference eval harness
(metrics/.../streampetr_r50_atss_512x256_window.py:46-55): depth 50,
out_indices (0,1,2,3), BN in eval mode (norm_eval=True) — batch norm runs on
stored running statistics, matching frozen-BN inference semantics.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BN with running stats as parameters (eval-mode semantics)."""

    dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale / jnp.sqrt(var + self.eps)
        return (x - mean) * inv + bias


class Bottleneck(nn.Module):
    """torchvision/mmdet 'pytorch-style' bottleneck: stride on the 3x3."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn3")(h)
        if self.downsample:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            x = FrozenBatchNorm(dtype=self.dtype, name="ds_bn")(x)
        return nn.relu(x + h)


class ResNet50(nn.Module):
    """Returns the four stage outputs (C2..C5), strides 4/8/16/32."""

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        outs = []
        planes = 64
        for si, n_blocks in enumerate(self.stage_blocks):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                h = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{si + 1}_{bi}",
                )(h)
            outs.append(h)
            planes *= 2
        return tuple(outs)
