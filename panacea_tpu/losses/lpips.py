"""LPIPS perceptual loss (flax).

Equivalent of sgm/modules/autoencoding/lpips/loss/lpips.py:1-147: VGG16
feature stack, per-layer unit-normalize, learned 1x1 linear heads, spatial
mean, summed over the 5 tap layers. Weights (torchvision VGG16 + the LPIPS
linear heads) convert via utils.convert.build_vgg16_lpips_mapping — full
output parity vs the reference module is pinned in
tests/test_metric_tower_convert.py::test_lpips_full_parity.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# channels of the 5 VGG16 tap points (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
VGG_TAPS = (64, 128, 256, 512, 512)
# imagenet scaling used by lpips (shift/scale in [-1,1] space)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 conv stack up to relu5_3, returning the 5 LPIPS taps."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        cfg = [
            (64, 2), (128, 2), (256, 3), (512, 3), (512, 3),
        ]
        taps = []
        li = 0
        for bi, (ch, n) in enumerate(cfg):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{li}")(x)
                x = nn.relu(x)
                li += 1
            taps.append(x)
            if bi < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance d(x, y); inputs (N, H, W, 3) in [-1, 1]."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        xs = vgg((x - _SHIFT) / _SCALE)
        ys = vgg((y - _SHIFT) / _SCALE)
        total = 0.0
        for i, (fx, fy) in enumerate(zip(xs, ys)):
            d = (_normalize_tensor(fx) - _normalize_tensor(fy)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin{i}")
            total = total + jnp.mean(lin(d), axis=(1, 2))
        return total  # (N, 1)
