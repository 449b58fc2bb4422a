"""InceptionV3 feature extractor (flax) for FID.

Equivalent of the reference's pytorch-fid wrapper (modules.py:223-241
InceptionV3): the standard torchvision InceptionV3 topology up to the final
average pool (2048-d features). Weights convert from a torchvision/pytorch-fid
state dict via utils.convert.build_inception_mapping (tree coverage + unit-cell
semantics pinned in tests/test_metric_tower_convert.py); random init supports
architecture tests offline.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    ch: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * (scale / jnp.sqrt(var + 1e-3)) + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="b1x1", dtype=self.dtype)(x)
        b5 = ConvBN(48, (1, 1), name="b5_1", dtype=self.dtype)(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="b5_2", dtype=self.dtype)(b5)
        b3 = ConvBN(64, (1, 1), name="b3_1", dtype=self.dtype)(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="b3_2", dtype=self.dtype)(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="b3_3", dtype=self.dtype)(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = ConvBN(self.pool_ch, (1, 1), name="bpool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="b3", dtype=self.dtype)(x)
        bd = ConvBN(64, (1, 1), name="bd_1", dtype=self.dtype)(x)
        bd = ConvBN(96, (3, 3), padding=1, name="bd_2", dtype=self.dtype)(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="bd_3", dtype=self.dtype)(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="b1x1", dtype=self.dtype)(x)
        b7 = ConvBN(c7, (1, 1), name="b7_1", dtype=self.dtype)(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="b7_2",
                    dtype=self.dtype)(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="b7_3",
                    dtype=self.dtype)(b7)
        bd = ConvBN(c7, (1, 1), name="bd_1", dtype=self.dtype)(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="bd_2",
                    dtype=self.dtype)(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="bd_3",
                    dtype=self.dtype)(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="bd_4",
                    dtype=self.dtype)(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="bd_5",
                    dtype=self.dtype)(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = ConvBN(192, (1, 1), name="bpool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="b3_1", dtype=self.dtype)(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="b3_2",
                    dtype=self.dtype)(b3)
        b7 = ConvBN(192, (1, 1), name="b7_1", dtype=self.dtype)(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="b7_2",
                    dtype=self.dtype)(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="b7_3",
                    dtype=self.dtype)(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="b7_4",
                    dtype=self.dtype)(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="b1x1", dtype=self.dtype)(x)
        b3 = ConvBN(384, (1, 1), name="b3_1", dtype=self.dtype)(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="b3_2a",
                     dtype=self.dtype)(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="b3_2b",
                     dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="bd_1", dtype=self.dtype)(x)
        bd = ConvBN(384, (3, 3), padding=1, name="bd_2", dtype=self.dtype)(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="bd_3a",
                     dtype=self.dtype)(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="bd_3b",
                     dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = ConvBN(192, (1, 1), name="bpool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature tower to the 2048-d pooled features (pytorch-fid layout).
    Input: (N, 299, 299, 3) in [-1, 1]."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a",
                   dtype=self.dtype)(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a", dtype=self.dtype)(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b", dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, (1, 1), name="Conv2d_3b", dtype=self.dtype)(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a", dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7c", dtype=self.dtype)(x)
        return jnp.mean(x, axis=(1, 2))  # (N, 2048)
