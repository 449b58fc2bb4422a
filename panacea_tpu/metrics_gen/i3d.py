"""I3D (Inflated Inception-V1) video feature extractor for FVD (flax).

FVD's reference features come from an I3D trained on Kinetics-400; this is the
standard inflated GoogLeNet topology producing 1024-d pooled video features
(and 400-way logits). Weights convert from a pytorch-i3d checkpoint via
utils.convert.build_i3d_mapping (tree coverage + Unit3D semantics pinned in
tests/test_metric_tower_convert.py); random init supports architecture tests
offline.

Input: (N, T, H, W, 3) in [-1, 1], T >= 9 recommended (224x224 frames).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Unit3D(nn.Module):
    ch: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.ch, self.kernel, strides=self.strides, padding=pad,
                    use_bias=not self.use_bn, dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            c = x.shape[-1]
            scale = self.param("bn_scale", nn.initializers.ones, (c,))
            bias = self.param("bn_bias", nn.initializers.zeros, (c,))
            mean = self.param("bn_mean", nn.initializers.zeros, (c,))
            var = self.param("bn_var", nn.initializers.ones, (c,))
            x = (x - mean) * (scale / jnp.sqrt(var + 1e-3)) + bias
        if self.act:
            x = nn.relu(x)
        return x


class InceptionModule3D(nn.Module):
    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        o0 = Unit3D(self.b0, name="b0", dtype=self.dtype)(x)
        o1 = Unit3D(self.b1a, name="b1a", dtype=self.dtype)(x)
        o1 = Unit3D(self.b1b, (3, 3, 3), name="b1b", dtype=self.dtype)(o1)
        o2 = Unit3D(self.b2a, name="b2a", dtype=self.dtype)(x)
        o2 = Unit3D(self.b2b, (3, 3, 3), name="b2b", dtype=self.dtype)(o2)
        o3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=((1, 1), (1, 1), (1, 1)))
        o3 = Unit3D(self.b3, name="b3", dtype=self.dtype)(o3)
        return jnp.concatenate([o0, o1, o2, o3], axis=-1)


class I3D(nn.Module):
    """Feature tower -> (N, 1024) pooled features (+ optional logits)."""

    num_classes: int = 400
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_logits: bool = False):
        # three temporal stride-2 stages: T < 8 collapses the frame axis to
        # zero-size tensors (silent NaN features)
        assert x.shape[1] >= 8, (
            f"I3D needs >= 8 frames, got {x.shape[1]}")
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a",
                   dtype=self.dtype)(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = Unit3D(64, name="Conv3d_2b", dtype=self.dtype)(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c", dtype=self.dtype)(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = InceptionModule3D(64, 96, 128, 16, 32, 32, name="Mixed_3b",
                              dtype=self.dtype)(x)
        x = InceptionModule3D(128, 128, 192, 32, 96, 64, name="Mixed_3c",
                              dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1), (1, 1), (1, 1)))
        x = InceptionModule3D(192, 96, 208, 16, 48, 64, name="Mixed_4b",
                              dtype=self.dtype)(x)
        x = InceptionModule3D(160, 112, 224, 24, 64, 64, name="Mixed_4c",
                              dtype=self.dtype)(x)
        x = InceptionModule3D(128, 128, 256, 24, 64, 64, name="Mixed_4d",
                              dtype=self.dtype)(x)
        x = InceptionModule3D(112, 144, 288, 32, 64, 64, name="Mixed_4e",
                              dtype=self.dtype)(x)
        x = InceptionModule3D(256, 160, 320, 32, 128, 128, name="Mixed_4f",
                              dtype=self.dtype)(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = InceptionModule3D(256, 160, 320, 32, 128, 128, name="Mixed_5b",
                              dtype=self.dtype)(x)
        x = InceptionModule3D(384, 192, 384, 48, 128, 128, name="Mixed_5c",
                              dtype=self.dtype)(x)
        feats = jnp.mean(x, axis=(1, 2, 3))  # (N, 1024)
        if return_logits:
            pooled = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            logits = Unit3D(self.num_classes, use_bn=False, act=False,
                            dtype=self.dtype, name="logits")(pooled)
            return feats, logits.reshape(x.shape[0], self.num_classes)
        return feats
