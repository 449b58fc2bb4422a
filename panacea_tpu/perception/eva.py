"""EVA-style ViT detection backbone (flax).

Equivalent of metrics/.../models/backbones/eva.py (EVA-02 ViT with
xformers/flash-attn): patch embed, transformer blocks with window attention on
most layers and global attention on a subset, SwiGLU MLP, sub-LN, and a simple
feature pyramid (stride-2 deconvs / pools from the final map) as in ViTDet.
The fused attention op replaces the CUDA flash-attn dependency.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.ops.attention import attention, merge_heads, split_heads

Dtype = Any


def _window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C) with padding."""
    b, h, w, c = x.shape
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    x = x.reshape(b, hh // ws, ws, ww // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    return x, (hh, ww)


def _window_unpartition(x, ws: int, padded_hw, out_hw):
    hh, ww = padded_hw
    h, w = out_hw
    b = x.shape[0] // ((hh // ws) * (ww // ws))
    x = x.reshape(b, hh // ws, ww // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)
    return x[:, :h, :w]


class EVABlock(nn.Module):
    width: int
    heads: int
    window_size: int = 0  # 0 = global attention
    mlp_ratio: float = 4 * 2 / 3  # SwiGLU sizing
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            y, padded = _window_partition(y, self.window_size)
        else:
            y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(y)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(y)
        out = attention(
            split_heads(q, self.heads), split_heads(k, self.heads),
            split_heads(v, self.heads),
        )
        y = nn.Dense(c, dtype=self.dtype, name="out_proj")(merge_heads(out))
        if self.window_size > 0:
            y = _window_unpartition(y, self.window_size, padded, (h, w))
        else:
            y = y.reshape(b, h, w, c)
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        inner = int(c * self.mlp_ratio)
        g = nn.Dense(inner, dtype=self.dtype, name="mlp_gate")(y)
        u = nn.Dense(inner, dtype=self.dtype, name="mlp_up")(y)
        y = nn.silu(g) * u  # SwiGLU
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_norm")(y)  # sub-LN
        y = nn.Dense(c, dtype=self.dtype, name="mlp_down")(y)
        return x + y


class EVAViT(nn.Module):
    """Returns 4 feature levels (strides 4/8/16/32) from the stride-16 ViT map
    via ViTDet-style resampling."""

    patch_size: int = 16
    width: int = 768
    heads: int = 12
    layers: int = 12
    window_size: int = 16
    global_indices: Sequence[int] = (2, 5, 8, 11)
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        b = x.shape[0]
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        hh, ww = h.shape[1], h.shape[2]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hh, ww, self.width))
        h = h + pos.astype(h.dtype)
        for i in range(self.layers):
            ws = 0 if i in self.global_indices else self.window_size
            h = EVABlock(self.width, self.heads, window_size=ws,
                         dtype=self.dtype, name=f"block_{i}")(h)
        # ViTDet simple pyramid from the stride-16 map
        c = self.out_channels
        p16 = nn.Conv(c, (1, 1), dtype=self.dtype, name="lat16")(h)
        up8 = nn.ConvTranspose(self.width // 2, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="up8")(h)
        p8 = nn.Conv(c, (1, 1), dtype=self.dtype, name="lat8")(nn.gelu(up8))
        up4 = nn.ConvTranspose(self.width // 4, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="up4")(nn.gelu(up8))
        p4 = nn.Conv(c, (1, 1), dtype=self.dtype, name="lat4")(nn.gelu(up4))
        p32 = nn.Conv(c, (1, 1), dtype=self.dtype, name="lat32")(
            nn.max_pool(h, (2, 2), strides=(2, 2))
        )
        return (p4, p8, p16, p32)
