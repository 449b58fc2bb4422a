"""EVA-02 ViT detection backbone (flax) — reference-faithful.

Mirrors metrics/.../models/backbones/eva.py (EVAViT) + blocks.py exactly so
converted reference weights reproduce outputs:

  * patch embed (conv s16), absolute pos embed (interpolated at conversion)
  * 2D axial rotary embedding (VisionRotaryEmbeddingFast, blocks.py:326-365):
    per-axis 'lang' freqs on half the head dim, interleaved-pair rotation
  * attention with separate q/k/v projections, learnable q/v bias and NO k
    bias (eva.py:83-92); xformers flash-attn replaced by the fused attention op
  * SwiGLU MLP with sub-LN (eva.py:37-61: w1/w2 -> silu(w1)*w2 -> ffn_ln -> w3)
  * window attention on most blocks (window_block_indexes), full-map
    ("global_window_size") attention on the rest; optional ResBottleneckBlock
    after the MLP (eva.py:137-232)
  * SimpleFeaturePyramid (eva.py:698-804): per-scale deconv/pool resamplers
    with LN-normed 1x1 + 3x3 output convs

Param names track the torch module tree for a 1:1 converter mapping
(utils/convert.py:build_eva_mapping).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from panacea_tpu.ops.attention import attention, merge_heads, split_heads

Dtype = Any


def _window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C) with padding (blocks.py window_partition)."""
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


def rope_cos_sin(grid_hw: Tuple[int, int], head_dim: int,
                 pt_seq_len: int = 16, theta: float = 10000.0):
    """VisionRotaryEmbeddingFast tables (blocks.py:326-363) for an (H, W)
    token grid: per-axis freqs on dim_half = head_dim//2, each base freq
    interleave-repeated x2, rows' freqs in the first half of head_dim and
    cols' in the second (broadcat dim=-1). Square grids with
    H == W == ft_seq_len bit-match the reference tables."""
    dim_half = head_dim // 2
    base = 1.0 / (theta ** (np.arange(0, dim_half, 2)[: dim_half // 2]
                            / dim_half))

    def axis_tab(n):
        t = np.arange(n) / n * pt_seq_len
        fr = np.einsum("i,f->if", t, base)
        return np.repeat(fr, 2, axis=-1)  # (n, dim_half), interleaved repeat

    h, w = grid_hw
    rows = np.broadcast_to(axis_tab(h)[:, None, :], (h, w, dim_half))
    cols = np.broadcast_to(axis_tab(w)[None, :, :], (h, w, dim_half))
    full = np.concatenate([rows, cols], axis=-1).reshape(h * w, head_dim)
    return np.cos(full), np.sin(full)


def apply_rope(x, cos, sin):
    """x: (..., N, head_dim); interleaved-pair rotation (blocks.py rotate_half:
    pairs are (even, odd) lanes)."""
    x2 = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


class EVAAttention(nn.Module):
    """eva.py:64-134: separate q/k/v no-bias Linears + learnable q/v bias
    (k has none), rope on q/k, out proj."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.width
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="v_proj")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        q = q + q_bias.astype(q.dtype)
        v = v + v_bias.astype(v.dtype)
        # split_heads: (B, N, H, D); tables (N, D) -> (N, 1, D) over heads
        qh = apply_rope(split_heads(q, self.heads), cos[:, None], sin[:, None])
        kh = apply_rope(split_heads(k, self.heads), cos[:, None], sin[:, None])
        out = attention(qh.astype(v.dtype), kh.astype(v.dtype),
                        split_heads(v, self.heads))
        return nn.Dense(c, dtype=self.dtype, name="proj")(merge_heads(out))


class ChannelLN(nn.Module):
    """detectron2 get_norm('LN') — LayerNorm over the channel axis of a
    feature map (channels-last here)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            name="ln")(x)


class ResBottleneckBlock(nn.Module):
    """eva.py:137-232: 1x1 -> 3x3 -> 1x1 convs (no bias), LN norms, GELU
    between; norm3 zero-init; residual add."""

    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.width // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="norm3")(h)
        return x + h


class EVABlock(nn.Module):
    """eva.py:233-310 Block: pre-LN attention (windowed or full-map) +
    sub-LN SwiGLU MLP + optional residual bottleneck."""

    width: int
    heads: int
    window_size: int = 0  # 0 = attend over the full map in one window
    mlp_ratio: float = 4 * 2 / 3
    use_residual_block: bool = False
    pt_seq_len: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            y, padded = _window_partition(y, self.window_size)
            grid = (self.window_size, self.window_size)
        else:
            y = y.reshape(b, h * w, c)
            grid = (h, w)
        cos, sin = rope_cos_sin(grid, c // self.heads,
                                pt_seq_len=self.pt_seq_len)
        cos = jnp.asarray(cos, dtype=y.dtype)
        sin = jnp.asarray(sin, dtype=y.dtype)
        y = EVAAttention(self.width, self.heads, dtype=self.dtype,
                         name="attn")(y, cos, sin)
        if self.window_size > 0:
            y = _window_unpartition(y, self.window_size, padded, (h, w))
        else:
            y = y.reshape(b, h, w, c)
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        inner = int(c * self.mlp_ratio)
        x1 = nn.Dense(inner, dtype=self.dtype, name="w1")(y)
        x2 = nn.Dense(inner, dtype=self.dtype, name="w2")(y)
        y = nn.silu(x1) * x2
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_ln")(y)
        y = nn.Dense(c, dtype=self.dtype, name="w3")(y)
        x = x + y
        if self.use_residual_block:
            x = ResBottleneckBlock(self.width, dtype=self.dtype,
                                   name="residual")(x)
        return x


class SimpleFeaturePyramid(nn.Module):
    """eva.py:698-804: per-scale resampler (deconv x2 / identity / pool) +
    LN-normed 1x1 and 3x3 convs (bias-free). scale_factors relative to the
    stride-16 map."""

    in_channels: int
    out_channels: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = self.in_channels
        outs = []
        for scale in self.scale_factors:
            stage = int(np.log2(16 / scale))
            name = f"simfp_{stage}"
            h = x
            if scale == 4.0:
                h = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"{name}_up1")(h)
                h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{name}_upln")(h)
                h = nn.gelu(h, approximate=False)
                h = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"{name}_up2")(h)
            elif scale == 2.0:
                h = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name=f"{name}_up1")(h)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                raise NotImplementedError(f"scale {scale}")
            h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"{name}_lateral")(h)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"{name}_lateral_ln")(h)
            h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"{name}_out")(h)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"{name}_out_ln")(h)
            outs.append(h)
        return tuple(outs)


class EVAViT(nn.Module):
    """eva.py:312-585 (+ forward ~585-696): patch embed + abs pos + blocks +
    SimpleFeaturePyramid. Defaults follow the in-repo EVA-02-L comment block
    (eva.py:806-830) scaled by constructor args."""

    patch_size: int = 16
    width: int = 768
    heads: int = 12
    layers: int = 12
    window_size: int = 16
    # blocks NOT in window_block_indexes attend over the full map
    window_block_indexes: Sequence[int] = (0, 1, 3, 4, 6, 7, 9, 10)
    residual_block_indexes: Sequence[int] = ()
    pt_hw_seq_len: int = 16
    out_channels: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    # > 0 gives the CBEVAViT composite-backbone forward (eva.py:522-695):
    # after a full pass, the activation saved at block fusion_stage-1 is
    # added back and blocks >= fusion_stage run a second time
    fusion_stage: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        hh, ww = h.shape[1], h.shape[2]
        # stored at the working grid; the converter interpolates the
        # (1, n_pos(+cls), C) reference table to this shape (get_abs_pos)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hh, ww, self.width))
        h = h + pos.astype(h.dtype)
        blocks = [
            EVABlock(self.width, self.heads,
                     window_size=(self.window_size
                                  if i in self.window_block_indexes else 0),
                     use_residual_block=(i in self.residual_block_indexes),
                     pt_seq_len=self.pt_hw_seq_len,
                     dtype=self.dtype, name=f"block_{i}")
            for i in range(self.layers)
        ]
        res = None
        for i, blk in enumerate(blocks):
            h = blk(h)
            if self.fusion_stage and i == self.fusion_stage - 1:
                res = h
        if self.fusion_stage:
            h = h + res
            for i, blk in enumerate(blocks):
                if i >= self.fusion_stage:
                    h = blk(h)
        return SimpleFeaturePyramid(
            self.width, self.out_channels, self.scale_factors,
            dtype=self.dtype, name="adapter")(h)
