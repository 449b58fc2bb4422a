"""Legacy (non-transformer) UNet attention — the use_spatial_transformer=False
path (openaimodel.py:544-775: AttentionBlock / AttentionBlock3D /
QKVAttentionLegacy / QKVAttention).

No shipped config selects it (every panacea config runs the spatial
transformer), but the flag is config-reachable, so the capability exists
here too. Channels-last; faithful quirks preserved:

  * the dual-sqrt scaling (q*s) @ (k*s) with s = 1/sqrt(sqrt(d))
    (openaimodel.py:717-721 — "more stable with f16 than dividing after");
  * the LEGACY head/qkv split order: the fused qkv channel layout is
    heads-major, (q,k,v)-within-head (QKVAttentionLegacy, :699-724), vs the
    "new order" (q,k,v)-major (QKVAttention, :731-760);
  * AttentionBlock3D's temporal branch applies the SPATIAL ``qkv``
    projection (openaimodel.py:670-671 uses self.qkv, NOT the constructed
    self.qkv_temporal — a reference bug we reproduce; the dead
    qkv_temporal params are still created so checkpoints map 1:1).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.models.layers import GroupNorm

Dtype = Any


def qkv_attention(qkv: jnp.ndarray, n_heads: int,
                  legacy_order: bool = True) -> jnp.ndarray:
    """qkv: (N, L, 3*H*ch) channels-last (the reference's [N, width, L]
    transposed). Returns (N, L, H*ch)."""
    n, length, width = qkv.shape
    assert width % (3 * n_heads) == 0, (width, n_heads)
    ch = width // (3 * n_heads)
    if legacy_order:
        # heads-major, (q,k,v) within each head (QKVAttentionLegacy)
        x = qkv.reshape(n, length, n_heads, 3 * ch)
        q, k, v = jnp.split(x, 3, axis=-1)
    else:
        # (q,k,v)-major, heads within each (QKVAttention)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, length, n_heads, ch)
        k = k.reshape(n, length, n_heads, ch)
        v = v.reshape(n, length, n_heads, ch)
    scale = 1.0 / jnp.sqrt(jnp.sqrt(float(ch)))
    logits = jnp.einsum("nthc,nshc->nhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nshc->nthc", w, v)
    return out.reshape(n, length, n_heads * ch)


class LegacyAttentionBlock3D(nn.Module):
    """AttentionBlock3D (openaimodel.py:603-677): spatial self-attention +
    residual, then per-pixel temporal self-attention + residual. The plain
    2D AttentionBlock (:544-601) is this module's spatial half
    (``temporal=False``)."""

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    num_frames: int = 8
    temporal: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        heads = (self.num_heads if self.num_head_channels == -1
                 else c // self.num_head_channels)
        n, hh, ww, _ = x.shape
        legacy = not self.use_new_attention_order

        # conv_nd(1, C, 3C, 1) == a Dense over channels
        qkv_w = nn.Dense(3 * c, dtype=self.dtype, name="qkv")
        proj = nn.Dense(c, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="proj_out")

        h = GroupNorm(dtype=self.dtype, name="norm")(x)
        tokens = qkv_w(h.reshape(n, hh * ww, c))
        h = qkv_attention(tokens, heads, legacy_order=legacy)
        x = x + proj(h).reshape(n, hh, ww, c)
        if not self.temporal:
            return x

        # temporal half: (b t) h w c -> (b h w) t c
        t = self.num_frames
        b = n // t
        xt = x.reshape(b, t, hh, ww, c).transpose(0, 2, 3, 1, 4)
        xt = xt.reshape(b * hh * ww, t, c)
        ht = GroupNorm(dtype=self.dtype, name="norm_temporal")(
            xt[:, None])[:, 0]
        # reference bug preserved: the SPATIAL qkv projection is applied
        # here (openaimodel.py:670); qkv_temporal exists only as dead params
        _ = nn.Dense(3 * c, dtype=self.dtype, name="qkv_temporal")
        _(jnp.zeros((1, 1, c), self.dtype))  # materialize the dead params
        tokens_t = qkv_w(ht)
        ht = qkv_attention(tokens_t, heads, legacy_order=legacy)
        proj_t = nn.Dense(c, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="proj_out_temporal")
        out = xt + proj_t(ht)
        out = out.reshape(b, hh, ww, t, c).transpose(0, 3, 1, 2, 4)
        return out.reshape(n, hh, ww, c)
