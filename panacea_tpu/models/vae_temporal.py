"""Temporal VAE block variants (flax) — reference model.py:79-366, 479-541.

The reference autoencoder ships (unused by the production `ddconfig`, which
has no temporal blocks) a family of video-VAE building blocks: temporal
up/downsampling (Upsample1D/Downsample1D), a temporal residual block
(ResnetBlock1D), a spatial residual block that *carries* zero-init temporal
3D convs (ResnetBlock3D — note its forward never calls them,
model.py:338-366: dead-code parameters, mirrored faithfully), and a
single-head temporal attention block (MemoryEfficientAttnBlockTemporal,
model.py:479-541). They exist so video-VAE checkpoints load; kept here for
component parity.

Layouts are channels-last: spatial maps (B*T, H, W, C); the 1D blocks view
them as (B*H*W, T, C) per-pixel time series.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from panacea_tpu.models.layers import GroupNorm
from panacea_tpu.ops.attention import attention

Dtype = Any


def _to_time_major(x, num_frames: int):
    """(B*T, H, W, C) -> (B*H*W, T, C) (reference '(b t) c h w -> (b h w) c t')."""
    bt, h, w, c = x.shape
    b = bt // num_frames
    y = x.reshape(b, num_frames, h, w, c).transpose(0, 2, 3, 1, 4)
    return y.reshape(b * h * w, num_frames, c), (b, h, w)


def _from_time_major(y, shape):
    b, h, w = shape
    t = y.shape[1]
    c = y.shape[-1]
    x = y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
    return x.reshape(b * t, h, w, c)


class Upsample1D(nn.Module):
    """Temporal nearest x2 upsample + optional temporal conv (model.py:79-97)."""

    with_conv: bool = True
    num_frames: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y, shape = _to_time_major(x, self.num_frames)
        y = jnp.repeat(y, 2, axis=1)  # nearest along t
        if self.with_conv:
            y = nn.Conv(y.shape[-1], (3,), padding=1, dtype=self.dtype,
                        name="conv")(y)
        b, h, w = shape
        return _from_time_major(y, shape)


class Downsample1D(nn.Module):
    """Temporal stride-2 conv with asymmetric (0,1) padding, or avg-pool
    (model.py:117-138)."""

    with_conv: bool = True
    num_frames: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y, shape = _to_time_major(x, self.num_frames)
        if self.with_conv:
            y = jnp.pad(y, ((0, 0), (0, 1), (0, 0)))
            y = nn.Conv(y.shape[-1], (3,), strides=(2,), padding="VALID",
                        dtype=self.dtype, name="conv")(y)
        else:
            t = y.shape[1]
            y = y[:, : t - t % 2].reshape(y.shape[0], t // 2, 2, -1).mean(2)
        return _from_time_major(y, shape)


class ResnetBlock1D(nn.Module):
    """Temporal residual block (model.py:199-271): GroupNorm+SiLU+temporal
    conv x2 in (b h w) c t layout; conv1 zero-init; spatial 1x1/3x3 shortcut
    when channels change."""

    out_channels: Optional[int] = None
    use_conv_shortcut: bool = False
    num_frames: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.out_channels or cin
        h, shape = _to_time_major(x, self.num_frames)
        h = GroupNorm(dtype=self.dtype, with_silu=True, name="norm1")(h)
        h = nn.Conv(cout, (3,), padding=1, kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(dtype=self.dtype, with_silu=True, name="norm2")(h)
        h = nn.Conv(cout, (3,), padding=1, dtype=self.dtype, name="conv2")(h)
        h = _from_time_major(h, shape)
        if cin != cout:
            if self.use_conv_shortcut:
                x = nn.Conv(cout, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(cout, (1, 1), dtype=self.dtype,
                            name="nin_shortcut")(x)
        return x + h


class ResnetBlock3D(nn.Module):
    """VAE-side ResnetBlock3D (model.py:272-366): the forward path is the
    plain spatial ResnetBlock — the zero-init temporal Conv3d towers are
    CONSTRUCTED but never called (reference forward, model.py:338-366).
    Parameters are declared so video checkpoints restore 1:1."""

    out_channels: Optional[int] = None
    use_conv_shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.out_channels or cin
        h = GroupNorm(dtype=self.dtype, with_silu=True, name="norm1")(x)
        h = nn.Conv(cout, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        # dead-code temporal towers: params only (zero-init, never applied)
        GroupNorm(dtype=self.dtype, name="conv1_temporal_norm")(h)
        self.param("conv1_temporal_kernel", nn.initializers.zeros,
                   (3, 3, 3, cout, cout))
        self.param("conv1_temporal_bias", nn.initializers.zeros, (cout,))
        h = GroupNorm(dtype=self.dtype, with_silu=True, name="norm2")(h)
        h = nn.Conv(cout, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        GroupNorm(dtype=self.dtype, name="conv2_temporal_norm")(h)
        self.param("conv2_temporal_kernel", nn.initializers.zeros,
                   (3, 3, 3, cout, cout))
        self.param("conv2_temporal_bias", nn.initializers.zeros, (cout,))
        if cin != cout:
            if self.use_conv_shortcut:
                x = nn.Conv(cout, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_shortcut")(x)
                self.param("conv_shortcut_temporal_kernel",
                           nn.initializers.zeros, (3, 3, 3, cout, cout))
                self.param("conv_shortcut_temporal_bias",
                           nn.initializers.zeros, (cout,))
            else:
                x = nn.Conv(cout, (1, 1), dtype=self.dtype,
                            name="nin_shortcut")(x)
                self.param("nin_shortcut_temporal_kernel",
                           nn.initializers.zeros, (1, 1, 1, cout, cout))
                self.param("nin_shortcut_temporal_bias",
                           nn.initializers.zeros, (cout,))
        return x + h


class AttnBlockTemporal(nn.Module):
    """MemoryEfficientAttnBlockTemporal (model.py:479-541): single-head
    self-attention along the frame axis per pixel; 1x1-conv q/k/v/out."""

    num_frames: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y, shape = _to_time_major(x, self.num_frames)
        h = GroupNorm(dtype=self.dtype, name="norm")(y)
        q = nn.Conv(c, (1,), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1,), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1,), dtype=self.dtype, name="v")(h)
        out = attention(q[:, :, None, :], k[:, :, None, :],
                        v[:, :, None, :])[:, :, 0]
        out = nn.Conv(c, (1,), dtype=self.dtype, name="proj_out")(out)
        return _from_time_major(y + out, shape)
