"""AutoencoderKL — the frozen SD first stage.

TPU-native rebuild of sgm/models/autoencoder.py:126-374 and the Encoder/Decoder
in sgm/modules/diffusionmodules/model.py:479-1010: 4-ch latent, 128 base
channels, mult (1,2,4,4), 2 ResnetBlocks per level, attention only in the
middle block (attn_resolutions=[] in the production config,
configs/inference_nuscenes.yaml:96-113), scale_factor applied by the engine.

Channels-last NHWC; attention in the middle block via the shared fused
attention op. The VAE runs in fp32 by default — the reference disables fp16
autocast for the first stage (disable_first_stage_autocast: True, yaml:12).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.models.layers import GroupNorm
from panacea_tpu.ops.attention import attention, merge_heads, split_heads

Dtype = Any


class VAEResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out_channels or x.shape[-1]
        h = GroupNorm(eps=1e-6, dtype=self.dtype, with_silu=True, name="norm1")(x)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(eps=1e-6, dtype=self.dtype, with_silu=True, name="norm2")(h)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != c:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention (model.py:417-478)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hh = GroupNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hh).reshape(n, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hh).reshape(n, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hh).reshape(n, h * w, c)
        out = attention(split_heads(q, 1), split_heads(k, 1), split_heads(v, 1))
        out = merge_heads(out).reshape(n, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(self.ch * mult, dtype=self.dtype,
                                   name=f"down_{level}_block_{i}")(h)
                if curr_res in self.attn_resolutions:
                    h = VAEAttnBlock(dtype=self.dtype,
                                     name=f"down_{level}_attn_{i}")(h)
            if level != len(self.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv (model.py:727-739)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{level}_downsample")(h)
                curr_res //= 2
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm(eps=1e-6, dtype=self.dtype, with_silu=True, name="norm_out")(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            out_c = self.ch * self.ch_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(out_c, dtype=self.dtype,
                                   name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(h.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{level}_upsample")(h)
        h = GroupNorm(eps=1e-6, dtype=self.dtype, with_silu=True, name="norm_out")(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL autoencoder with quant convs (autoencoder.py:333-368)."""

    embed_dim: int = 4
    ddconfig: Optional[dict] = None
    lossconfig: Optional[dict] = None  # accepted for config compat; unused
    monitor: Optional[str] = None
    ckpt_path: Optional[str] = None
    ignore_keys: Tuple = ()
    dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig or {})
        dd.pop("dropout", None)
        self.encoder = Encoder(
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            z_channels=dd.get("z_channels", 4),
            double_z=dd.get("double_z", True),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            resolution=dd.get("resolution", 256),
            in_channels=dd.get("in_channels", 3),
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = Decoder(
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            z_channels=dd.get("z_channels", 4),
            out_ch=dd.get("out_ch", 3),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            resolution=dd.get("resolution", 256),
            dtype=self.dtype,
            name="decoder",
        )
        z = dd.get("z_channels", 4)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(z, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def moments(self, x):
        """Posterior moments (mean, logvar): (N, h, w, 2*embed_dim)."""
        return self.quant_conv(self.encoder(x))

    def encode(self, x, rng: Optional[jax.Array] = None, sample: bool = True):
        """Encode; samples the diagonal-Gaussian posterior when ``sample`` and a
        PRNG key is given (reference inference wrapper samples:
        autoencoder.py:371-374)."""
        m = self.moments(x)
        mean, logvar = jnp.split(m, 2, axis=-1)
        if sample and rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng: Optional[jax.Array] = None):
        z = self.encode(x, rng)
        return self.decode(z)


class AutoencoderKLInferenceWrapper(AutoencoderKL):
    """Alias for config parity (autoencoder.py:371-374)."""
