"""VoVNetV2 backbone (flax) — alternate detector backbone.

Equivalent of metrics/.../models/backbones/vovnet.py / vovnetcp.py (VoVNetCP =
checkpointed variant; here jax.remat via use_checkpoint): OSA modules
(one-shot aggregation — a chain of 3x3 convs whose outputs concat with the
input, compressed by a 1x1), eSE channel attention, identity residuals.
V2-99 configuration by default.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.resnet import FrozenBatchNorm

Dtype = Any

# V2-99: stage conv ch, concat ch, blocks per stage, convs per block
V99_STAGE_CH = (128, 160, 192, 224)
V99_CONCAT_CH = (256, 512, 768, 1024)
V99_BLOCKS = (1, 3, 9, 3)
V99_LAYERS = 5


class ConvBnRelu(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ESE(nn.Module):
    """Effective squeeze-excite: global-avg -> 1x1 conv -> hsigmoid gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc")(g)
        gate = jnp.clip(g + 3.0, 0.0, 6.0) / 6.0
        return x * gate


class OSABlock(nn.Module):
    stage_ch: int
    concat_ch: int
    num_layers: int = 5
    identity: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        outs = [x]
        h = x
        for i in range(self.num_layers):
            h = ConvBnRelu(self.stage_ch, dtype=self.dtype, name=f"conv{i}")(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        h = ConvBnRelu(self.concat_ch, kernel=1, dtype=self.dtype,
                       name="concat_conv")(h)
        h = ESE(dtype=self.dtype, name="ese")(h)
        if self.identity:
            h = h + identity
        return h


class VoVNet(nn.Module):
    """Returns the four stage outputs (strides 4/8/16/32)."""

    stage_ch: Sequence[int] = V99_STAGE_CH
    concat_ch: Sequence[int] = V99_CONCAT_CH
    num_blocks: Sequence[int] = V99_BLOCKS
    num_layers: int = V99_LAYERS
    use_checkpoint: bool = False  # VoVNetCP semantics
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = ConvBnRelu(64, stride=2, dtype=self.dtype, name="stem1")(x)
        x = ConvBnRelu(64, dtype=self.dtype, name="stem2")(x)
        x = ConvBnRelu(128, stride=2, dtype=self.dtype, name="stem3")(x)
        outs = []
        blk_cls = nn.remat(OSABlock) if self.use_checkpoint else OSABlock
        for si in range(4):
            if si > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
            for bi in range(self.num_blocks[si]):
                x = blk_cls(
                    self.stage_ch[si], self.concat_ch[si],
                    num_layers=self.num_layers,
                    identity=(bi > 0),
                    dtype=self.dtype,
                    name=f"stage{si + 2}_block{bi}",
                )(x)
            outs.append(x)
        return tuple(outs)


VoVNetCP = VoVNet  # checkpointed variant selected via use_checkpoint=True
