"""UNetModel3D — SD2.1-topology latent UNet with decomposed 4D attention.

TPU-native rebuild of sgm/modules/diffusionmodules/openaimodel.py:774-1319:
320 base channels, mult (1,2,4,4), 2 ResBlock3D per level, a
SpatialTemporalTransformer wherever the downsample rate is in
attention_resolutions, head dim 64, 1024-d text context
(configs/inference_nuscenes.yaml:30-49).

Differences from the reference by design:
  * channels-last (N, H, W, C) activations; N = B*T flattened frames
  * text context stays per-clip (B, L, D); frame broadcast happens inside
    attention via K/V sharing instead of materialized repeats
  * rematerialization is jax.checkpoint applied by the caller (policy-based)
    instead of the reference's custom autograd checkpoint
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from panacea_tpu.diffusion.util import timestep_embedding
from panacea_tpu.models.layers import (
    Downsample,
    GroupNorm,
    ResBlock3D,
    TimeEmbed,
    Upsample,
)
from panacea_tpu.models.transformer import SpatialTemporalTransformer

Dtype = Any


def _plan_blocks(
    model_channels: int,
    channel_mult: Sequence[int],
    num_res_blocks: int,
    attention_resolutions: Sequence[int],
):
    """Compute the static block plan (channel widths / attention placement) that
    the reference builds imperatively (openaimodel.py:975-1085)."""
    input_plan = [("conv", model_channels, None)]  # (kind, ch, extra)
    ch = model_channels
    input_chans = [model_channels]
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            out_ch = mult * model_channels
            attn = ds in attention_resolutions
            input_plan.append(("res", (ch, out_ch), attn))
            ch = out_ch
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            input_plan.append(("down", ch, None))
            input_chans.append(ch)
            ds *= 2

    output_plan = []
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            ich = input_chans.pop()
            out_ch = model_channels * mult
            attn = ds in attention_resolutions
            up = level > 0 and i == num_res_blocks
            output_plan.append(("res", (ch + ich, out_ch), attn, up))
            ch = out_ch
            if up:
                ds //= 2
    return input_plan, output_plan, ch


def make_resblock(m, in_ch: int, out_ch: int, name: str, up=False, down=False):
    """Build a ResBlock3D from any module carrying the shared UNet config fields.
    Constructed inside the caller's compact scope so parentage is correct.
    ``use_checkpoint`` maps to jax.remat per block — recompute-in-backward in
    place of the reference's custom autograd checkpoint
    (diffusionmodules/util.py:153-222)."""
    cls = nn.remat(ResBlock3D) if m.use_checkpoint else ResBlock3D
    return cls(
        channels=in_ch,
        emb_channels=4 * m.model_channels,
        out_channels=out_ch,
        num_frames=m.num_frames,
        dropout=m.dropout,
        up=up,
        down=down,
        dtype=m.dtype,
        name=name,
    )


def label_embedding(m, y, batch: int):
    """Class-conditional embedding added onto the timestep embedding
    (openaimodel.py:945-968 label_emb variants, :1296-1300; the ControlNet
    repeats a per-clip ``y`` over num_frames before the add,
    controlmodel.py:104-107). Supports ``num_classes`` = int (Embedding),
    'continuous' (Linear on a scalar) and 'sequential' (MLP on
    adm_in_channels). Must be called inside a compact scope."""
    width = 4 * m.model_channels
    if y.shape[0] != batch:  # per-clip -> per-frame
        y = jnp.repeat(y, batch // y.shape[0], axis=0)
    if isinstance(m.num_classes, int):
        lemb = nn.Embed(m.num_classes, width, dtype=m.dtype,
                        name="label_emb")(y.astype(jnp.int32))
    elif m.num_classes == "continuous":
        lemb = nn.Dense(width, dtype=m.dtype, name="label_emb")(
            y.reshape(-1, 1).astype(m.dtype))
    elif m.num_classes == "sequential":
        h = nn.Dense(width, dtype=m.dtype, name="label_emb_0")(
            y.astype(m.dtype))
        lemb = nn.Dense(width, dtype=m.dtype, name="label_emb_2")(nn.silu(h))
    else:
        raise ValueError(f"unsupported num_classes {m.num_classes!r}")
    return lemb


def make_transformer(m, ch: int, name: str):
    heads = ch // m.num_head_channels
    if not m.use_spatial_transformer:
        # legacy QKV attention path (openaimodel.py:1013-1035 builds
        # AttentionBlock3D when use_spatial_transformer=False)
        from panacea_tpu.models.legacy_attention import LegacyAttentionBlock3D

        lcls = (nn.remat(LegacyAttentionBlock3D) if m.use_checkpoint
                else LegacyAttentionBlock3D)
        block = lcls(channels=ch, num_heads=heads,
                     num_head_channels=m.num_head_channels,
                     num_frames=m.num_frames, dtype=m.dtype, name=name)
        # context-free: accept and ignore the text context argument
        return lambda x, context=None, _b=block: _b(x)
    cls = (
        nn.remat(SpatialTemporalTransformer)
        if m.use_checkpoint
        else SpatialTemporalTransformer
    )
    return cls(
        channels=ch,
        num_heads=heads,
        head_dim=m.num_head_channels,
        context_dim=m.context_dim,
        depth=m.transformer_depth,
        num_frames=m.num_frames,
        spatial_attn_mode=m.spatial_only_attn_type,
        insert_crossview=m.insert_crossview,
        view_mesh=getattr(m, "view_mesh", None),
        dtype=m.dtype,
        name=name,
    )


class UNetModel3D(nn.Module):
    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    num_frames: int = 8
    spatial_only_attn_type: str = "intra-view"
    insert_crossview: bool = True
    dropout: float = 0.0
    view_mesh: Any = None  # Mesh with a 'view' axis (ring cross-view path)
    dtype: Dtype = jnp.float32
    # accepted-for-config-compat, unused flags from the reference yaml
    use_checkpoint: bool = True
    use_fp16: bool = False
    legacy: bool = False
    use_spatial_transformer: bool = True
    use_linear_in_transformer: bool = True
    adm_in_channels: Optional[int] = None
    num_classes: Optional[int] = None
    alpha: int = 1

    @nn.compact
    def __call__(self, x, timesteps, context, y=None, control=None):
        """x: (B*T, H, W, in_channels); timesteps: (B*T,);
        context: (B, L, context_dim) per clip; control: optional list of
        ControlNet residuals (len = num input blocks + 1), consumed middle-first.
        Returns (B*T, H, W, out_channels).
        """
        input_plan, output_plan, final_ch = _plan_blocks(
            self.model_channels, tuple(self.channel_mult), self.num_res_blocks,
            tuple(self.attention_resolutions),
        )

        t_emb = timestep_embedding(timesteps, self.model_channels).astype(self.dtype)
        emb = TimeEmbed(4 * self.model_channels, dtype=self.dtype,
                        name="time_embed")(t_emb)
        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs y"
            emb = emb + label_embedding(self, y, x.shape[0])

        hs = []
        h = x.astype(self.dtype)
        for bi, item in enumerate(input_plan):
            kind = item[0]
            if kind == "conv":
                h = nn.Conv(self.model_channels, (3, 3), padding=1,
                            dtype=self.dtype, name=f"in_{bi}_conv")(h)
            elif kind == "down":
                h = Downsample(out_channels=item[1], dtype=self.dtype,
                               name=f"in_{bi}_down")(h)
            else:
                (in_ch, out_ch), attn = item[1], item[2]
                h = make_resblock(self, in_ch, out_ch, f"in_{bi}_res")(h, emb)
                if attn:
                    h = make_transformer(self, out_ch, f"in_{bi}_attn")(h, context)
            hs.append(h)

        mid_ch = self.model_channels * self.channel_mult[-1]
        h = make_resblock(self, mid_ch, mid_ch, "mid_res1")(h, emb)
        h = make_transformer(self, mid_ch, "mid_attn")(h, context)
        h = make_resblock(self, mid_ch, mid_ch, "mid_res2")(h, emb)

        if control is not None:
            control = list(control)
            h = h + control.pop()

        for bi, item in enumerate(output_plan):
            _, (in_ch, out_ch), attn, up = item
            skip = hs.pop()
            if control is not None:
                skip = skip + control.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = make_resblock(self, in_ch, out_ch, f"out_{bi}_res")(h, emb)
            if attn:
                h = make_transformer(self, out_ch, f"out_{bi}_attn")(h, context)
            if up:
                h = Upsample(out_channels=out_ch, dtype=self.dtype,
                             name=f"out_{bi}_up")(h)

        h = GroupNorm(dtype=self.dtype, with_silu=True, name="out_norm")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        return h
