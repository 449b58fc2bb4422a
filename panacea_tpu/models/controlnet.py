"""ControlNet3D branch + combined controlled UNet.

TPU-native rebuild of sgm/modules/diffusionmodules/controlmodel.py:19-202:
a copy of the UNet encoder + middle with (a) an 8-conv hint stack downsampling
the 19-channel BEV-layout panorama 8x into the latent resolution with a
zero-init final conv (controlmodel.py:43-59), (b) a zero-init 1x1 conv per
input block (controlmodel.py:61-75), and (c) the middle-block zero conv.
Residuals are scaled by ``control_scales`` and added to the UNet middle output
and skip connections (controlmodel.py:191-195).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from panacea_tpu.diffusion.util import timestep_embedding
from panacea_tpu.models.layers import Downsample, TimeEmbed
from panacea_tpu.models.unet import UNetModel3D, _plan_blocks, make_resblock, make_transformer
from panacea_tpu.registry import instantiate_from_config

Dtype = Any


class HintEncoder(nn.Module):
    """8-conv hint stack: 19ch image-res -> /8 -> model_channels with
    zero-init final conv (controlmodel.py:43-59)."""

    model_channels: int = 320
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hint):
        hint = hint.astype(self.dtype)
        widths = [16, 16, 32, 32, 96, 96, 256]
        strides = [1, 1, 2, 1, 2, 1, 2]
        g = hint
        for i, (wdt, st) in enumerate(zip(widths, strides)):
            g = nn.Conv(wdt, (3, 3), strides=(st, st), padding=1,
                        dtype=self.dtype, name=f"hint_conv{i}")(g)
            g = nn.silu(g)
        return nn.Conv(self.model_channels, (3, 3), padding=1,
                       dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="hint_conv_out")(g)


class ControlNet3D(nn.Module):
    hint_channels: int = 19
    control_scales: float = 1.0
    num_classes: Any = None  # int | 'continuous' | 'sequential' | None
    adm_in_channels: Optional[int] = None
    in_channels: int = 8
    model_channels: int = 320
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
    # config-compat flags
    use_checkpoint: bool = True
    use_fp16: bool = False
    legacy: bool = False
    use_spatial_transformer: bool = True
    use_linear_in_transformer: bool = True
    alpha: int = 1
    disable_temporal: bool = False

    def setup(self):
        self.hint_stack = HintEncoder(
            model_channels=self.model_channels, dtype=self.dtype,
            name="hint_stack",
        )

    def _fold_hint_frames(self, hint):
        """Panacea+ multi-frame hint mode (controlmodel.py:108-117): when
        the configured ``hint_channels`` exceeds the per-frame layout
        channel count C of the incoming (B*T*m, H, W, C) hint, fold the m
        hint frames into channels, ``(t m) c -> t (m c)``. The reference
        applies the reshape per CFG half (hint[:8]/hint[8:]); with the
        batch laid out (half, b, t, m) one reshape is identical."""
        c = hint.shape[-1]
        if self.hint_channels <= c:
            return hint
        m = self.hint_channels // c
        assert m * c == self.hint_channels, (self.hint_channels, c)
        b = hint.shape[0] // m
        hint = hint.reshape(b, m, *hint.shape[1:])     # (b*t, m, H, W, c)
        hint = jnp.moveaxis(hint, 1, 3)                # (b*t, H, W, m, c)
        return hint.reshape(*hint.shape[:3], m * c)

    def encode_hint(self, hint):
        """Latent-res hint features; noise/timestep-independent — callers
        hoist this OUT of the sampler loop (the reference recomputes it every
        step, controlmodel.py:118)."""
        return self.hint_stack(self._fold_hint_frames(hint))

    @nn.compact
    def __call__(self, x, hint, timesteps, context, y=None,
                 guided_hint=None):
        """x: (B*T, h, w, in_channels) noisy latents (+concat cond);
        hint: (B*T, H, W, hint_channels) BEV-layout panorama at image
        resolution (or None when ``guided_hint`` latent-res features are
        precomputed); context: (B, L, context_dim). Returns list of scaled
        residuals (one per UNet input block + middle), channels-last.
        """
        input_plan, _, _ = _plan_blocks(
            self.model_channels, tuple(self.channel_mult), self.num_res_blocks,
            tuple(self.attention_resolutions),
        )

        t_emb = timestep_embedding(timesteps, self.model_channels).astype(self.dtype)
        emb = TimeEmbed(4 * self.model_channels, dtype=self.dtype,
                        name="time_embed")(t_emb)
        if self.num_classes is not None:
            assert y is not None, "class-conditional controlnet needs y"
            from panacea_tpu.models.unet import label_embedding

            emb = emb + label_embedding(self, y, x.shape[0])

        if guided_hint is None:
            guided_hint = self.hint_stack(self._fold_hint_frames(hint))
        guided_hint = guided_hint.astype(self.dtype)

        outs = []
        h = x.astype(self.dtype)
        for bi, item in enumerate(input_plan):
            kind = item[0]
            if kind == "conv":
                h = nn.Conv(self.model_channels, (3, 3), padding=1,
                            dtype=self.dtype, name=f"in_{bi}_conv")(h)
                h = h + guided_hint
            elif kind == "down":
                h = Downsample(out_channels=item[1], dtype=self.dtype,
                               name=f"in_{bi}_down")(h)
            else:
                (in_ch, out_ch), attn = item[1], item[2]
                h = make_resblock(self, in_ch, out_ch, f"in_{bi}_res")(h, emb)
                if attn:
                    h = make_transformer(self, out_ch, f"in_{bi}_attn")(h, context)
            outs.append(
                nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name=f"zero_conv_{bi}")(h)
            )

        mid_ch = self.model_channels * self.channel_mult[-1]
        h = make_resblock(self, mid_ch, mid_ch, "mid_res1")(h, emb)
        h = make_transformer(self, mid_ch, "mid_attn")(h, context)
        h = make_resblock(self, mid_ch, mid_ch, "mid_res2")(h, emb)
        outs.append(
            nn.Conv(mid_ch, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="middle_block_out")(h)
        )
        return [o * self.control_scales for o in outs]


class ControlledUNetModel3D(nn.Module):
    """UNet + ControlNet pair (controlmodel.py:146-202 + wrappers.py:37-70).

    The reference nests the controlnet inside the UNet and drives it from the
    wrapper; here the pairing is one module whose __call__ computes the control
    residuals then runs the UNet with them.
    """

    controlnet_config: Optional[dict] = None
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
    dtype: Dtype = jnp.float32
    use_checkpoint: bool = True
    use_fp16: bool = False
    legacy: bool = False
    use_spatial_transformer: bool = True
    use_linear_in_transformer: bool = True
    alpha: int = 1
    only_add_on_center_frame: bool = False
    num_classes: Any = None  # int | 'continuous' | 'sequential' | None
    view_mesh: Any = None  # Mesh with a 'view' axis (ring cross-view path)

    def setup(self):
        kw = dict(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult,
            num_head_channels=self.num_head_channels,
            transformer_depth=self.transformer_depth,
            context_dim=self.context_dim,
            num_frames=self.num_frames,
            spatial_only_attn_type=self.spatial_only_attn_type,
            insert_crossview=self.insert_crossview,
            dropout=self.dropout,
            num_classes=self.num_classes,
            view_mesh=self.view_mesh,
            dtype=self.dtype,
        )
        self.unet = UNetModel3D(**kw, name="unet")
        if self.controlnet_config is not None:
            params = dict(self.controlnet_config.get("params", {}) or {})
            params.pop("out_channels", None)
            params.setdefault("dtype", self.dtype)
            params["view_mesh"] = self.view_mesh
            # keep only fields ControlNet3D knows about
            valid = set(ControlNet3D.__dataclass_fields__) - {"parent", "name"}
            params = {k: v for k, v in params.items() if k in valid}
            self.controlnet = ControlNet3D(**params, name="controlnet")
        else:
            self.controlnet = None

    def __call__(self, x, timesteps, context, hint=None, y=None,
                 guided_hint=None):
        control = None
        if self.controlnet is not None and (hint is not None
                                            or guided_hint is not None):
            control = self.controlnet(x, hint, timesteps, context, y=y,
                                      guided_hint=guided_hint)
        return self.unet(x, timesteps, context, y=y, control=control)

    def encode_hint(self, hint):
        """Precompute latent-res hint features once per clip (hoisted out of
        the 25-step sampler loop)."""
        assert self.controlnet is not None
        return self.controlnet.encode_hint(hint)
