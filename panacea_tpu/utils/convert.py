"""Reference (torch) checkpoint -> panacea-tpu parameter trees.

Maps the reference sgm state-dict naming (the layout of
``panaceaplus_40k_deepspeed.ckpt``, see inference.py:207-228 for the loading
semantics incl. the DeepSpeed ``_forward_module.`` prefix strip) onto this
framework's flax param trees, with layout transforms:

  torch Conv2d (O,I,kh,kw) -> flax (kh,kw,I,O)
  torch Conv1d (O,I,k)     -> flax (k,I,O)
  torch Linear (O,I)       -> flax (I,O)
  GroupNorm/LayerNorm weight/bias -> scale/bias
  CLIP packed in_proj qkv  -> split q/k/v

Follows the reference's ``strict=False`` semantics: unmatched checkpoint keys
and uninitialized framework params are reported, never silently dropped.
"""

from __future__ import annotations

import warnings

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

Transform = Callable[[np.ndarray], np.ndarray]


def _t_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv1d(w):
    return np.transpose(w, (2, 1, 0))


def _t_linear(w):
    return np.transpose(w)


def _t_none(w):
    return w


# --------------------------------------------------------------------------
# mapping builders: return {reference_key: (flax_path_tuple, transform)}
# --------------------------------------------------------------------------

def _gn(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """GroupNorm wrapper: weight/bias -> <path>/GroupNorm_0/{scale,bias}."""
    return {
        f"{ref}.weight": (path + ("GroupNorm_0", "scale"), _t_none),
        f"{ref}.bias": (path + ("GroupNorm_0", "bias"), _t_none),
    }


def _gn_flat(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """TemporalGroupNorm: weight/bias -> <path>/{scale,bias} (flat, no
    GroupNorm_0 nesting — the module computes its own per-pixel statistics)."""
    return {
        f"{ref}.weight": (path + ("scale",), _t_none),
        f"{ref}.bias": (path + ("bias",), _t_none),
    }


def _ln(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    return {
        f"{ref}.weight": (path + ("scale",), _t_none),
        f"{ref}.bias": (path + ("bias",), _t_none),
    }


def _conv(ref: str, path: Tuple[str, ...], t: Transform = _t_conv2d) -> Dict[str, Tuple]:
    return {
        f"{ref}.weight": (path + ("kernel",), t),
        f"{ref}.bias": (path + ("bias",), _t_none),
    }


def _linear(ref: str, path: Tuple[str, ...], bias: bool = True) -> Dict[str, Tuple]:
    out = {f"{ref}.weight": (path + ("kernel",), _t_linear)}
    if bias:
        out[f"{ref}.bias"] = (path + ("bias",), _t_none)
    return out


def _attention(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """CrossAttention: to_q/k/v (no bias) + to_out.0 (attention.py:203-226)."""
    m = {}
    m.update(_linear(f"{ref}.to_q", path + ("to_q",), bias=False))
    m.update(_linear(f"{ref}.to_k", path + ("to_k",), bias=False))
    m.update(_linear(f"{ref}.to_v", path + ("to_v",), bias=False))
    m.update(_linear(f"{ref}.to_out.0", path + ("to_out",)))
    return m


def _basic_block(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """BasicTransformerBlock (attention.py:613-747)."""
    m = {}
    m.update(_attention(f"{ref}.attn1", path + ("attn1",)))
    m.update(_attention(f"{ref}.attn2", path + ("attn2",)))
    m.update(_ln(f"{ref}.norm1", path + ("norm1",)))
    m.update(_ln(f"{ref}.norm2", path + ("norm2",)))
    m.update(_ln(f"{ref}.norm3", path + ("norm3",)))
    m.update(_linear(f"{ref}.ff.net.0.proj", path + ("ff", "proj")))
    m.update(_linear(f"{ref}.ff.net.2", path + ("ff", "out")))
    return m


def _st_transformer(ref: str, path: Tuple[str, ...], depth: int = 1,
                    insert_crossview: bool = True) -> Dict[str, Tuple]:
    """SpatialTemporalTransformer, use_linear=True (attention.py:898-1062)."""
    m = {}
    m.update(_gn(f"{ref}.norm", path + ("norm",)))
    m.update(_linear(f"{ref}.proj_in", path + ("proj_in",)))
    m.update(_linear(f"{ref}.proj_out", path + ("proj_out",)))
    for d in range(depth):
        m.update(_basic_block(f"{ref}.transformer_blocks.{d}",
                              path + (f"blocks_{d}",)))
        m.update(_basic_block(f"{ref}.transformer_blocks_temporal.{d}",
                              path + (f"blocks_temporal_{d}",)))
        if insert_crossview:
            m.update(_basic_block(f"{ref}.transformer_blocks_crossview.{d}",
                                  path + (f"blocks_crossview_{d}",)))
    m.update(_gn(f"{ref}.norm_temporal", path + ("norm_temporal",)))
    m.update(_linear(f"{ref}.proj_in_temporal", path + ("proj_in_temporal",)))
    m.update(_linear(f"{ref}.proj_out_temporal", path + ("proj_out_temporal",)))
    if insert_crossview:
        m.update(_gn(f"{ref}.norm_crossview", path + ("norm_crossview",)))
        m.update(_linear(f"{ref}.proj_in_crossview",
                         path + ("proj_in_crossview",)))
        m.update(_linear(f"{ref}.proj_out_crossview",
                         path + ("proj_out_crossview",)))
    return m


def _temporal_conv(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """TemporalConv stores its Conv1d params flat as conv_kernel/conv_bias
    (shift+matmul formulation, layers.py TemporalConv)."""
    return {
        f"{ref}.weight": (path + ("conv_kernel",), _t_conv1d),
        f"{ref}.bias": (path + ("conv_bias",), _t_none),
    }


def _resblock3d(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """ResBlock3D (openaimodel.py:356-542)."""
    m = {}
    m.update(_gn(f"{ref}.in_layers.0", path + ("in_norm",)))
    m.update(_conv(f"{ref}.in_layers.2", path + ("in_conv",)))
    m.update(_gn_flat(f"{ref}.in_layers_temporal.0", path + ("in_norm_temporal",)))
    m.update(_temporal_conv(f"{ref}.in_layers_temporal.2",
                            path + ("in_conv_temporal",)))
    m.update(_linear(f"{ref}.emb_layers.1", path + ("emb_proj",)))
    m.update(_gn(f"{ref}.out_layers.0", path + ("out_norm",)))
    m.update(_conv(f"{ref}.out_layers.3", path + ("out_conv",)))
    m.update(_gn_flat(f"{ref}.out_layers_temporal.0", path + ("out_norm_temporal",)))
    m.update(_temporal_conv(f"{ref}.out_layers_temporal.3",
                            path + ("out_conv_temporal",)))
    m.update(_conv(f"{ref}.skip_connection", path + ("skip_conv",)))
    return m


def build_unet_mapping(
    prefix: str,
    path_prefix: Tuple[str, ...],
    model_channels: int = 320,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions=(4, 2, 1),
    transformer_depth: int = 1,
    insert_crossview: bool = True,
    encoder_only: bool = False,
    num_classes=None,
) -> Dict[str, Tuple]:
    """Mapping for UNetModel3D / ControlNet3D torso. ``prefix`` like
    'model.diffusion_model' -> paths under ``path_prefix``.
    ``num_classes`` adds the label_emb variant mapping
    (openaimodel.py:945-968: int = nn.Embedding, 'continuous' = Linear,
    'sequential' = nested Sequential MLP)."""
    from panacea_tpu.models.unet import _plan_blocks

    input_plan, output_plan, _ = _plan_blocks(
        model_channels, tuple(channel_mult), num_res_blocks,
        tuple(attention_resolutions),
    )
    m: Dict[str, Tuple] = {}
    m.update(_linear(f"{prefix}.time_embed.0", path_prefix + ("time_embed", "dense0")))
    m.update(_linear(f"{prefix}.time_embed.2", path_prefix + ("time_embed", "dense1")))
    if num_classes is not None:
        if isinstance(num_classes, int):
            m[f"{prefix}.label_emb.weight"] = (
                path_prefix + ("label_emb", "embedding"), _t_none)
        elif num_classes == "continuous":
            m.update(_linear(f"{prefix}.label_emb",
                             path_prefix + ("label_emb",)))
        elif num_classes == "sequential":
            m.update(_linear(f"{prefix}.label_emb.0.0",
                             path_prefix + ("label_emb_0",)))
            m.update(_linear(f"{prefix}.label_emb.0.2",
                             path_prefix + ("label_emb_2",)))

    for bi, item in enumerate(input_plan):
        kind = item[0]
        ref = f"{prefix}.input_blocks.{bi}"
        if kind == "conv":
            m.update(_conv(f"{ref}.0", path_prefix + (f"in_{bi}_conv",)))
        elif kind == "down":
            m.update(_conv(f"{ref}.0.op", path_prefix + (f"in_{bi}_down", "conv")))
        else:
            m.update(_resblock3d(f"{ref}.0", path_prefix + (f"in_{bi}_res",)))
            if item[2]:
                m.update(_st_transformer(
                    f"{ref}.1", path_prefix + (f"in_{bi}_attn",),
                    transformer_depth, insert_crossview,
                ))

    m.update(_resblock3d(f"{prefix}.middle_block.0", path_prefix + ("mid_res1",)))
    m.update(_st_transformer(f"{prefix}.middle_block.1",
                             path_prefix + ("mid_attn",),
                             transformer_depth, insert_crossview))
    m.update(_resblock3d(f"{prefix}.middle_block.2", path_prefix + ("mid_res2",)))

    if encoder_only:
        return m

    for bi, item in enumerate(output_plan):
        _, _, attn, up = item
        ref = f"{prefix}.output_blocks.{bi}"
        m.update(_resblock3d(f"{ref}.0", path_prefix + (f"out_{bi}_res",)))
        sub = 1
        if attn:
            m.update(_st_transformer(
                f"{ref}.{sub}", path_prefix + (f"out_{bi}_attn",),
                transformer_depth, insert_crossview,
            ))
            sub += 1
        if up:
            m.update(_conv(f"{ref}.{sub}.conv",
                           path_prefix + (f"out_{bi}_up", "conv")))

    m.update(_gn(f"{prefix}.out.0", path_prefix + ("out_norm",)))
    m.update(_conv(f"{prefix}.out.2", path_prefix + ("out_conv",)))
    return m


def build_controlnet_mapping(prefix: str, path_prefix: Tuple[str, ...],
                             **unet_kwargs) -> Dict[str, Tuple]:
    """(controlmodel.py:19-142): UNet torso (encoder only) + hint stack +
    zero convs."""
    m = build_unet_mapping(prefix, path_prefix, encoder_only=True, **unet_kwargs)
    widths_idx = [0, 2, 4, 6, 8, 10, 12]
    for i, ri in enumerate(widths_idx):
        m.update(_conv(f"{prefix}.input_hint_block.{ri}",
                       path_prefix + ("hint_stack", f"hint_conv{i}")))
    m.update(_conv(f"{prefix}.input_hint_block.14",
                   path_prefix + ("hint_stack", "hint_conv_out")))
    # count zero convs from the input plan
    from panacea_tpu.models.unet import _plan_blocks

    input_plan, _, _ = _plan_blocks(
        unet_kwargs.get("model_channels", 320),
        tuple(unet_kwargs.get("channel_mult", (1, 2, 4, 4))),
        unet_kwargs.get("num_res_blocks", 2),
        tuple(unet_kwargs.get("attention_resolutions", (4, 2, 1))),
    )
    for i in range(len(input_plan)):
        m.update(_conv(f"{prefix}.zero_convs.{i}.0",
                       path_prefix + (f"zero_conv_{i}",)))
    m.update(_conv(f"{prefix}.middle_block_out.0",
                   path_prefix + ("middle_block_out",)))
    return m


def _vae_resblock(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    m = {}
    m.update(_gn(f"{ref}.norm1", path + ("norm1",)))
    m.update(_conv(f"{ref}.conv1", path + ("conv1",)))
    m.update(_gn(f"{ref}.norm2", path + ("norm2",)))
    m.update(_conv(f"{ref}.conv2", path + ("conv2",)))
    m.update(_conv(f"{ref}.nin_shortcut", path + ("nin_shortcut",)))
    return m


def _vae_attn(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    m = {}
    m.update(_gn(f"{ref}.norm", path + ("norm",)))
    for n in ("q", "k", "v", "proj_out"):
        m.update(_conv(f"{ref}.{n}", path + (n,)))
    return m


def build_vae_mapping(
    prefix: str = "first_stage_model",
    path_prefix: Tuple[str, ...] = (),
    ch_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
) -> Dict[str, Tuple]:
    """(sgm/modules/diffusionmodules/model.py:479-1010)."""
    m: Dict[str, Tuple] = {}
    enc = path_prefix + ("encoder",)
    dec = path_prefix + ("decoder",)
    m.update(_conv(f"{prefix}.encoder.conv_in", enc + ("conv_in",)))
    for l in range(len(ch_mult)):
        for i in range(num_res_blocks):
            m.update(_vae_resblock(f"{prefix}.encoder.down.{l}.block.{i}",
                                   enc + (f"down_{l}_block_{i}",)))
        if l != len(ch_mult) - 1:
            m.update(_conv(f"{prefix}.encoder.down.{l}.downsample.conv",
                           enc + (f"down_{l}_downsample",)))
    m.update(_vae_resblock(f"{prefix}.encoder.mid.block_1", enc + ("mid_block_1",)))
    m.update(_vae_attn(f"{prefix}.encoder.mid.attn_1", enc + ("mid_attn_1",)))
    m.update(_vae_resblock(f"{prefix}.encoder.mid.block_2", enc + ("mid_block_2",)))
    m.update(_gn(f"{prefix}.encoder.norm_out", enc + ("norm_out",)))
    m.update(_conv(f"{prefix}.encoder.conv_out", enc + ("conv_out",)))

    m.update(_conv(f"{prefix}.decoder.conv_in", dec + ("conv_in",)))
    m.update(_vae_resblock(f"{prefix}.decoder.mid.block_1", dec + ("mid_block_1",)))
    m.update(_vae_attn(f"{prefix}.decoder.mid.attn_1", dec + ("mid_attn_1",)))
    m.update(_vae_resblock(f"{prefix}.decoder.mid.block_2", dec + ("mid_block_2",)))
    for l in range(len(ch_mult)):
        for i in range(num_res_blocks + 1):
            m.update(_vae_resblock(f"{prefix}.decoder.up.{l}.block.{i}",
                                   dec + (f"up_{l}_block_{i}",)))
        if l != 0:
            m.update(_conv(f"{prefix}.decoder.up.{l}.upsample.conv",
                           dec + (f"up_{l}_upsample",)))
    m.update(_gn(f"{prefix}.decoder.norm_out", dec + ("norm_out",)))
    m.update(_conv(f"{prefix}.decoder.conv_out", dec + ("conv_out",)))
    m.update(_conv(f"{prefix}.quant_conv", path_prefix + ("quant_conv",)))
    m.update(_conv(f"{prefix}.post_quant_conv", path_prefix + ("post_quant_conv",)))
    return m


def build_clip_mapping(
    prefix: str = "conditioner.embedders.0.model",
    path_prefix: Tuple[str, ...] = (),
    layers: int = 24,
) -> Dict[str, Tuple]:
    """open_clip text tower (modules.py:559-632). The packed attn.in_proj is
    handled separately in convert_state_dict."""
    m: Dict[str, Tuple] = {
        f"{prefix}.token_embedding.weight": (
            path_prefix + ("token_embedding", "embedding"), _t_none),
        f"{prefix}.positional_embedding": (
            path_prefix + ("positional_embedding",), _t_none),
    }
    m.update(_ln(f"{prefix}.ln_final", path_prefix + ("ln_final",)))
    for i in range(layers):
        ref = f"{prefix}.transformer.resblocks.{i}"
        p = path_prefix + (f"resblock_{i}",)
        m.update(_ln(f"{ref}.ln_1", p + ("ln_1",)))
        m.update(_ln(f"{ref}.ln_2", p + ("ln_2",)))
        m.update(_linear(f"{ref}.attn.out_proj", p + ("attn", "out_proj")))
        m.update(_linear(f"{ref}.mlp.c_fc", p + ("mlp_fc",)))
        m.update(_linear(f"{ref}.mlp.c_proj", p + ("mlp_proj",)))
    return m


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    mapping: Dict[str, Tuple],
    clip_prefix: Optional[str] = None,
    clip_path: Tuple[str, ...] = (),
    clip_layers: int = 24,
) -> Tuple[Dict, List[str], List[str]]:
    """Apply a mapping; returns (nested_params, missing_refs, unexpected_refs).

    ``missing``: mapping entries with no checkpoint key (strict=False
    reporting, inference.py:219-226). ``unexpected``: checkpoint keys nothing
    consumed."""
    import flax

    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    used = set()
    missing = []
    for ref_key, (path, transform) in mapping.items():
        if ref_key in sd:
            flat[path] = transform(np.asarray(sd[ref_key]))
            used.add(ref_key)
        else:
            missing.append(ref_key)
    # CLIP packed qkv
    if clip_prefix is not None:
        for i in range(clip_layers):
            wk = f"{clip_prefix}.transformer.resblocks.{i}.attn.in_proj_weight"
            bk = f"{clip_prefix}.transformer.resblocks.{i}.attn.in_proj_bias"
            if wk in sd:
                w = np.asarray(sd[wk])
                b = np.asarray(sd[bk]) if bk in sd else None
                c = w.shape[0] // 3
                for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    p = clip_path + (f"resblock_{i}", "attn", name)
                    flat[p + ("kernel",)] = w[j * c:(j + 1) * c].T
                    if b is not None:
                        flat[p + ("bias",)] = b[j * c:(j + 1) * c]
                used.add(wk)
                used.add(bk)
    unexpected = [k for k in sd if k not in used]
    return flax.traverse_util.unflatten_dict(flat), missing, unexpected


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load .ckpt (Lightning/DeepSpeed) or .safetensors to numpy
    (inference.py:207-218)."""
    if path.endswith("safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("_forward_module.", ""): v for k, v in sd.items()}
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def apply_ema_weights(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray], int]:
    """Substitute ``model.*`` weights with their EMA shadows.

    The reference LitEma registers one buffer per trainable param, named by
    stripping '.' from the param name (ema.py:5-26), under the ``model_ema.``
    prefix (diffusion.py instantiates ``self.model_ema = LitEma(self.model)``).
    So ``model.X`` has shadow ``model_ema.<X without dots>``. Returns the
    substituted dict and the number of swapped tensors."""
    out = dict(sd)
    n = 0
    for key in sd:
        if not key.startswith("model."):
            continue
        shadow = "model_ema." + key[len("model."):].replace(".", "")
        if shadow in sd and sd[shadow].shape == sd[key].shape:
            out[key] = sd[shadow]
            n += 1
    return out, n


def has_ema_weights(sd: Dict[str, np.ndarray]) -> bool:
    return any(k.startswith("model_ema.")
               and k not in ("model_ema.decay", "model_ema.num_updates")
               for k in sd)


def build_panacea_mapping(engine):
    """The full panaceaplus mapping (UNet + ControlNet + VAE + CLIP) for
    ``engine``'s configuration. Returns (mapping, clip_prefix, clip_layers).
    Shared by convert_panacea_checkpoint and the --dry_convert coverage
    proof (check_conversion_coverage)."""
    model = engine.model
    unet_kwargs = dict(
        model_channels=model.model_channels,
        channel_mult=tuple(model.channel_mult),
        num_res_blocks=model.num_res_blocks,
        attention_resolutions=tuple(model.attention_resolutions),
        transformer_depth=model.transformer_depth,
        insert_crossview=model.insert_crossview,
    )
    mapping: Dict[str, Tuple] = {}
    mapping.update(build_unet_mapping(
        "model.diffusion_model", ("model", "unet"), **unet_kwargs))
    mapping.update(build_controlnet_mapping(
        "model.diffusion_model.controlnet", ("model", "controlnet"),
        **unet_kwargs))
    fs = engine.first_stage_model
    dd = fs.ddconfig or {}
    mapping.update(build_vae_mapping(
        "first_stage_model", ("first_stage",),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
    ))
    clip_emb = None
    clip_idx = None
    for i, emb in enumerate(engine.conditioner.embedders):
        if hasattr(emb, "model") and hasattr(emb, "tokenizer"):
            clip_emb, clip_idx = emb, i
            break
    clip_prefix = None
    clip_layers = 0
    if clip_emb is not None:
        clip_prefix = f"conditioner.embedders.{clip_idx}.model"
        clip_layers = clip_emb.model.layers
        mapping.update(build_clip_mapping(
            clip_prefix, ("clip",), layers=clip_layers))
    return mapping, clip_prefix, clip_layers


def check_conversion_coverage(key_shapes: Dict[str, Any], engine,
                              flax_shapes: Optional[Dict] = None
                              ) -> Dict[str, Any]:
    """Whole-checkpoint NAME-COVERAGE proof without weights.

    ``key_shapes``: {checkpoint key: shape list} (the published key list,
    e.g. tests/fixtures/panaceaplus_keys.json from
    scripts/dump_reference_keys.py). Every key must be (a) consumed by the
    mapping, (b) consumed by the packed-qkv CLIP handling, or (c) a known
    non-weight (model_ema.* shadows, loss_fn.*, buffers like attn_mask /
    logit_scale). When ``flax_shapes`` (flattened {path tuple: shape}) is
    given, each mapped tensor's transformed shape is additionally checked
    against the target flax param. Returns a report with ``unmapped`` and
    ``missing`` lists — both must be empty for full coverage."""
    mapping, clip_prefix, clip_layers = build_panacea_mapping(engine)
    ignorable = ("model_ema.", "loss_fn.")
    # attn_mask: causal-mask buffer; logit_scale / text_projection: only
    # used by pooled CLIP-score paths — FrozenOpenCLIPEmbedder returns token
    # hidden states (encode_with_transformer, encoders/modules.py:596-607),
    # never projecting, so these carry no information for generation
    buffer_suffixes = (".attn_mask", ".logit_scale", ".text_projection")

    packed = set()
    if clip_prefix:
        for i in range(clip_layers):
            packed.add(
                f"{clip_prefix}.transformer.resblocks.{i}.attn.in_proj_weight")
            packed.add(
                f"{clip_prefix}.transformer.resblocks.{i}.attn.in_proj_bias")

    unmapped, shape_mismatch, checked = [], [], 0
    for key, shape in key_shapes.items():
        if key in mapping:
            if flax_shapes is not None:
                path, transform = mapping[key]
                got = tuple(transform(np.zeros(shape, np.float32)).shape)
                want = flax_shapes.get(tuple(path))
                if want is None or tuple(want) != got:
                    shape_mismatch.append((key, got, want))
                checked += 1
        elif key in packed:
            checked += 1
        elif key.startswith(ignorable) or key.endswith(buffer_suffixes):
            pass
        else:
            unmapped.append(key)
    missing = [k for k in mapping if k not in key_shapes
               and "skip_connection" not in k and "nin_shortcut" not in k]
    return {
        "total_keys": len(key_shapes),
        "checked": checked,
        "unmapped": unmapped,
        "missing": missing,
        "shape_mismatch": shape_mismatch,
    }


def convert_panacea_checkpoint(path_or_sd, engine,
                               prefer_ema: bool = False) -> Dict[str, Any]:
    """Full conversion of a reference Panacea checkpoint into the engine's
    param trees ({'model': {'unet','controlnet'}, 'first_stage': ...}) plus the
    CLIP embedder params. Merges into engine.params in place and returns a
    report dict.

    ``prefer_ema=True`` loads the EMA shadow weights (model_ema.* buffers,
    ema.py:5-86) in place of the raw ``model.*`` weights — SURVEY §7 names
    EMA-vs-raw selection as a conversion hazard; the report records which
    set was loaded and how many tensors were swapped."""
    import flax
    import jax.numpy as jnp

    sd = (load_torch_checkpoint(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)
    ema_available = has_ema_weights(sd)
    ema_swapped = 0
    if prefer_ema:
        if not ema_available:
            raise ValueError(
                "prefer_ema=True but the checkpoint has no model_ema.* shadows")
        sd, ema_swapped = apply_ema_weights(sd)

    mapping, clip_prefix, clip_layers = build_panacea_mapping(engine)
    clip_emb = None
    for emb in engine.conditioner.embedders:
        if hasattr(emb, "model") and hasattr(emb, "tokenizer"):
            clip_emb = emb
            break

    params, missing, unexpected = convert_state_dict(
        sd, mapping, clip_prefix=clip_prefix, clip_path=("clip",),
        clip_layers=clip_layers,
    )

    # merge into existing trees (keeps zero-inits for params truly absent)
    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst.setdefault(k, {}), v)
            else:
                dst[k] = jnp.asarray(v)

    clip_params = params.pop("clip", None)
    if engine.params:
        merge(engine.params, params)
    else:
        engine.params = params
    if clip_params is not None and clip_emb is not None:
        if clip_emb.params is None:
            clip_emb.params = clip_params
        else:
            merge(clip_emb.params, clip_params)
    # the pooled-output variant additionally needs the learned
    # text_projection, which the standard token-state embedder never uses
    # (and the coverage checker skips as a buffer)
    for emb in engine.conditioner.embedders:
        if hasattr(emb, "load_text_projection") and getattr(
                emb, "return_pooled", False):
            if not emb.load_text_projection(sd, prefix=clip_prefix or ""):
                warnings.warn(
                    "always_return_pooled embedder found no "
                    f"'{clip_prefix}*text_projection' in the checkpoint; "
                    "the pooled path will raise at call time")

    report = {
        "missing": missing,
        "unexpected": [k for k in unexpected
                       if not k.startswith(("model_ema.", "loss_fn."))],
        "n_loaded": len(mapping) - len(missing),
        "ema_available": ema_available,
        "weights_loaded": "ema" if prefer_ema else "raw",
        "ema_swapped": ema_swapped,
    }
    print(f"Restored with {len(report['missing'])} missing and "
          f"{len(report['unexpected'])} unexpected keys "
          f"(weights: {report['weights_loaded']}"
          + (f", {ema_swapped} EMA shadows applied" if prefer_ema else
             (", EMA shadows present but NOT loaded" if ema_available else ""))
          + ")")
    return report


def _t_conv2d_inv(w):
    return np.transpose(w, (3, 2, 0, 1))


# every transform used by build_panacea_mapping is one of these four
_INVERSE_TRANSFORMS = {
    _t_none: _t_none,
    _t_linear: _t_linear,       # self-inverse
    _t_conv1d: _t_conv1d,       # (2,1,0) is self-inverse
    _t_conv2d: _t_conv2d_inv,
}


def export_panacea_checkpoint(engine, path: Optional[str] = None,
                              ema_params=None) -> Tuple[Dict[str, np.ndarray],
                                                        List[str]]:
    """Inverse of ``convert_panacea_checkpoint``: engine param trees ->
    reference-format torch state dict (the naming of
    ``panaceaplus_40k_deepspeed.ckpt``, reference inference.py:207-228).

    Lets weights trained in this framework be evaluated or finetuned in the
    reference torch stack — the mapping is the same table used for import
    (``build_panacea_mapping``), applied with each transform's inverse, plus
    re-packing the CLIP per-layer q/k/v into torch MultiheadAttention
    ``in_proj_weight/bias``. ``ema_params``: optional EMA shadow tree for the
    diffusion model; exported as the reference LitEma buffers
    (``model_ema.<name without dots>``, ema.py:5-26).

    Returns ``(state_dict, skipped)`` where ``skipped`` lists mapping entries
    whose flax param does not exist (identity skip_connection/nin_shortcut
    blocks — exactly the keys import reports as ``missing``). When ``path``
    is given the dict is saved via torch.save under ``{"state_dict": ...}``.
    """
    import flax

    mapping, clip_prefix, clip_layers = build_panacea_mapping(engine)
    flat = {tuple(k): v for k, v in
            flax.traverse_util.flatten_dict(engine.params).items()}
    clip_emb = None
    for emb in engine.conditioner.embedders:
        if hasattr(emb, "model") and hasattr(emb, "tokenizer"):
            clip_emb = emb
            break
    if clip_emb is not None and getattr(clip_emb, "params", None) is not None:
        for k, v in flax.traverse_util.flatten_dict(clip_emb.params).items():
            flat[("clip",) + tuple(k)] = v

    sd: Dict[str, np.ndarray] = {}
    skipped: List[str] = []
    for ref_key, (p, transform) in mapping.items():
        arr = flat.get(tuple(p))
        if arr is None:
            skipped.append(ref_key)
            continue
        inv = _INVERSE_TRANSFORMS.get(transform)
        assert inv is not None, f"no inverse for transform of {ref_key}"
        sd[ref_key] = inv(np.asarray(arr, dtype=np.float32))

    # CLIP packed qkv: torch nn.MultiheadAttention in_proj = [q; k; v] rows
    if clip_prefix is not None:
        for i in range(clip_layers):
            parts_w, parts_b = [], []
            for name in ("q_proj", "k_proj", "v_proj"):
                base = ("clip", f"resblock_{i}", "attn", name)
                w = flat.get(base + ("kernel",))
                if w is None:
                    break
                parts_w.append(np.asarray(w, np.float32).T)
                b = flat.get(base + ("bias",))
                if b is not None:
                    parts_b.append(np.asarray(b, np.float32))
            if len(parts_w) == 3:
                ref = f"{clip_prefix}.transformer.resblocks.{i}.attn"
                sd[f"{ref}.in_proj_weight"] = np.concatenate(parts_w, axis=0)
                if len(parts_b) == 3:
                    sd[f"{ref}.in_proj_bias"] = np.concatenate(parts_b, axis=0)

    if ema_params is not None:
        shadow_sd, ema_skipped = export_model_ema_buffers(
            engine, ema_params, mapping=mapping)
        if not shadow_sd:
            raise ValueError(
                "EMA export produced 0 model_ema.* buffers "
                f"({len(ema_skipped)} mapping entries unmatched) — the EMA "
                "tree does not mirror engine.params['model']. Pass the bare "
                "shadow param tree (EmaState.ema_params / train.py's "
                "final_ema checkpoint), not a wrapper.")
        sd.update(shadow_sd)

    if path is not None:
        import torch

        torch.save({"state_dict": {k: torch.from_numpy(np.array(v))
                                   for k, v in sd.items()}}, path)
    return sd, skipped


def export_model_ema_buffers(engine, ema_params, mapping=None) -> Tuple[
        Dict[str, np.ndarray], List[str]]:
    """EMA shadow tree (mirrors engine.params['model']) -> reference LitEma
    buffer names: ``model_ema.`` + param name with dots stripped
    (ema.py:5-26; the inverse of ``apply_ema_weights``).

    Accepts the bare shadow tree, an ``EmaState``, or a saved-EmaState dict
    (``{'ema_params': ...}``). ``mapping``: reuse a prebuilt
    ``build_panacea_mapping(engine)[0]`` instead of rebuilding it."""
    import flax

    if hasattr(ema_params, "ema_params"):
        ema_params = ema_params.ema_params
    elif isinstance(ema_params, dict) and set(ema_params) <= {
            "ema_params", "num_updates"}:
        ema_params = ema_params["ema_params"]
    if mapping is None:
        mapping, _, _ = build_panacea_mapping(engine)
    flat = {tuple(k): v for k, v in
            flax.traverse_util.flatten_dict({"model": ema_params}).items()}
    sd: Dict[str, np.ndarray] = {}
    skipped: List[str] = []
    for ref_key, (p, transform) in mapping.items():
        if not ref_key.startswith("model."):
            continue
        arr = flat.get(tuple(p))
        if arr is None:
            skipped.append(ref_key)
            continue
        inv = _INVERSE_TRANSFORMS[transform]
        shadow = "model_ema." + ref_key[len("model."):].replace(".", "")
        sd[shadow] = inv(np.asarray(arr, dtype=np.float32))
    return sd, skipped


# --------------------------------------------------------------------------
# Metric/loss towers: InceptionV3 (FID), VGG16+LPIPS, I3D (FVD)
# --------------------------------------------------------------------------

def _t_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convbn2d(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """torchvision BasicConv2d (conv + BN eps=1e-3, no conv bias) ->
    metrics_gen.inception.ConvBN."""
    return {
        f"{ref}.conv.weight": (path + ("conv", "kernel"), _t_conv2d),
        f"{ref}.bn.weight": (path + ("bn_scale",), _t_none),
        f"{ref}.bn.bias": (path + ("bn_bias",), _t_none),
        f"{ref}.bn.running_mean": (path + ("bn_mean",), _t_none),
        f"{ref}.bn.running_var": (path + ("bn_var",), _t_none),
    }


# torchvision branch name -> flax submodule name, per inception block type
_INCEPTION_BRANCHES = {
    "A": {"branch1x1": "b1x1", "branch5x5_1": "b5_1", "branch5x5_2": "b5_2",
          "branch3x3dbl_1": "b3_1", "branch3x3dbl_2": "b3_2",
          "branch3x3dbl_3": "b3_3", "branch_pool": "bpool"},
    "B": {"branch3x3": "b3", "branch3x3dbl_1": "bd_1", "branch3x3dbl_2": "bd_2",
          "branch3x3dbl_3": "bd_3"},
    "C": {"branch1x1": "b1x1", "branch7x7_1": "b7_1", "branch7x7_2": "b7_2",
          "branch7x7_3": "b7_3", "branch7x7dbl_1": "bd_1",
          "branch7x7dbl_2": "bd_2", "branch7x7dbl_3": "bd_3",
          "branch7x7dbl_4": "bd_4", "branch7x7dbl_5": "bd_5",
          "branch_pool": "bpool"},
    "D": {"branch3x3_1": "b3_1", "branch3x3_2": "b3_2", "branch7x7x3_1": "b7_1",
          "branch7x7x3_2": "b7_2", "branch7x7x3_3": "b7_3",
          "branch7x7x3_4": "b7_4"},
    "E": {"branch1x1": "b1x1", "branch3x3_1": "b3_1", "branch3x3_2a": "b3_2a",
          "branch3x3_2b": "b3_2b", "branch3x3dbl_1": "bd_1",
          "branch3x3dbl_2": "bd_2", "branch3x3dbl_3a": "bd_3a",
          "branch3x3dbl_3b": "bd_3b", "branch_pool": "bpool"},
}

_INCEPTION_BLOCKS = [
    ("Mixed_5b", "A"), ("Mixed_5c", "A"), ("Mixed_5d", "A"),
    ("Mixed_6a", "B"),
    ("Mixed_6b", "C"), ("Mixed_6c", "C"), ("Mixed_6d", "C"), ("Mixed_6e", "C"),
    ("Mixed_7a", "D"),
    ("Mixed_7b", "E"), ("Mixed_7c", "E"),
]


def build_inception_mapping(prefix: str = "",
                            path_prefix: Tuple[str, ...] = ()) -> Dict[str, Tuple]:
    """torchvision/pytorch-fid InceptionV3 state-dict names ->
    metrics_gen.inception.InceptionV3 tree (reference FID wrapper:
    encoders/modules.py:223-241 wraps pytorch-fid, which reuses torchvision
    naming). AuxLogits/fc are intentionally unmapped (feature tower only)."""
    p = f"{prefix}." if prefix and not prefix.endswith(".") else prefix
    m: Dict[str, Tuple] = {}
    for ref, ours in (("Conv2d_1a_3x3", "Conv2d_1a"), ("Conv2d_2a_3x3", "Conv2d_2a"),
                      ("Conv2d_2b_3x3", "Conv2d_2b"), ("Conv2d_3b_1x1", "Conv2d_3b"),
                      ("Conv2d_4a_3x3", "Conv2d_4a")):
        m.update(_convbn2d(f"{p}{ref}", path_prefix + (ours,)))
    for block, kind in _INCEPTION_BLOCKS:
        for ref_branch, our_branch in _INCEPTION_BRANCHES[kind].items():
            m.update(_convbn2d(f"{p}{block}.{ref_branch}",
                               path_prefix + (block, our_branch)))
    return m


# torchvision vgg16.features conv indices for the 13 convs, in order
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# lpips vgg16 wrapper slices (loss/lpips.py:99-120): slice index per conv
_VGG16_SLICE_OF_CONV = (1, 1, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5)


def build_vgg16_lpips_mapping(prefix: str = "",
                              path_prefix: Tuple[str, ...] = (),
                              naming: str = "lpips") -> Dict[str, Tuple]:
    """VGG16 + LPIPS linear heads -> losses/lpips.LPIPS tree.

    naming='lpips': reference module state-dict names (lpips/loss/lpips.py):
    vgg convs live at net.slice{s}.{torchvision feature idx}, heads at
    lin{k}.model.1 (model.0 is Dropout).
    naming='torchvision': raw torchvision vgg16 'features.{idx}' names (no
    lin heads in that checkpoint)."""
    p = f"{prefix}." if prefix and not prefix.endswith(".") else prefix
    m: Dict[str, Tuple] = {}
    for li, (fi, si) in enumerate(zip(_VGG16_CONV_IDX, _VGG16_SLICE_OF_CONV)):
        if naming == "lpips":
            ref = f"{p}net.slice{si}.{fi}"
        elif naming == "torchvision":
            ref = f"{p}features.{fi}"
        else:
            raise ValueError(naming)
        m.update(_conv(ref, path_prefix + ("vgg", f"conv{li}")))
    if naming == "lpips":
        for k in range(5):
            m[f"{p}lin{k}.model.1.weight"] = (
                path_prefix + (f"lin{k}", "kernel"), _t_conv2d)
    return m


def _unit3d(ref: str, path: Tuple[str, ...], use_bn: bool = True) -> Dict[str, Tuple]:
    """pytorch-i3d Unit3D (conv3d + BN) -> metrics_gen.i3d.Unit3D."""
    m: Dict[str, Tuple] = {
        f"{ref}.conv3d.weight": (path + ("conv", "kernel"), _t_conv3d),
    }
    if use_bn:
        m.update({
            f"{ref}.bn.weight": (path + ("bn_scale",), _t_none),
            f"{ref}.bn.bias": (path + ("bn_bias",), _t_none),
            f"{ref}.bn.running_mean": (path + ("bn_mean",), _t_none),
            f"{ref}.bn.running_var": (path + ("bn_var",), _t_none),
        })
    else:
        m[f"{ref}.conv3d.bias"] = (path + ("conv", "bias"), _t_none)
    return m


_I3D_MIXED = ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
              "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c")
# pytorch-i3d branch names -> our InceptionModule3D names
_I3D_BRANCHES = {"b0": "b0", "b1a": "b1a", "b1b": "b1b", "b2a": "b2a",
                 "b2b": "b2b", "b3b": "b3"}


def build_i3d_mapping(prefix: str = "",
                      path_prefix: Tuple[str, ...] = (),
                      with_logits: bool = True) -> Dict[str, Tuple]:
    """pytorch-i3d (Kinetics-400) state-dict names -> metrics_gen.i3d.I3D."""
    p = f"{prefix}." if prefix and not prefix.endswith(".") else prefix
    m: Dict[str, Tuple] = {}
    for ref, ours in (("Conv3d_1a_7x7", "Conv3d_1a"), ("Conv3d_2b_1x1", "Conv3d_2b"),
                      ("Conv3d_2c_3x3", "Conv3d_2c")):
        m.update(_unit3d(f"{p}{ref}", path_prefix + (ours,)))
    for block in _I3D_MIXED:
        for ref_b, our_b in _I3D_BRANCHES.items():
            m.update(_unit3d(f"{p}{block}.{ref_b}",
                             path_prefix + (block, our_b)))
    if with_logits:
        m.update(_unit3d(f"{p}logits", path_prefix + ("logits",), use_bn=False))
    return m


# --------------------------------------------------------------------------
# StreamPETR detector checkpoint (metrics/StreamPETR mmdet naming)
# --------------------------------------------------------------------------

def _bn(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """mmdet BatchNorm -> FrozenBatchNorm scale/bias/mean/var."""
    return {
        f"{ref}.weight": (path + ("scale",), _t_none),
        f"{ref}.bias": (path + ("bias",), _t_none),
        f"{ref}.running_mean": (path + ("mean",), _t_none),
        f"{ref}.running_var": (path + ("var",), _t_none),
    }


def _mln(ref: str, path: Tuple[str, ...]) -> Dict[str, Tuple]:
    """MLN (misc.py:178-213): reduce.0 Linear + gamma/beta Linears."""
    m = {}
    m.update(_linear(f"{ref}.reduce.0", path + ("reduce",)))
    m.update(_linear(f"{ref}.gamma", path + ("gamma",)))
    m.update(_linear(f"{ref}.beta", path + ("beta",)))
    return m


def build_resnet50_mapping(prefix: str = "img_backbone",
                           path_prefix: Tuple[str, ...] = ("backbone",),
                           stage_blocks=(3, 4, 6, 3)) -> Dict[str, Tuple]:
    m: Dict[str, Tuple] = {}
    m[f"{prefix}.conv1.weight"] = (path_prefix + ("conv1", "kernel"), _t_conv2d)
    m.update(_bn(f"{prefix}.bn1", path_prefix + ("bn1",)))
    for s, n in enumerate(stage_blocks):
        for i in range(n):
            ref = f"{prefix}.layer{s + 1}.{i}"
            p = path_prefix + (f"layer{s + 1}_{i}",)
            for ci in (1, 2, 3):
                m[f"{ref}.conv{ci}.weight"] = (
                    p + (f"conv{ci}", "kernel"), _t_conv2d)
                m.update(_bn(f"{ref}.bn{ci}", p + (f"bn{ci}",)))
            if i == 0:
                m[f"{ref}.downsample.0.weight"] = (
                    p + ("ds_conv", "kernel"), _t_conv2d)
                m.update(_bn(f"{ref}.downsample.1", p + ("ds_bn",)))
    return m


def build_fpn_mapping(prefix: str = "img_neck",
                      path_prefix: Tuple[str, ...] = ("neck",),
                      num_laterals: int = 3, num_outs: int = 5):
    m: Dict[str, Tuple] = {}
    for i in range(num_laterals):
        m.update(_conv(f"{prefix}.lateral_convs.{i}.conv",
                       path_prefix + (f"lateral_{i}",)))
    for i in range(num_outs):
        m.update(_conv(f"{prefix}.fpn_convs.{i}.conv",
                       path_prefix + (f"fpn_{i}",)))
    return m


def build_vovnet_mapping(prefix: str = "img_backbone",
                         path_prefix: Tuple[str, ...] = ("backbone",),
                         num_blocks=(1, 3, 9, 3),
                         num_layers: int = 5) -> Dict[str, Tuple]:
    """VoVNetV2(-99) mmdet naming (reference models/backbones/vovnet.py:
    300-331 — stem ``stem.stem_{k}/conv``, stages
    ``stage{s}.OSA{s}_{b}.layers.{i}.OSA{s}_{b}_{i}/conv``, 1x1 aggregation
    ``...concat.OSA{s}_{b}_concat/conv``, eSE ``...ese.fc``) onto the flax
    VoVNet tree (perception/vovnet.py). VoVNetCP shares the naming."""
    m: Dict[str, Tuple] = {}
    for k in (1, 2, 3):
        ref = f"{prefix}.stem.stem_{k}"
        p = path_prefix + (f"stem{k}",)
        m[f"{ref}/conv.weight"] = (p + ("conv", "kernel"), _t_conv2d)
        m.update(_bn(f"{ref}/norm", p + ("bn",)))
    for si, nb in enumerate(num_blocks):
        s = si + 2
        for bi in range(nb):
            ref = f"{prefix}.stage{s}.OSA{s}_{bi + 1}"
            p = path_prefix + (f"stage{s}_block{bi}",)
            for li in range(num_layers):
                lref = f"{ref}.layers.{li}.OSA{s}_{bi + 1}_{li}"
                lp = p + (f"conv{li}",)
                m[f"{lref}/conv.weight"] = (lp + ("conv", "kernel"), _t_conv2d)
                m.update(_bn(f"{lref}/norm", lp + ("bn",)))
            cref = f"{ref}.concat.OSA{s}_{bi + 1}_concat"
            cp = p + ("concat_conv",)
            m[f"{cref}/conv.weight"] = (cp + ("conv", "kernel"), _t_conv2d)
            m.update(_bn(f"{cref}/norm", cp + ("bn",)))
            m.update(_conv(f"{ref}.ese.fc", p + ("ese", "fc")))
    return m


def _t_deconv2d(w):
    """torch ConvTranspose2d (I,O,kh,kw) -> flax ConvTranspose (kh,kw,I,O).
    torch scatters W[di,dj] unflipped; flax's lax.conv_transpose treats the
    kernel as a fractionally-strided conv filter — spatially mirrored, so
    flip kh/kw."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def build_eva_mapping(prefix: str = "img_backbone",
                      path_prefix: Tuple[str, ...] = ("backbone",),
                      depth: int = 12,
                      residual_block_indexes=(),
                      scale_factors=(4.0, 2.0, 1.0, 0.5)) -> Dict[str, Tuple]:
    """EVA-02 ViT naming (reference models/backbones/eva.py: patch_embed.proj,
    blocks.{i}.attn.{q,k,v}_proj + q_bias/v_bias, mlp.w1/w2/ffn_ln/w3,
    adapter.simfp_{s} stages) onto the flax EVAViT tree. ``pos_embed`` is NOT
    mapped here — its (1, n(+cls), C) table needs get_abs_pos interpolation;
    see convert_eva_pos_embed."""
    m: Dict[str, Tuple] = {}
    m.update(_conv(f"{prefix}.patch_embed.proj", path_prefix + ("patch_embed",)))
    for i in range(depth):
        ref = f"{prefix}.blocks.{i}"
        p = path_prefix + (f"block_{i}",)
        m.update(_ln(f"{ref}.norm1", p + ("norm1",)))
        m.update(_ln(f"{ref}.norm2", p + ("norm2",)))
        a = p + ("attn",)
        for nm in ("q_proj", "k_proj", "v_proj"):
            m.update(_linear(f"{ref}.attn.{nm}", a + (nm,), bias=False))
        m[f"{ref}.attn.q_bias"] = (a + ("q_bias",), _t_none)
        m[f"{ref}.attn.v_bias"] = (a + ("v_bias",), _t_none)
        m.update(_linear(f"{ref}.attn.proj", a + ("proj",)))
        m.update(_linear(f"{ref}.mlp.w1", p + ("w1",)))
        m.update(_linear(f"{ref}.mlp.w2", p + ("w2",)))
        m.update(_ln(f"{ref}.mlp.ffn_ln", p + ("ffn_ln",)))
        m.update(_linear(f"{ref}.mlp.w3", p + ("w3",)))
        if i in residual_block_indexes:
            r = p + ("residual",)
            for ci in (1, 2, 3):
                m[f"{ref}.residual.conv{ci}.weight"] = (
                    r + (f"conv{ci}", "kernel"), _t_conv2d)
                m.update(_ln(f"{ref}.residual.norm{ci}", r + (f"norm{ci}",)))
    ad = path_prefix + ("adapter",)
    for scale in scale_factors:
        s = int(np.log2(16 / scale))
        ref = f"{prefix}.adapter.simfp_{s}"
        nm = f"simfp_{s}"
        # Sequential index layout per scale (eva.py:741-781):
        # 4.0: [deconv, LN, GELU, deconv, conv1x1(+LN), conv3x3(+LN)]
        # 2.0: [deconv, conv1x1, conv3x3]; 1.0: [conv1x1, conv3x3]
        # 0.5: [pool, conv1x1, conv3x3]. Conv2d wrapper registers norm as
        # submodule `.norm` of the conv.
        if scale == 4.0:
            m[f"{ref}.0.weight"] = (ad + (f"{nm}_up1", "kernel"), _t_deconv2d)
            m[f"{ref}.0.bias"] = (ad + (f"{nm}_up1", "bias"), _t_none)
            m.update(_ln(f"{ref}.1", ad + (f"{nm}_upln",)))
            m[f"{ref}.3.weight"] = (ad + (f"{nm}_up2", "kernel"), _t_deconv2d)
            m[f"{ref}.3.bias"] = (ad + (f"{nm}_up2", "bias"), _t_none)
            lat, out = 4, 5
        elif scale == 2.0:
            m[f"{ref}.0.weight"] = (ad + (f"{nm}_up1", "kernel"), _t_deconv2d)
            m[f"{ref}.0.bias"] = (ad + (f"{nm}_up1", "bias"), _t_none)
            lat, out = 1, 2
        elif scale == 1.0:
            lat, out = 0, 1
        else:  # 0.5
            lat, out = 1, 2
        m[f"{ref}.{lat}.weight"] = (ad + (f"{nm}_lateral", "kernel"), _t_conv2d)
        m.update(_ln(f"{ref}.{lat}.norm", ad + (f"{nm}_lateral_ln",)))
        m[f"{ref}.{out}.weight"] = (ad + (f"{nm}_out", "kernel"), _t_conv2d)
        m.update(_ln(f"{ref}.{out}.norm", ad + (f"{nm}_out_ln",)))
    return m


def convert_eva_pos_embed(pos: np.ndarray, grid_hw: Tuple[int, int],
                          use_cls_token: bool = True) -> np.ndarray:
    """Reference get_abs_pos (blocks.py): drop the cls token, reshape the
    (1, n, C) table to its square pretrain grid, bicubic-resize to the working
    (H, W) grid. Returns (1, H, W, C) for the flax pos_embed param."""
    import jax

    if use_cls_token:
        pos = pos[:, 1:]
    n = pos.shape[1]
    side = int(round(float(n) ** 0.5))
    assert side * side == n, (n, "pos table is not square")
    c = pos.shape[-1]
    grid = pos.reshape(side, side, c)
    if (side, side) == tuple(grid_hw):
        return np.asarray(grid, dtype=np.float32)[None]
    out = jax.image.resize(jnp_array(grid), (grid_hw[0], grid_hw[1], c),
                           method="bicubic")
    return np.asarray(out)[None]


def jnp_array(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def build_sparse_head_mapping(prefix: str = "pts_bbox_head",
                              path_prefix: Tuple[str, ...] = ("head",),
                              num_layers: int = 6,
                              proposal_queries: bool = False
                              ) -> Dict[str, Tuple]:
    """SparseHead naming (sparse_head.py:198-243; detr3d_transformer.py). The
    packed self-attn in_proj is handled in convert_streampetr_checkpoint.
    ``proposal_queries`` adds the SparseHeadv3 context-query modules
    (sparse_head_v3.py:266-285: ``input_proj`` Linear+LN stack and
    ``context_embedding`` MLP; torch Sequential indices equal the flax
    ``layers_{i}`` names)."""
    m: Dict[str, Tuple] = {
        f"{prefix}.reference_points.weight": (
            path_prefix + ("reference_points",), _t_none),
        f"{prefix}.pseudo_reference_points.weight": (
            path_prefix + ("pseudo_reference_points",), _t_none),
    }
    if proposal_queries:
        for i in (0, 3):
            m.update(_linear(f"{prefix}.input_proj.{i}",
                             path_prefix + ("input_proj", f"layers_{i}")))
        for i in (1, 4):
            m.update(_ln(f"{prefix}.input_proj.{i}",
                         path_prefix + ("input_proj", f"layers_{i}")))
        for i in (0, 2):
            m.update(_linear(
                f"{prefix}.context_embedding.{i}",
                path_prefix + ("context_embedding", f"layers_{i}")))
    m.update(_linear(f"{prefix}.query_embedding.0",
                     path_prefix + ("query_embedding", "layers_0")))
    m.update(_linear(f"{prefix}.query_embedding.2",
                     path_prefix + ("query_embedding", "layers_2")))
    m.update(_linear(f"{prefix}.time_embedding.0",
                     path_prefix + ("time_embedding", "layers_0")))
    m.update(_ln(f"{prefix}.time_embedding.1",
                 path_prefix + ("time_embedding", "layers_1")))
    m.update(_mln(f"{prefix}.ego_pose_pe", path_prefix + ("ego_pose_pe",)))
    m.update(_mln(f"{prefix}.ego_pose_memory",
                  path_prefix + ("ego_pose_memory",)))
    m.update(_mln(f"{prefix}.transformer.spatial_alignment",
                  path_prefix + ("spatial_alignment",)))
    for i in range(num_layers):
        lref = f"{prefix}.transformer.decoder.layers.{i}"
        m.update(_linear(f"{lref}.attentions.0.attn.out_proj",
                         path_prefix + (f"self_attn_{i}", "out_proj")))
        d = path_prefix + (f"cross_attn_{i}",)
        m.update(_linear(f"{lref}.attentions.1.weights_fc",
                         d + ("weights_fc",)))
        m.update(_linear(f"{lref}.attentions.1.output_proj",
                         d + ("output_proj",)))
        m.update(_linear(f"{lref}.attentions.1.learnable_fc",
                         d + ("learnable_fc",)))
        m.update(_linear(f"{lref}.attentions.1.cam_embed.0",
                         d + ("cam_embed_fc1",)))
        m.update(_linear(f"{lref}.attentions.1.cam_embed.2",
                         d + ("cam_embed_fc2",)))
        m.update(_ln(f"{lref}.attentions.1.cam_embed.4",
                     d + ("cam_embed_ln",)))
        m.update(_linear(f"{lref}.ffns.0.layers.0.0",
                         path_prefix + (f"ffn_{i}", "fc1")))
        m.update(_linear(f"{lref}.ffns.0.layers.1",
                         path_prefix + (f"ffn_{i}", "fc2")))
        for ni in range(3):
            m.update(_ln(f"{lref}.norms.{ni}",
                         path_prefix + (f"norm_{3 * i + ni}",)))
    # shared branches (the reference ModuleList repeats one instance; index 0)
    m.update(_linear(f"{prefix}.cls_branches.0.0",
                     path_prefix + ("cls_branch", "layers_0")))
    m.update(_ln(f"{prefix}.cls_branches.0.1",
                 path_prefix + ("cls_branch", "layers_1")))
    m.update(_linear(f"{prefix}.cls_branches.0.3",
                     path_prefix + ("cls_branch", "layers_3")))
    m.update(_ln(f"{prefix}.cls_branches.0.4",
                 path_prefix + ("cls_branch", "layers_4")))
    m.update(_linear(f"{prefix}.cls_branches.0.6",
                     path_prefix + ("cls_branch", "layers_6")))
    m.update(_linear(f"{prefix}.reg_branches.0.0",
                     path_prefix + ("reg_branch", "layers_0")))
    m.update(_linear(f"{prefix}.reg_branches.0.2",
                     path_prefix + ("reg_branch", "layers_2")))
    m.update(_linear(f"{prefix}.reg_branches.0.4",
                     path_prefix + ("reg_branch", "layers_4")))
    return m


def build_petr_head_mapping(prefix: str = "pts_bbox_head",
                            path_prefix: Tuple[str, ...] = ("head",),
                            num_layers: int = 6,
                            with_traj: bool = False) -> Dict[str, Tuple]:
    """StreamPETRHead naming (streampetr_head.py:233-295 + PETRTemporal
    transformer layers). Both attentions are packed-in_proj
    nn.MultiheadAttention (self + dense PETR cross-attn) — the qkv splits
    happen in convert_streampetr_checkpoint. ``with_traj`` adds the
    PETRMotionHead trajectory branch (petr_motion_head.py:281-290:
    traj_embedding + ONE traj_branch module replicated per layer — only
    the .0 copy is mapped, like the shared cls/reg branches)."""
    m: Dict[str, Tuple] = {
        f"{prefix}.reference_points.weight": (
            path_prefix + ("reference_points",), _t_none),
        f"{prefix}.pseudo_reference_points.weight": (
            path_prefix + ("pseudo_reference_points",), _t_none),
    }
    m.update(_linear(f"{prefix}.query_embedding.0",
                     path_prefix + ("query_embedding", "layers_0")))
    m.update(_linear(f"{prefix}.query_embedding.2",
                     path_prefix + ("query_embedding", "layers_2")))
    m.update(_linear(f"{prefix}.time_embedding.0",
                     path_prefix + ("time_embedding", "layers_0")))
    m.update(_ln(f"{prefix}.time_embedding.1",
                 path_prefix + ("time_embedding", "layers_1")))
    m.update(_mln(f"{prefix}.ego_pose_pe", path_prefix + ("ego_pose_pe",)))
    m.update(_mln(f"{prefix}.ego_pose_memory",
                  path_prefix + ("ego_pose_memory",)))
    m.update(_mln(f"{prefix}.spatial_alignment",
                  path_prefix + ("spatial_alignment",)))
    m.update(_linear(f"{prefix}.position_encoder.0",
                     path_prefix + ("position_encoder", "layers_0")))
    m.update(_linear(f"{prefix}.position_encoder.2",
                     path_prefix + ("position_encoder", "layers_2")))
    m.update(_linear(f"{prefix}.memory_embed.0",
                     path_prefix + ("memory_embed", "layers_0")))
    m.update(_linear(f"{prefix}.memory_embed.2",
                     path_prefix + ("memory_embed", "layers_2")))
    m.update(_linear(f"{prefix}.featurized_pe.conv_reduce",
                     path_prefix + ("featurized_pe", "conv_reduce")))
    m.update(_linear(f"{prefix}.featurized_pe.conv_expand",
                     path_prefix + ("featurized_pe", "conv_expand")))
    # shared post_norm on every decoder intermediate
    # (PETRTransformerDecoder, petr_transformer.py:249-252)
    m.update(_ln(f"{prefix}.transformer.decoder.post_norm",
                 path_prefix + ("post_norm",)))
    for i in range(num_layers):
        lref = f"{prefix}.transformer.decoder.layers.{i}"
        m.update(_linear(f"{lref}.attentions.0.attn.out_proj",
                         path_prefix + (f"self_attn_{i}", "out_proj")))
        m.update(_linear(f"{lref}.attentions.1.attn.out_proj",
                         path_prefix + (f"cross_attn_{i}", "out_proj")))
        m.update(_linear(f"{lref}.ffns.0.layers.0.0",
                         path_prefix + (f"ffn_{i}", "fc1")))
        m.update(_linear(f"{lref}.ffns.0.layers.1",
                         path_prefix + (f"ffn_{i}", "fc2")))
        for ni in range(3):
            m.update(_ln(f"{lref}.norms.{ni}",
                         path_prefix + (f"norm_{3 * i + ni}",)))
    for branch, idxs in (("cls_branch", (0, 1, 3, 4, 6)),
                         ("reg_branch", (0, 2, 4))):
        for j in idxs:
            layer = (_ln if (branch == "cls_branch" and j in (1, 4))
                     else _linear)
            layer_ref = f"{prefix}.{branch[:3]}_branches.0.{j}"
            m.update(layer(layer_ref, path_prefix + (branch, f"layers_{j}")))
    if with_traj:
        m[f"{prefix}.traj_embedding.weight"] = (
            path_prefix + ("traj_embedding",), _t_none)
        for j in (0, 2, 4):
            m.update(_linear(f"{prefix}.traj_branches.0.{j}",
                             path_prefix + ("traj_branch", f"layers_{j}")))
    return m


def build_focal_head_mapping(prefix: str = "img_roi_head",
                             path_prefix: Tuple[str, ...] = ("roi_head",)
                             ) -> Dict[str, Tuple]:
    """Reference FocalHead naming (dense_heads/focal_head.py:118-134 —
    ``shared_cls``/``shared_reg`` Sequential[conv, GN, relu] towers, 1x1
    ``cls``/``centerness``/``ltrb``/``center2d`` predictors) onto the flax
    FocalHead tree (perception/focal_head.py)."""
    m: Dict[str, Tuple] = {}
    for tower in ("shared_cls", "shared_reg"):
        m.update(_conv(f"{prefix}.{tower}.0",
                       path_prefix + (f"{tower}_conv",)))
        m[f"{prefix}.{tower}.1.weight"] = (
            path_prefix + (f"{tower}_gn", "scale"), _t_none)
        m[f"{prefix}.{tower}.1.bias"] = (
            path_prefix + (f"{tower}_gn", "bias"), _t_none)
    for head in ("cls", "centerness", "ltrb", "center2d"):
        m.update(_conv(f"{prefix}.{head}", path_prefix + (head,)))
    return m


def build_yolox_head_mapping(prefix: str = "img_roi_head",
                             path_prefix: Tuple[str, ...] = ("roi_head",),
                             num_levels: int = 3,
                             stacked_convs: int = 2) -> Dict[str, Tuple]:
    """Reference YOLOXHeadCustom naming (dense_heads/yolox_head.py:132-179 —
    per-level ``multi_level_{cls,reg}_convs.{l}.{i}`` ConvModules (conv+BN)
    and ``multi_level_conv_{cls,reg,obj,centers2d}.{l}`` 1x1 predictors)
    onto the flax YOLOXHead tree (perception/yolox_head.py)."""
    m: Dict[str, Tuple] = {}
    for li in range(num_levels):
        for i in range(stacked_convs):
            for fam, nm in (("cls_convs", "cls"), ("reg_convs", "reg")):
                ref = f"{prefix}.multi_level_{fam}.{li}.{i}"
                p = path_prefix
                m[f"{ref}.conv.weight"] = (
                    p + (f"l{li}_{nm}{i}_conv", "kernel"), _t_conv2d)
                m.update(_bn(f"{ref}.bn", p + (f"l{li}_{nm}{i}_bn",)))
        for pred in ("cls", "reg", "obj", "centers2d"):
            m.update(_conv(f"{prefix}.multi_level_conv_{pred}.{li}",
                           path_prefix + (f"l{li}_conv_{pred}",)))
    return m


def build_atss_head_mapping(prefix: str = "img_roi_head",
                            path_prefix: Tuple[str, ...] = ("roi_head",),
                            stacked_convs: int = 4) -> Dict[str, Tuple]:
    """Reference ATSSTaskHead naming (dense_heads/atss_head.py:80-118 —
    ``cls_convs.{i}.conv``, ``reg_convs.{i}.conv``, ``atss_cls``,
    ``atss_reg``, ``atss_centerness``) onto the flax ATSSHead tree
    (perception/atss.py). The reference branch convs carry a GN norm
    (ConvModule norm_cfg) that the flax head folds away — GN affines are
    left unmapped; per-level ``scales.{i}.scale`` scalars are likewise
    skipped (both init at 1.0, matching mmdet init)."""
    m: Dict[str, Tuple] = {}
    for i in range(stacked_convs):
        m.update(_conv(f"{prefix}.cls_convs.{i}.conv",
                       path_prefix + (f"cls_conv{i}",)))
        m.update(_conv(f"{prefix}.reg_convs.{i}.conv",
                       path_prefix + (f"reg_conv{i}",)))
    m.update(_conv(f"{prefix}.atss_cls", path_prefix + ("cls_out",)))
    m.update(_conv(f"{prefix}.atss_reg", path_prefix + ("reg_out",)))
    m.update(_conv(f"{prefix}.atss_centerness", path_prefix + ("ctr_out",)))
    return m


def build_fcos_proposal_mapping(
        prefix: str = "img_rpn_head",
        path_prefix: Tuple[str, ...] = ("rpn_head",),
        stacked_convs: int = 4,
        cls_branch: Tuple[int, ...] = (128, 64),
        centerness_branch: Tuple[int, ...] = (64,),
        reg_keys: Tuple[str, ...] = ("offset", "depth", "size", "rot",
                                     "velo"),
        reg_branch: Tuple[Tuple[int, ...], ...] = ((128, 64), (128, 64),
                                                   (64,), (64,), ()),
        dir_branch: Tuple[int, ...] = (64,),
) -> Dict[str, Tuple]:
    """Reference FCOSMono3D_ProposalHead naming (dense_heads/
    fcos_proposal_head.py:266-412 — ``cls_convs``/``reg_convs`` ConvModule
    stacks, ``_init_branch`` prev towers (conv+gn), ``conv_regs`` ModuleDict
    1x1 predictors, ``conv_dir_cls``) onto the flax FCOSProposalHead tree
    (perception/fcos_proposal.py). Per-level ``scales.{l}.{offset,depth}
    .scale`` scalars map onto the packed (L, 2) ``scales`` param OUTSIDE this
    dict (one ref key per flax leaf only) — callers merge them via
    ``pack_fcos_scales``."""
    m: Dict[str, Tuple] = {}

    def branch(ref, path, n):
        for i in range(n):
            m.update(_conv(f"{ref}.{i}.conv", path + (f"conv{i}",)))
            # ConvModule bias='auto' with GN -> conv has no bias
            m.pop(f"{ref}.{i}.conv.bias", None)
            m[f"{ref}.{i}.gn.weight"] = (path + (f"gn{i}", "scale"), _t_none)
            m[f"{ref}.{i}.gn.bias"] = (path + (f"gn{i}", "bias"), _t_none)

    branch(f"{prefix}.cls_convs", path_prefix + ("cls_convs",),
           stacked_convs)
    branch(f"{prefix}.reg_convs", path_prefix + ("reg_convs",),
           stacked_convs)
    branch(f"{prefix}.conv_cls_prev", path_prefix + ("conv_cls_prev",),
           len(cls_branch))
    branch(f"{prefix}.conv_centerness_prev",
           path_prefix + ("conv_centerness_prev",), len(centerness_branch))
    branch(f"{prefix}.conv_dir_cls_prev",
           path_prefix + ("conv_dir_cls_prev",), len(dir_branch))
    for k, br in zip(reg_keys, reg_branch):
        if len(br):
            branch(f"{prefix}.conv_reg_prevs.{k}",
                   path_prefix + (f"conv_reg_prev_{k}",), len(br))
        m.update(_conv(f"{prefix}.conv_regs.{k}",
                       path_prefix + (f"conv_reg_{k}",)))
    m.update(_conv(f"{prefix}.conv_cls", path_prefix + ("conv_cls",)))
    m.update(_conv(f"{prefix}.conv_centerness",
                   path_prefix + ("conv_centerness",)))
    m.update(_conv(f"{prefix}.conv_dir_cls", path_prefix + ("conv_dir_cls",)))
    return m


def pack_fcos_scales(sd: Dict[str, np.ndarray], num_levels: int,
                     prefix: str = "img_rpn_head") -> np.ndarray:
    """Gather the reference's per-level Scale modules
    (``scales.{l}.{offset,depth}.scale``, fcos_proposal_head.py:286-298)
    into the flax head's packed (L, 2) ``scales`` param; missing entries
    stay at the shared 1.0 init."""
    out = np.ones((num_levels, 2), np.float32)
    for li in range(num_levels):
        for ci, attr in enumerate(("offset", "depth")):
            k = f"{prefix}.scales.{li}.{attr}.scale"
            if k in sd:
                out[li, ci] = float(np.asarray(sd[k]).reshape(()))
    return out


def merge_params(base, overlay):
    """Overlay converted leaves onto an initialized param tree.

    For a *partial* pretrain checkpoint (e.g. the ATSS 2D nuImages
    pretrain `atss_r50_fpn_20epoch_nuim_sgd_remapped.pth`, reference
    window.py:275, which only covers backbone/neck/roi-head) the converted
    tree must be merged into — not substituted for — the initialized
    detector params. Leaves whose path exists in ``base`` with a matching
    shape are replaced; everything else stays at init. Returns
    (merged, n_merged, skipped) where ``skipped`` lists overlay paths that
    were absent from base or shape-mismatched."""
    import flax

    bflat = flax.traverse_util.flatten_dict(base)
    oflat = flax.traverse_util.flatten_dict(overlay)
    n = 0
    skipped = []
    for k, v in oflat.items():
        if k in bflat and tuple(bflat[k].shape) == tuple(v.shape):
            bflat[k] = v
            n += 1
        else:
            skipped.append("/".join(k))
    return flax.traverse_util.unflatten_dict(bflat), n, skipped


def convert_streampetr_checkpoint(path_or_sd, num_layers: int = 6,
                                  stage_blocks=(3, 4, 6, 3),
                                  backbone: str = "r50",
                                  head: str = "sparse",
                                  fpn_laterals: int = 3,
                                  with_atss: bool = False,
                                  atss_stacked_convs: int = 4,
                                  eva_cfg: Optional[Dict] = None):
    """Reference StreamPETR eval checkpoint -> StreamPETRWindow param tree.
    ``backbone``: 'r50', 'vovnet' or 'eva' (matches the detector's
    backbone_type; VoVNet uses fpn_laterals=2 in the reference VoVNet-99
    configs; EVA carries its own SimpleFeaturePyramid so no FPN keys).
    ``head``: 'sparse' (SparseHead), 'sparse_v3'/'sparse_v4' (proposal-query
    variants; v3 adds input_proj/context_embedding), or 'petr'
    (StreamPETRHead — its dense cross-attn is a second packed-in_proj
    MultiheadAttention).
    ``with_atss`` additionally maps the img_roi_head ATSS auxiliary.
    ``eva_cfg``: kwargs for build_eva_mapping plus optional ``grid_hw`` for
    pos_embed interpolation (convert_eva_pos_embed).
    Returns (params, report)."""
    import flax

    sd = (load_torch_checkpoint(path_or_sd)
          if isinstance(path_or_sd, str) else path_or_sd)
    mapping: Dict[str, Tuple] = {}
    eva_cfg = dict(eva_cfg or {})
    eva_grid_hw = eva_cfg.pop("grid_hw", None)
    if backbone == "r50":
        mapping.update(build_resnet50_mapping(stage_blocks=stage_blocks))
    elif backbone == "vovnet":
        mapping.update(build_vovnet_mapping())
        fpn_laterals = min(fpn_laterals, 2)
    elif backbone == "eva":
        mapping.update(build_eva_mapping(**eva_cfg))
    else:
        raise ValueError(f"no converter for backbone {backbone!r}")
    if backbone != "eva":  # EVA's sim_fpn adapter is the neck (eva.py:698)
        mapping.update(build_fpn_mapping(num_laterals=fpn_laterals))
    if with_atss:
        mapping.update(build_atss_head_mapping(
            stacked_convs=atss_stacked_convs))
    if head in ("sparse", "sparse_v3", "sparse_v4"):
        # v3 carries the proposal context-query modules; v4 (seed mode)
        # has the plain SparseHead tree (sparse_head_v4.py:264-283 only
        # builds input_proj/context under the non-default using_context)
        mapping.update(build_sparse_head_mapping(
            num_layers=num_layers,
            proposal_queries=(head == "sparse_v3")))
        packed_attns = [("attentions.0", "self_attn")]
    elif head in ("petr", "motion", "petr_dn"):
        # 'motion' = PETRMotionHead (generation-side petr_motion_head.py):
        # the petr tree + traj_embedding/traj_branch. 'petr_dn' =
        # PETRHeadDN: the petr tree minus the memory towers — those mapping
        # entries simply report missing against a DN-head checkpoint.
        mapping.update(build_petr_head_mapping(
            num_layers=num_layers, with_traj=(head == "motion")))
        packed_attns = [("attentions.0", "self_attn"),
                        ("attentions.1", "cross_attn")]
    else:
        raise ValueError(f"no converter for head {head!r}")
    params, missing, unexpected = convert_state_dict(sd, mapping)

    # packed nn.MultiheadAttention qkv per decoder layer
    flat = flax.traverse_util.flatten_dict(params)
    used = []
    pos_key = "img_backbone.pos_embed"
    if backbone == "eva" and pos_key in sd and eva_grid_hw is not None:
        flat[("backbone", "pos_embed")] = convert_eva_pos_embed(
            np.asarray(sd[pos_key]), tuple(eva_grid_hw))
        used.append(pos_key)
    for i in range(num_layers):
        for attn_ref, attn_name in packed_attns:
            wk = (f"pts_bbox_head.transformer.decoder.layers.{i}."
                  f"{attn_ref}.attn.in_proj_weight")
            bk = wk.replace("in_proj_weight", "in_proj_bias")
            if wk in sd:
                w = np.asarray(sd[wk])
                b = np.asarray(sd[bk]) if bk in sd else None
                c = w.shape[0] // 3
                for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    p = ("head", f"{attn_name}_{i}", name)
                    flat[p + ("kernel",)] = w[j * c:(j + 1) * c].T
                    if b is not None:
                        flat[p + ("bias",)] = b[j * c:(j + 1) * c]
                used += [wk, bk]
    params = flax.traverse_util.unflatten_dict(flat)
    unexpected = [k for k in unexpected if k not in used]
    report = {"missing": missing, "unexpected": unexpected}
    print(f"StreamPETR restore: {len(missing)} missing, "
          f"{len(unexpected)} unexpected")
    return params, report
