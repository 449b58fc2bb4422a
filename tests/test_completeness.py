"""Automated component-completeness sweep (VERDICT r3 next-round #8).

Walks every top-level ``class`` in the reference ``sgm/`` package and asserts
each one is accounted for in exactly one of three ways:

  1. its reference dotted path resolves through the registry alias table
     (``panacea_tpu.registry._ALIASES``) — the config-facing components;
  2. it has an explicit EQUIVALENT — a ``module:attr`` in this repo that
     implements the same capability under a different name/shape (verified
     importable), for internal classes that are not config targets;
  3. it appears in WAIVERS with a one-line justification (dead code in the
     snapshot, torch-runtime plumbing that JAX replaces wholesale, etc.).

The vendored mmdet3d data plugin (~62 classes) is covered by a per-area map:
every plugin class's path must fall under a listed prefix whose repo-side
covering module must import.

Staleness is symmetric: an EQUIV/WAIVER entry whose reference class no longer
exists fails the sweep, so the bookkeeping cannot rot in either direction.
"""

import ast
import importlib
import os

import pytest

REF = "/root/reference/sgm"
PLUGIN_DIR = os.path.join(REF, "data", "nuscenes_video", "projects")

# internal (non-config-target) reference classes -> repo equivalent to import
EQUIV = {
    # attention.py — the decomposed-4D stack (redesigned, models/transformer.py)
    "sgm.modules.attention.GEGLU":
        "panacea_tpu.models.transformer:GEGLUFeedForward",
    "sgm.modules.attention.FeedForward":
        "panacea_tpu.models.transformer:GEGLUFeedForward",
    "sgm.modules.attention.SpatialSelfAttention":
        "panacea_tpu.models.vae:VAEAttnBlock",
    "sgm.modules.attention.CrossAttention":
        "panacea_tpu.models.transformer:MultiHeadAttention",
    "sgm.modules.attention.MemoryEfficientCrossAttention":
        "panacea_tpu.models.transformer:MultiHeadAttention",
    "sgm.modules.attention.MemoryEfficientIntraViewAttention":
        "panacea_tpu.models.transformer:BasicTransformerBlock",  # mode='intra-view'
    "sgm.modules.attention.MemoryEfficientInterViewAttentionTwo":
        "panacea_tpu.models.transformer:BasicTransformerBlock",  # mode='inter-view'
    "sgm.modules.attention.BasicTransformerBlock":
        "panacea_tpu.models.transformer:BasicTransformerBlock",
    "sgm.modules.attention.SpatialTemporalTransformer":
        "panacea_tpu.models.transformer:SpatialTemporalTransformer",
    # ema / distributions
    "sgm.modules.ema.LitEma": "panacea_tpu.utils.ema:ema_update",
    "sgm.modules.distributions.distributions.AbstractDistribution":
        "panacea_tpu.diffusion.distributions:AbstractDistribution",
    "sgm.modules.distributions.distributions.DiracDistribution":
        "panacea_tpu.diffusion.distributions:DiracDistribution",
    "sgm.modules.distributions.distributions.DiagonalGaussianDistribution":
        "panacea_tpu.diffusion.distributions:DiagonalGaussianDistribution",
    # diffusion math bases (concrete subclasses are registry aliases)
    "sgm.modules.diffusionmodules.discretizer.Discretization":
        "panacea_tpu.diffusion.discretization:Discretization",
    "sgm.modules.diffusionmodules.sampling.BaseDiffusionSampler":
        "panacea_tpu.diffusion.samplers:BaseDiffusionSampler",
    "sgm.modules.diffusionmodules.sampling.SingleStepDiffusionSampler":
        "panacea_tpu.diffusion.samplers:BaseDiffusionSampler",  # hierarchy collapsed
    "sgm.modules.diffusionmodules.sampling.EDMSampler":
        "panacea_tpu.diffusion.samplers:EDMSampler",
    "sgm.modules.diffusionmodules.sampling.AncestralSampler":
        "panacea_tpu.diffusion.samplers:AncestralSampler",
    # VAE internals (models/vae.py, vae_temporal.py)
    "sgm.modules.diffusionmodules.model.Upsample":
        "panacea_tpu.models.vae:Decoder",      # inlined nearest-2x + conv
    "sgm.modules.diffusionmodules.model.Downsample":
        "panacea_tpu.models.vae:Encoder",      # inlined asymmetric-pad conv
    "sgm.modules.diffusionmodules.model.Upsample1D":
        "panacea_tpu.models.vae_temporal:Upsample1D",
    "sgm.modules.diffusionmodules.model.Downsample1D":
        "panacea_tpu.models.vae_temporal:Downsample1D",
    "sgm.modules.diffusionmodules.model.ResnetBlock":
        "panacea_tpu.models.vae:VAEResnetBlock",
    "sgm.modules.diffusionmodules.model.ResnetBlock1D":
        "panacea_tpu.models.vae_temporal:ResnetBlock1D",
    "sgm.modules.diffusionmodules.model.ResnetBlock3D":
        "panacea_tpu.models.vae_temporal:ResnetBlock3D",
    "sgm.modules.diffusionmodules.model.AttnBlock":
        "panacea_tpu.models.vae:VAEAttnBlock",
    "sgm.modules.diffusionmodules.model.MemoryEfficientAttnBlock":
        "panacea_tpu.models.vae:VAEAttnBlock",
    "sgm.modules.diffusionmodules.model.MemoryEfficientAttnBlockTemporal":
        "panacea_tpu.models.vae_temporal:AttnBlockTemporal",
    "sgm.modules.diffusionmodules.model.Encoder":
        "panacea_tpu.models.vae:Encoder",
    "sgm.modules.diffusionmodules.model.Decoder":
        "panacea_tpu.models.vae:Decoder",
    # UNet internals (models/layers.py, unet.py)
    "sgm.modules.diffusionmodules.openaimodel.Upsample":
        "panacea_tpu.models.layers:Upsample",
    "sgm.modules.diffusionmodules.openaimodel.Downsample":
        "panacea_tpu.models.layers:Downsample",
    "sgm.modules.diffusionmodules.openaimodel.ResBlock":
        "panacea_tpu.models.layers:ResBlock3D",  # 2D = zero-init temporal slice
    "sgm.modules.diffusionmodules.openaimodel.ResBlock3D":
        "panacea_tpu.models.layers:ResBlock3D",
    "sgm.modules.diffusionmodules.openaimodel.Timestep":
        "panacea_tpu.diffusion.util:timestep_embedding",
    "sgm.modules.diffusionmodules.openaimodel.AttentionBlock":
        "panacea_tpu.models.legacy_attention:LegacyAttentionBlock3D",  # temporal=False
    "sgm.modules.diffusionmodules.openaimodel.AttentionBlock3D":
        "panacea_tpu.models.legacy_attention:LegacyAttentionBlock3D",
    "sgm.modules.diffusionmodules.openaimodel.QKVAttentionLegacy":
        "panacea_tpu.models.legacy_attention:qkv_attention",  # legacy_order=True
    "sgm.modules.diffusionmodules.openaimodel.QKVAttention":
        "panacea_tpu.models.legacy_attention:qkv_attention",  # legacy_order=False
    # util.py
    "sgm.modules.diffusionmodules.util.GroupNorm32":
        "panacea_tpu.models.layers:GroupNorm",
    # wrappers.py — concat/ControlNet routing lives in the engine
    "sgm.modules.diffusionmodules.wrappers.IdentityWrapper":
        "panacea_tpu.models.engine:DiffusionEngine3D",
    "sgm.modules.diffusionmodules.wrappers.OpenAIWrapper":
        "panacea_tpu.models.engine:DiffusionEngine3D",
    "sgm.modules.diffusionmodules.wrappers.OpenAIWrapperControlLDM3D":
        "panacea_tpu.models.engine:DiffusionEngine3D",
    # LPIPS guts (losses/lpips.py folds ScalingLayer/NetLinLayer into LPIPS)
    "sgm.modules.autoencoding.lpips.loss.lpips.ScalingLayer":
        "panacea_tpu.losses.lpips:LPIPS",
    "sgm.modules.autoencoding.lpips.loss.lpips.NetLinLayer":
        "panacea_tpu.losses.lpips:LPIPS",
    "sgm.modules.autoencoding.lpips.loss.lpips.vgg16":
        "panacea_tpu.losses.lpips:VGG16Features",
    "sgm.modules.autoencoding.regularizers.AbstractRegularizer":
        "panacea_tpu.diffusion.distributions:AbstractRegularizer",
    # encoders extras
    "sgm.modules.encoders.modules.InceptionV3":
        "panacea_tpu.metrics_gen.inception:InceptionV3",
    # autoencoder hierarchy (collapsed into one flax module)
    "sgm.models.autoencoder.AbstractAutoencoder":
        "panacea_tpu.models.vae:AutoencoderKL",
    "sgm.models.autoencoder.AutoencodingEngine":
        "panacea_tpu.models.vae:AutoencoderKL",
    "sgm.models.autoencoder.IdentityFirstStage":
        "panacea_tpu.registry:_Identity",
    # data
    "sgm.data.dataset.WrappedDataset":
        "panacea_tpu.data.loader:DataModuleFromConfig",  # wrap= handling
    "sgm.data.nuscenes_video.render.Renderer":
        "panacea_tpu.data.nuscenes.render_bev:render_camera_views_from_vectors",
}

# dead or torch-runtime-only reference classes, with the reason each one
# does not need a TPU-side counterpart
WAIVERS = {
    "sgm.modules.attention.LinearAttention":
        "dead: only reachable via make_attn(attn_type='linear'), never "
        "selected by any config or module in the snapshot",
    "sgm.modules.attention.BasicTransformerSingleLayerBlock":
        "dead: defined but never instantiated anywhere in the snapshot",
    "sgm.modules.attention.SpatialTransformer":
        "dead: the 2D transformer is never instantiated — every UNet in the "
        "snapshot is UNetModel3D using SpatialTemporalTransformer",
    "sgm.modules.diffusionmodules.model.LinAttnBlock":
        "dead: make_attn('linear') wrapper, never selected",
    "sgm.modules.diffusionmodules.model.MemoryEfficientCrossAttentionWrapper":
        "dead: make_attn('vanilla-xformers' cross) path, never selected",
    "sgm.modules.diffusionmodules.model.Model":
        "dead: legacy pixel-space diffusion UNet, never instantiated "
        "(the latent UNet is openaimodel.UNetModel3D)",
    "sgm.modules.diffusionmodules.openaimodel.TimestepBlock":
        "torch module-dispatch plumbing: flax modules receive emb/context "
        "as explicit arguments (models/unet.py)",
    "sgm.modules.diffusionmodules.openaimodel.TimestepEmbedSequential":
        "torch module-dispatch plumbing: flax modules receive emb/context "
        "as explicit arguments (models/unet.py)",
    "sgm.modules.diffusionmodules.openaimodel.AttentionPool2d":
        "dead: used only by EncoderUNetModel (classifier-guidance encoder), "
        "itself unused",
    "sgm.modules.diffusionmodules.openaimodel.TransposedUpsample":
        "dead: 'learned 2x upsampling without padding', never instantiated",
    "sgm.modules.diffusionmodules.openaimodel.EncoderUNetModel":
        "dead: OpenAI classifier-guidance half-UNet, never instantiated",
    "sgm.modules.diffusionmodules.util.MixedCheckpointFunction":
        "torch autograd recompute plumbing -> jax.checkpoint/nn.remat "
        "(models/unet.py remat policy)",
    "sgm.modules.diffusionmodules.util.CheckpointFunction":
        "torch autograd recompute plumbing -> jax.checkpoint/nn.remat",
    "sgm.modules.diffusionmodules.util.SiLU":
        "torch<1.7 compat shim -> flax.linen.silu",
    "sgm.modules.autoencoding.lpips.util.ActNorm":
        "torch ActNorm for the discriminator init path; the TPU PatchGAN "
        "uses GroupNorm (losses/vae_losses.py NLayerDiscriminator docstring)",
    "sgm.modules.encoders.modules.AbstractEmbModel":
        "embedder base class; the TPU conditioner uses duck-typed embedders "
        "(input_key/ucg_rate/is_trainable attributes, models/conditioner.py)",
    "sgm.data.dataset.Txt2ImgIterableBaseDataset":
        "dead: abstract txt2img iterable base, unused by every panacea "
        "config (the nuScenes dataset is map-style)",
}

# vendored mmdet3d plugin: path-prefix -> repo module that covers the area
PLUGIN_COVERAGE = {
    "mmdet3d_plugin/datasets/pipelines":
        "panacea_tpu.data.nuscenes.augment",
    "mmdet3d_plugin/datasets/data_utils/nuscmap_extractor.py":
        "panacea_tpu.data.nuscenes.map_extractor",
    "mmdet3d_plugin/datasets/data_utils/trajectory_api.py":
        "panacea_tpu.data.nuscenes.trajectory",
    "mmdet3d_plugin/datasets/eval_utils/nuscenes_eval_motion.py":
        "panacea_tpu.perception.motion_metrics",
    "mmdet3d_plugin/datasets/eval_utils/vector_eval.py":
        "panacea_tpu.perception.vector_metrics",
    "mmdet3d_plugin/datasets/eval_utils":
        "panacea_tpu.perception.metrics",
    "mmdet3d_plugin/datasets/samplers":
        "panacea_tpu.data.loader",
    "mmdet3d_plugin/datasets/nuscenes_dataset.py":
        "panacea_tpu.data.nuscenes.dataset",
    "mmdet3d_plugin/losses/traj_loss.py":
        "panacea_tpu.perception.motion_head",
    "mmdet3d_plugin/models/backbones":
        "panacea_tpu.perception.vovnet",
    "mmdet3d_plugin/models/necks":
        "panacea_tpu.perception.fpn",
    "mmdet3d_plugin/models/detectors":
        "panacea_tpu.perception.detector",
    "mmdet3d_plugin/models/dense_heads":
        "panacea_tpu.perception.head",
    "mmdet3d_plugin/models/utils":
        "panacea_tpu.perception.twostage_attn",
    "mmdet3d_plugin/core/bbox":
        "panacea_tpu.perception.coder",
    "mmdet3d_plugin/core/evaluation":
        "panacea_tpu.perception.train",
}


def _classes(root, include_plugin):
    out = []
    for dirpath, _, files in os.walk(root):
        inside_plugin = dirpath.startswith(PLUGIN_DIR)
        if inside_plugin != include_plugin:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(dirpath, f)
            try:
                tree = ast.parse(
                    open(p, encoding="utf-8", errors="replace").read())
            except SyntaxError:
                continue
            for node in tree.body:
                if isinstance(node, ast.ClassDef):
                    out.append((p, node.name))
    return out


def _dotted(path, name):
    rel = os.path.relpath(path, os.path.dirname(REF))
    mod = rel[:-3].replace(os.sep, ".")
    if mod.endswith(".__init__"):
        mod = mod[: -len(".__init__")]
    return f"{mod}.{name}"


def _import_target(target):
    mod, attr = target.split(":")
    return getattr(importlib.import_module(mod), attr)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_core_class_sweep():
    from panacea_tpu.registry import _ALIASES

    found = {_dotted(p, n) for p, n in _classes(REF, include_plugin=False)}
    assert len(found) > 100, "sweep walked too little of the reference"

    unaccounted = []
    for dotted in sorted(found):
        if dotted in _ALIASES:
            continue
        if dotted in EQUIV:
            _import_target(EQUIV[dotted])  # must import
            continue
        if dotted in WAIVERS:
            continue
        unaccounted.append(dotted)
    assert not unaccounted, (
        "reference classes with no registry alias, equivalent, or waiver:\n"
        + "\n".join(unaccounted))

    # symmetric staleness: every bookkeeping entry must still exist upstream
    stale = [k for k in list(EQUIV) + list(WAIVERS) if k not in found]
    assert not stale, f"stale completeness entries: {stale}"
    both = set(EQUIV) & set(WAIVERS)
    assert not both, f"classes both mapped and waived: {both}"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_registry_aliases_resolve():
    """Every alias table entry must import to a real object."""
    from panacea_tpu.registry import _ALIASES, resolve_target

    for ref_path in _ALIASES:
        assert resolve_target(ref_path) is not None, ref_path


@pytest.mark.skipif(not os.path.isdir(PLUGIN_DIR),
                    reason="reference plugin not present")
def test_plugin_class_sweep():
    classes = _classes(REF, include_plugin=True)
    assert len(classes) > 50
    uncovered = []
    hit_prefixes = set()
    for p, name in classes:
        rel = os.path.relpath(p, os.path.join(REF, "data/nuscenes_video",
                                              "projects"))
        for prefix in PLUGIN_COVERAGE:
            if rel.startswith(prefix):
                hit_prefixes.add(prefix)
                break
        else:
            uncovered.append(f"{rel}::{name}")
    assert not uncovered, (
        "vendored plugin classes with no coverage prefix:\n"
        + "\n".join(uncovered))
    # each covering repo module must import
    for prefix in hit_prefixes:
        importlib.import_module(PLUGIN_COVERAGE[prefix])
