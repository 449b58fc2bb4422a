"""Config-driven component registry.

The reference framework instantiates every component from YAML blocks of the form
``{target: <dotted.path>, params: {...}}`` (reference: sgm/util.py:168-184). We keep
that public config surface so the reference's ``configs/inference_nuscenes.yaml``
maps 1:1, but resolve targets through an alias table so ``sgm.*`` dotted paths load
the TPU-native equivalents in ``panacea_tpu.*``.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Mapping

# Maps reference dotted paths (and convenient short names) to panacea_tpu dotted paths.
_ALIASES: Dict[str, str] = {}

# Optional direct object registry (name -> class/callable), takes priority.
_REGISTRY: Dict[str, Any] = {}


def register(name: str, obj: Any = None) -> Callable[[Any], Any]:
    """Register ``obj`` under ``name``; usable as decorator ``@register("Foo")``."""
    if obj is not None:
        _REGISTRY[name] = obj
        return obj

    def deco(o: Any) -> Any:
        _REGISTRY[name] = o
        return o

    return deco


def add_alias(reference_target: str, local_target: str) -> None:
    _ALIASES[reference_target] = local_target


# --- alias table: reference sgm targets -> panacea_tpu equivalents -------------
# (reference config surface: configs/inference_nuscenes.yaml)
_SGM_TO_LOCAL = {
    "sgm.models.diffusion.DiffusionEngine3D": "panacea_tpu.models.engine.DiffusionEngine3D",
    "sgm.modules.diffusionmodules.denoiser.Denoiser": "panacea_tpu.diffusion.denoiser.Denoiser",
    "sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser": "panacea_tpu.diffusion.denoiser.DiscreteDenoiser",
    "sgm.modules.diffusionmodules.denoiser_weighting.UnitWeighting": "panacea_tpu.diffusion.weighting.UnitWeighting",
    "sgm.modules.diffusionmodules.denoiser_weighting.EDMWeighting": "panacea_tpu.diffusion.weighting.EDMWeighting",
    "sgm.modules.diffusionmodules.denoiser_weighting.VWeighting": "panacea_tpu.diffusion.weighting.VWeighting",
    "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting": "panacea_tpu.diffusion.weighting.EpsWeighting",
    "sgm.modules.diffusionmodules.denoiser_scaling.EDMScaling": "panacea_tpu.diffusion.scaling.EDMScaling",
    "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling": "panacea_tpu.diffusion.scaling.EpsScaling",
    "sgm.modules.diffusionmodules.denoiser_scaling.VScaling": "panacea_tpu.diffusion.scaling.VScaling",
    "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization": "panacea_tpu.diffusion.discretization.LegacyDDPMDiscretization",
    "sgm.modules.diffusionmodules.discretizer.EDMDiscretization": "panacea_tpu.diffusion.discretization.EDMDiscretization",
    "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling": "panacea_tpu.diffusion.sigma_sampling.EDMSampling",
    "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling": "panacea_tpu.diffusion.sigma_sampling.DiscreteSampling",
    "sgm.modules.diffusionmodules.guiders.VanillaCFG": "panacea_tpu.diffusion.guiders.VanillaCFG",
    "sgm.modules.diffusionmodules.guiders.IdentityGuider": "panacea_tpu.diffusion.guiders.IdentityGuider",
    "sgm.modules.diffusionmodules.sampling_utils.NoDynamicThresholding": "panacea_tpu.diffusion.guiders.NoDynamicThresholding",
    "sgm.modules.diffusionmodules.sampling.EulerEDMSampler": "panacea_tpu.diffusion.samplers.EulerEDMSampler",
    "sgm.modules.diffusionmodules.sampling.HeunEDMSampler": "panacea_tpu.diffusion.samplers.HeunEDMSampler",
    "sgm.modules.diffusionmodules.sampling.EulerAncestralSampler": "panacea_tpu.diffusion.samplers.EulerAncestralSampler",
    "sgm.modules.diffusionmodules.sampling.DPMPP2SAncestralSampler": "panacea_tpu.diffusion.samplers.DPMPP2SAncestralSampler",
    "sgm.modules.diffusionmodules.sampling.DPMPP2MSampler": "panacea_tpu.diffusion.samplers.DPMPP2MSampler",
    "sgm.modules.diffusionmodules.sampling.LinearMultistepSampler": "panacea_tpu.diffusion.samplers.LinearMultistepSampler",
    "sgm.modules.diffusionmodules.loss.StandardDiffusionLoss": "panacea_tpu.diffusion.loss.StandardDiffusionLoss",
    "sgm.modules.diffusionmodules.controlmodel.ControlledUNetModel3D": "panacea_tpu.models.controlnet.ControlledUNetModel3D",
    "sgm.modules.diffusionmodules.controlmodel.ControlNet3D": "panacea_tpu.models.controlnet.ControlNet3D",
    "sgm.modules.diffusionmodules.openaimodel.UNetModel3D": "panacea_tpu.models.unet.UNetModel3D",
    "sgm.modules.GeneralConditioner": "panacea_tpu.models.conditioner.GeneralConditioner",
    "sgm.modules.encoders.modules.GeneralConditioner": "panacea_tpu.models.conditioner.GeneralConditioner",
    "sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder": "panacea_tpu.models.clip.FrozenOpenCLIPEmbedder",
    "sgm.modules.encoders.modules.FrozenCLIPEmbedder": "panacea_tpu.models.clip.FrozenCLIPEmbedder",
    "sgm.modules.encoders.modules.FrozenT5Embedder": "panacea_tpu.models.conditioner.FrozenT5Embedder",
    "sgm.modules.encoders.modules.ConcatTimestepEmbedderND": "panacea_tpu.models.conditioner.ConcatTimestepEmbedderND",
    "sgm.modules.encoders.modules.ClassEmbedder": "panacea_tpu.models.conditioner.ClassEmbedder",
    "sgm.modules.encoders.modules.FrozenOpenCLIPImageEmbedder": "panacea_tpu.models.clip.FrozenOpenCLIPImageEmbedder",
    "sgm.modules.encoders.modules.DownSampler": "panacea_tpu.models.conditioner.DownSampler",
    "sgm.modules.encoders.modules.IdentityEncoder": "panacea_tpu.models.conditioner.IdentityEncoder",
    "sgm.modules.encoders.modules.VAEEmbedder": "panacea_tpu.models.conditioner.VAEEmbedder",
    "sgm.modules.encoders.modules.FrozenByT5Embedder": "panacea_tpu.models.conditioner.FrozenByT5Embedder",
    "sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder2": "panacea_tpu.models.conditioner.FrozenOpenCLIPEmbedder2",
    "sgm.modules.encoders.modules.ClassEmbedderForMultiCond": "panacea_tpu.models.conditioner.ClassEmbedderForMultiCond",
    "sgm.modules.encoders.modules.FrozenCLIPT5Encoder": "panacea_tpu.models.conditioner.FrozenCLIPT5Encoder",
    "sgm.modules.encoders.modules.SpatialRescaler": "panacea_tpu.models.conditioner.SpatialRescaler",
    "sgm.modules.encoders.modules.LowScaleEncoder": "panacea_tpu.models.conditioner.LowScaleEncoder",
    "sgm.modules.encoders.modules.GaussianEncoder": "panacea_tpu.models.conditioner.GaussianEncoder",
    "sgm.models.autoencoder.AutoencoderKL": "panacea_tpu.models.vae.AutoencoderKL",
    "sgm.models.autoencoder.AutoencoderKLInferenceWrapper": "panacea_tpu.models.vae.AutoencoderKLInferenceWrapper",
    "sgm.lr_scheduler.LambdaLinearScheduler": "panacea_tpu.utils.lr_schedule.LambdaLinearScheduler",
    "sgm.lr_scheduler.LambdaWarmUpCosineScheduler": "panacea_tpu.utils.lr_schedule.LambdaWarmUpCosineScheduler",
    "sgm.lr_scheduler.LambdaWarmUpCosineScheduler2": "panacea_tpu.utils.lr_schedule.LambdaWarmUpCosineScheduler2",
    "sgm.modules.distributions.distributions.DiagonalGaussianDistribution":
        "panacea_tpu.diffusion.distributions.DiagonalGaussianDistribution",
    "sgm.modules.distributions.distributions.DiracDistribution":
        "panacea_tpu.diffusion.distributions.DiracDistribution",
    "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer":
        "panacea_tpu.diffusion.distributions.DiagonalGaussianRegularizer",
    "sgm.modules.autoencoding.losses.LatentLPIPS":
        "panacea_tpu.losses.vae_losses.LatentLPIPS",
    "sgm.modules.autoencoding.losses.GeneralLPIPSWithDiscriminator":
        "panacea_tpu.losses.vae_losses.GeneralLPIPSWithDiscriminator",
    "sgm.modules.autoencoding.lpips.loss.lpips.LPIPS":
        "panacea_tpu.losses.lpips.LPIPS",
    "sgm.modules.autoencoding.lpips.model.model.NLayerDiscriminator":
        "panacea_tpu.losses.vae_losses.NLayerDiscriminator",
    "torch.nn.Identity": "panacea_tpu.registry._Identity",
    "torch.optim.AdamW": "panacea_tpu.utils.optim.AdamW",
    "sgm.data.dataset.DataModuleFromConfig":
        "panacea_tpu.data.loader.DataModuleFromConfig",
    "sgm.data.nuscenes_video.nuscenes_datasets_video.MyDataset":
        "panacea_tpu.data.nuscenes.dataset.NuScenesVideoDataset",
}
_ALIASES.update(_SGM_TO_LOCAL)


class _Identity:
    """Placeholder for torch.nn.Identity appearing in reference VAE lossconfig."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x, *args, **kwargs):
        return x


def resolve_target(target: str) -> Any:
    """Resolve a dotted path (possibly a reference ``sgm.*`` path) to an object."""
    if target in _REGISTRY:
        return _REGISTRY[target]
    target = _ALIASES.get(target, target)
    module_path, _, name = target.rpartition(".")
    if not module_path:
        raise ImportError(f"cannot resolve bare target name {target!r}")
    module = importlib.import_module(module_path)
    return getattr(module, name)


def instantiate_from_config(config: Mapping[str, Any]) -> Any:
    """Instantiate ``config['target']`` with ``config.get('params', {})``.

    Mirrors the reference factory (sgm/util.py:168-174) including the
    ``__is_first_stage__`` / ``__is_unconditional__`` sentinels.
    """
    if not isinstance(config, Mapping) or "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError(f"Expected key `target` to instantiate, got: {config!r}")
    cls = resolve_target(config["target"])
    params = dict(config.get("params", {}) or {})
    return cls(**params)
