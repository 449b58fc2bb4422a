"""Load the reference torch modules from /root/reference for golden parity tests.

The reference sgm package's real ``__init__`` files pull in heavy deps
(pytorch_lightning, open_clip, torchvision via the LPIPS import chain) that are
absent here. We pre-register *stub* package modules whose ``__path__`` points at
the real directories, so only the leaf module files we actually touch are
executed — attention.py, openaimodel.py, controlmodel.py, model.py,
diffusionmodules/util.py, sgm/util.py, sampling*.py, denoiser*.py,
discretizer.py, guiders.py, wrappers.py — none of which need the heavy deps
once ``omegaconf`` and ``xformers`` are stubbed:

  * omegaconf  — only ``ListConfig``/``OmegaConf`` symbols are referenced.
  * xformers   — ``ops.memory_efficient_attention`` is re-expressed with torch
    SDPA so the exact GPU code paths (MemoryEfficient*Attention) run on CPU.

This module must be imported BEFORE any ``import sgm...``.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _stub_omegaconf():
    if "omegaconf" in sys.modules:
        return
    om = types.ModuleType("omegaconf")

    class ListConfig(list):
        pass

    class DictConfig(dict):
        pass

    class OmegaConf:
        @staticmethod
        def to_container(x, resolve=True):
            return x

        @staticmethod
        def create(x=None):
            return x if x is not None else {}

    om.ListConfig = ListConfig
    om.DictConfig = DictConfig
    om.OmegaConf = OmegaConf
    lc = types.ModuleType("omegaconf.listconfig")
    lc.ListConfig = ListConfig
    om.listconfig = lc
    sys.modules["omegaconf"] = om
    sys.modules["omegaconf.listconfig"] = lc


def _stub_xformers():
    if "xformers" in sys.modules:
        return
    import torch

    xf = types.ModuleType("xformers")
    ops = types.ModuleType("xformers.ops")

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
        assert attn_bias is None, "reference never passes a bias"
        return torch.nn.functional.scaled_dot_product_attention(q, k, v)

    ops.memory_efficient_attention = memory_efficient_attention
    xf.ops = ops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = ops


def _stub_torchvision():
    """torchvision is absent in this image; the reference LPIPS only needs
    ``models.vgg16(pretrained=...).features`` — a Sequential with the standard
    VGG16 layer layout (random init; the parity tests randomize anyway)."""
    if "torchvision" in sys.modules:
        return
    import torch.nn as tnn

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")

    def vgg16(pretrained=False, **kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, inc = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(inc, v, 3, padding=1))
                layers.append(tnn.ReLU(inplace=True))
                inc = v
        return types.SimpleNamespace(features=tnn.Sequential(*layers))

    models.vgg16 = vgg16
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models


def load_reference_lpips():
    """Load the reference LPIPS module (lpips/loss/lpips.py) with the
    torchvision stub; returns the module. Callers must no-op
    ``LPIPS.load_from_pretrained`` before instantiating (the real one
    downloads weights)."""
    _stub_torchvision()
    _pkg("sgm", f"{REF_ROOT}/sgm")
    _pkg("sgm.modules", f"{REF_ROOT}/sgm/modules")
    _pkg("sgm.modules.autoencoding", f"{REF_ROOT}/sgm/modules/autoencoding")
    _pkg("sgm.modules.autoencoding.lpips",
         f"{REF_ROOT}/sgm/modules/autoencoding/lpips")
    _pkg("sgm.modules.autoencoding.lpips.loss",
         f"{REF_ROOT}/sgm/modules/autoencoding/lpips/loss")
    return importlib.import_module("sgm.modules.autoencoding.lpips.loss.lpips")


def _pkg(name: str, path: str):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__package__ = name
    sys.modules[name] = m


def load_reference():
    """Returns a namespace dict of the loaded reference modules."""
    _stub_omegaconf()
    _stub_xformers()
    _pkg("sgm", f"{REF_ROOT}/sgm")
    _pkg("sgm.modules", f"{REF_ROOT}/sgm/modules")
    _pkg("sgm.modules.diffusionmodules", f"{REF_ROOT}/sgm/modules/diffusionmodules")
    _pkg("sgm.models", f"{REF_ROOT}/sgm/models")

    mods = {}
    for name in (
        "sgm.util",
        "sgm.modules.attention",
        "sgm.modules.diffusionmodules.util",
        "sgm.modules.diffusionmodules.openaimodel",
        "sgm.modules.diffusionmodules.controlmodel",
        "sgm.modules.diffusionmodules.model",
        "sgm.modules.diffusionmodules.denoiser",
        "sgm.modules.diffusionmodules.denoiser_scaling",
        "sgm.modules.diffusionmodules.denoiser_weighting",
        "sgm.modules.diffusionmodules.discretizer",
        "sgm.modules.diffusionmodules.guiders",
        "sgm.modules.diffusionmodules.sampling_utils",
        "sgm.modules.diffusionmodules.sampling",
        "sgm.modules.diffusionmodules.sigma_sampling",
        "sgm.modules.diffusionmodules.wrappers",
    ):
        mods[name.rsplit(".", 1)[-1]] = importlib.import_module(name)
    return mods


def randomize_(module, seed: int = 0, std: float = 0.2):
    """Fill every parameter (incl. zero-inits) with seeded gaussian noise so
    parity tests exercise all weights."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * std)


def state_dict_numpy(module, prefix: str = ""):
    import numpy as np

    return {
        (f"{prefix}{k}" if not prefix or prefix.endswith(".") else f"{prefix}.{k}"):
            v.detach().cpu().numpy().astype(np.float32)
        for k, v in module.state_dict().items()
    }


def load_reference_eva():
    """Load the reference EVA-02 backbone (metrics/StreamPETR/projects/
    mmdet3d_plugin/models/backbones/{blocks,eva}.py) with fvcore/mmdet
    stubbed; returns the eva module. Instantiate with xattn=False so the
    vanilla attention path (no xformers) runs."""
    import torch.nn as tnn

    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fvn = types.ModuleType("fvcore.nn")
        wi = types.ModuleType("fvcore.nn.weight_init")
        wi.c2_msra_fill = lambda m: None
        fvn.weight_init = wi
        fv.nn = fvn
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.nn"] = fvn
        sys.modules["fvcore.nn.weight_init"] = wi
    if "mmdet" not in sys.modules:
        mm = types.ModuleType("mmdet")
        mmm = types.ModuleType("mmdet.models")
        mb = types.ModuleType("mmdet.models.builder")

        class _Registry:
            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                return deco

        mb.BACKBONES = _Registry()
        mu = types.ModuleType("mmdet.models.utils")
        mt = types.ModuleType("mmdet.models.utils.transformer")

        def inverse_sigmoid(x, eps=1e-5):
            import torch
            x = x.clamp(min=0, max=1)
            return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

        mt.inverse_sigmoid = inverse_sigmoid
        mu.transformer = mt
        mmm.builder = mb
        mmm.utils = mu
        mm.models = mmm
        sys.modules["mmdet"] = mm
        sys.modules["mmdet.models"] = mmm
        sys.modules["mmdet.models.builder"] = mb
        sys.modules["mmdet.models.utils"] = mu
        sys.modules["mmdet.models.utils.transformer"] = mt
    _stub_xformers()
    _pkg("refpetr_backbones",
         f"{REF_ROOT}/metrics/StreamPETR/projects/mmdet3d_plugin/models/backbones")
    return importlib.import_module("refpetr_backbones.eva")
