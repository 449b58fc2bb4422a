"""Torch golden parity for FCOSProposalHead (SimMOD stage 1) THROUGH the
converter, against the ACTUAL reference module
(metrics/.../dense_heads/fcos_proposal_head.py) with mmcv/mmdet stubbed:
ConvModule/Scale rebuilt with real mmcv semantics (conv bias='auto' ->
no bias under GN, GN eps 1e-5, ReLU), everything the forward path doesn't
touch stubbed inert."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import randomize_, state_dict_numpy  # noqa: E402
from test_deformable_parity import _stub  # noqa: E402

REF = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
       "models/dense_heads/fcos_proposal_head.py")


def load_reference_fcos():
    import torch.nn as tnn

    class ConvModule(tnn.Module):
        """mmcv.cnn.ConvModule semantics for conv_cfg=None + GN norm_cfg:
        conv(bias='auto' -> False under norm) -> gn -> relu."""

        def __init__(self, in_ch, out_ch, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, bias="auto", **kw):
            super().__init__()
            with_norm = norm_cfg is not None
            use_bias = (not with_norm) if bias == "auto" else bias
            self.conv = tnn.Conv2d(in_ch, out_ch, k, stride=stride,
                                   padding=padding, bias=use_bias)
            self.with_norm = with_norm
            if with_norm:
                assert norm_cfg["type"] == "GN"
                self.gn = tnn.GroupNorm(norm_cfg.get("num_groups", 32),
                                        out_ch)

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.gn(x)
            return torch.relu(x)

    class Scale(tnn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = tnn.Parameter(torch.tensor(float(scale)))

        def forward(self, x):
            return x * self.scale

    class BaseMono3DDenseHead(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    def multi_apply(func, *args, **kwargs):
        from functools import partial
        pfunc = partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    def inverse_sigmoid(x, eps=1e-5):
        x = x.clamp(min=0, max=1)
        return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

    _stub("mmcv")
    _stub("mmcv.cnn", ConvModule=ConvModule, Scale=Scale,
          bias_init_with_prob=lambda p: float(-np.log((1 - p) / p)),
          normal_init=lambda *a, **k: None)
    _stub("mmcv.runner", force_fp32=lambda **k: (lambda f: f))
    _stub("mmcv.parallel", DataContainer=object)
    _stub("mmdet"); _stub("mmdet.models", HEADS=_Registry())
    _stub("mmdet.models.builder", HEADS=_Registry(),
          build_loss=lambda cfg: tnn.Identity())
    _stub("mmdet.models.utils")
    _stub("mmdet.models.utils.transformer", inverse_sigmoid=inverse_sigmoid)
    _stub("mmdet.core", multi_apply=multi_apply,
          reduce_mean=lambda x: x,
          bbox_xyxy_to_cxcywh=lambda x: x)
    _stub("mmdet3d"); _stub("mmdet3d.models")
    _stub("mmdet3d.models.dense_heads",
          BaseMono3DDenseHead=BaseMono3DDenseHead)
    _stub("mmdet3d.core", box3d_multiclass_nms=None, limit_period=None,
          xywhr2xyxyr=None, CameraInstance3DBoxes=object,
          bbox3d2result=None)
    _stub("mmdet3d.core.bbox"); _stub("mmdet3d.core.bbox.coders",
                                      build_bbox_coder=lambda cfg: None)
    for pkg in ("projects", "projects.mmdet3d_plugin",
                "projects.mmdet3d_plugin.core",
                "projects.mmdet3d_plugin.core.bbox",
                "projects.mmdet3d_plugin.models",
                "projects.mmdet3d_plugin.models.dense_heads",
                "projects.mmdet3d_plugin.models.utils"):
        _stub(pkg)
    _stub("projects.mmdet3d_plugin.core.bbox.util",
          normalize_bbox=lambda *a, **k: None)

    import importlib.util
    misc_path = ("/root/reference/metrics/StreamPETR/projects/"
                 "mmdet3d_plugin/models/utils/misc.py")
    spec = importlib.util.spec_from_file_location(
        "projects.mmdet3d_plugin.models.utils.misc", misc_path)
    misc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(misc)
    sys.modules[spec.name] = misc
    sys.modules["projects.mmdet3d_plugin.models.utils"].misc = misc

    spec = importlib.util.spec_from_file_location(
        "projects.mmdet3d_plugin.models.dense_heads.fcos_proposal_head",
        REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CFG = dict(
    num_classes=10, in_channels=64, feat_channels=64, stacked_convs=2,
    strides=(8, 16), cls_branch=(64, 32), centerness_branch=(32,),
    reg_keys=["offset", "depth", "size", "rot", "velo"],
    reg_branch=((64, 32, 2), (64, 32, 1), (32, 3), (32, 1), (2,)),
    dir_branch=(32,),
)


def test_fcos_proposal_forward_parity():
    import jax.numpy as jnp

    from panacea_tpu.perception.fcos_proposal import FCOSProposalHead
    from panacea_tpu.utils.convert import (
        build_fcos_proposal_mapping,
        convert_state_dict,
        pack_fcos_scales,
    )

    mod = load_reference_fcos()
    ref = mod.FCOSMono3D_ProposalHead(
        reg_weights=(1.0,) * 5, **CFG)
    randomize_(ref, seed=0, std=0.1)
    ref.train()  # train mode computes every reg key + dir_cls

    rs = np.random.RandomState(1)
    feats = [rs.uniform(-1, 1, (1, 2, 64, 8, 8)).astype(np.float32),
             rs.uniform(-1, 1, (1, 2, 64, 4, 4)).astype(np.float32)]
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(f) for f in feats])

    # converter: torch reg_branch carries the output dim as last element;
    # the flax field holds widths only
    widths = tuple(tuple(br[:-1]) for br in CFG["reg_branch"])
    head = FCOSProposalHead(
        num_classes=10, in_channels=64, feat_channels=64, stacked_convs=2,
        strides=(8, 16), cls_branch=(64, 32), centerness_branch=(32,),
        reg_keys=tuple(CFG["reg_keys"]), reg_branch=widths,
        dir_branch=(32,))
    sd = state_dict_numpy(ref, prefix="img_rpn_head")
    mapping = build_fcos_proposal_mapping(
        stacked_convs=2, cls_branch=(64, 32), centerness_branch=(32,),
        reg_keys=tuple(CFG["reg_keys"]), reg_branch=widths,
        dir_branch=(32,), path_prefix=())
    params, missing, unexpected = convert_state_dict(sd, mapping)
    assert not missing, missing
    # only the Scale scalars may be left over — packed separately
    assert all(".scales." in k for k in unexpected), unexpected
    params["scales"] = jnp.asarray(pack_fcos_scales(sd, num_levels=2))

    flax_feats = [jnp.asarray(f.reshape(-1, *f.shape[2:]).transpose(
        0, 2, 3, 1)) for f in feats]
    outs = head.apply({"params": params}, flax_feats)

    for li in range(2):
        for key in ("cls_feat", "reg_feat", "cls_score", "centerness",
                    "offset", "depth", "size", "rot", "velo", "dir_cls"):
            want = out_ref[li][key].detach().numpy().transpose(0, 2, 3, 1)
            got = np.asarray(outs[li][key], np.float32)
            np.testing.assert_allclose(
                got, want, atol=2e-4,
                err_msg=f"level {li} key {key}")
