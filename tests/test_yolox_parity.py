"""Torch golden parity for YOLOXHead THROUGH the converter, against the
ACTUAL reference YOLOXHeadCustom (metrics/.../dense_heads/yolox_head.py)
with mmcv/mmdet stubbed: ConvModule rebuilt with real mmcv semantics
(conv bias='auto' -> no bias under BN, BN eps 1e-3 momentum 0.03, Swish),
eval-mode BN running stats mapped onto FrozenBatchNorm."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import randomize_, state_dict_numpy  # noqa: E402
from test_deformable_parity import _stub  # noqa: E402

REF = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
       "models/dense_heads/yolox_head.py")


def load_reference_yolox():
    import torch.nn as tnn

    class ConvModule(tnn.Module):
        """mmcv ConvModule for conv_cfg=None + BN norm_cfg + Swish act."""

        def __init__(self, in_ch, out_ch, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, act_cfg=None,
                     bias="auto", **kw):
            super().__init__()
            with_norm = norm_cfg is not None
            use_bias = (not with_norm) if bias == "auto" else bias
            self.conv = tnn.Conv2d(in_ch, out_ch, k, stride=stride,
                                   padding=padding, bias=use_bias)
            self.with_norm = with_norm
            if with_norm:
                assert norm_cfg["type"] == "BN"
                self.bn = tnn.BatchNorm2d(
                    out_ch, eps=norm_cfg.get("eps", 1e-5),
                    momentum=norm_cfg.get("momentum", 0.1))
            assert act_cfg is None or act_cfg["type"] == "Swish"
            self.act = tnn.SiLU()

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.bn(x)
            return self.act(x)

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    def multi_apply(func, *args, **kwargs):
        from functools import partial
        pfunc = partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    class BaseDenseHead(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class BBoxTestMixin:
        pass

    _stub("mmcv")
    _stub("mmcv.cnn", ConvModule=ConvModule,
          DepthwiseSeparableConvModule=ConvModule,
          bias_init_with_prob=lambda p: float(-np.log((1 - p) / p)))
    _stub("mmcv.ops"); _stub("mmcv.ops.nms", batched_nms=None)
    _stub("mmcv.runner", force_fp32=lambda **k: (lambda f: f))
    _stub("mmdet"); _stub("mmdet.models")
    _stub("mmdet.models.builder", HEADS=_Registry(),
          build_loss=lambda cfg: tnn.Identity())
    _stub("mmdet.models.dense_heads")
    _stub("mmdet.models.dense_heads.base_dense_head",
          BaseDenseHead=BaseDenseHead)
    _stub("mmdet.models.dense_heads.dense_test_mixins",
          BBoxTestMixin=BBoxTestMixin)
    _stub("mmdet.core", multi_apply=multi_apply, reduce_mean=lambda x: x,
          MlvlPointGenerator=lambda *a, **k: None,
          bbox_xyxy_to_cxcywh=lambda x: x,
          build_assigner=lambda cfg: None, build_sampler=lambda cfg: None)

    import importlib.util
    spec = importlib.util.spec_from_file_location("ref_yolox_head", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_yolox_head_forward_parity():
    import jax.numpy as jnp

    from panacea_tpu.perception.yolox_head import YOLOXHead
    from panacea_tpu.utils.convert import (
        build_yolox_head_mapping,
        convert_state_dict,
    )

    mod = load_reference_yolox()
    ref = mod.YOLOXHeadCustom(
        num_classes=10, in_channels=64, feat_channels=64, stacked_convs=2,
        strides=[8, 16], train_cfg=None, test_cfg=None)
    randomize_(ref, seed=0, std=0.1)
    # give BN real (positive) running stats so the eps term matters
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) * 0.05
                    + 1e-3)
    ref.eval()

    rs = np.random.RandomState(2)
    feats = [rs.uniform(-1, 1, (1, 2, 64, 8, 8)).astype(np.float32),
             rs.uniform(-1, 1, (1, 2, 64, 4, 4)).astype(np.float32)]
    with torch.no_grad():
        out_ref = ref(None, [torch.from_numpy(f) for f in feats])

    head = YOLOXHead(num_classes=10, in_channels=64, feat_channels=64,
                     stacked_convs=2, strides=(8, 16))
    sd = state_dict_numpy(ref, prefix="img_roi_head")
    mapping = build_yolox_head_mapping(num_levels=2, stacked_convs=2,
                                       path_prefix=())
    params, missing, unexpected = convert_state_dict(sd, mapping)
    assert not missing, missing
    assert all("num_batches_tracked" in k for k in unexpected), unexpected

    flax_feats = [jnp.asarray(f.reshape(-1, *f.shape[2:]).transpose(
        0, 2, 3, 1)) for f in feats]
    outs = head.apply({"params": params}, flax_feats)

    def flat_ref(levels, c):
        # (M, C, H, W) per level -> (M, P, C) in the flax head's H-major
        # concatenation order
        return np.concatenate(
            [lv.detach().numpy().transpose(0, 2, 3, 1).reshape(
                lv.shape[0], -1, c) for lv in levels], axis=1)

    np.testing.assert_allclose(
        np.asarray(outs["enc_cls_scores"], np.float32),
        flat_ref(out_ref["enc_cls_scores"], 10), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(outs["enc_bbox_preds"], np.float32),
        flat_ref(out_ref["enc_bbox_preds"], 4), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(outs["objectnesses"], np.float32),
        flat_ref(out_ref["objectnesses"], 1)[..., 0], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(outs["pred_centers2d_offset"], np.float32),
        flat_ref(out_ref["pred_centers2d_offset"], 2), atol=2e-4)
