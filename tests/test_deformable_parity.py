"""Torch-golden parity for the deformable multi-cam aggregation — the
geometric heart of the eval-recipe SparseHead.

Loads the REFERENCE DeformableFeatureAggregationCuda
(metrics/.../models/utils/detr3d_transformer.py:526-613) with mmcv/mmdet
stubbed and `MultiScaleDeformableAttnFunction` replaced by the standard
pytorch fallback (grid_sample formulation — the documented spec of the
CUDA op), randomizes its weights, converts them into this framework's
DeformableFeatureAggregation, and asserts the outputs match. This pins
down, against the actual reference code: the joint softmax over
cams x levels x points, the learnable key-point offsets, the cam_embed
MLN-free path, the projection/normalization convention, and the residual.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _msda_pytorch(value, value_spatial_shapes, level_start_index,
                  sampling_locations, attention_weights, im2col_step):
    """mmcv multi_scale_deformable_attn_pytorch (the CUDA op's reference
    math): value (bs, num_keys, heads, dim); locations in [0, 1]."""
    bs, _, num_heads, embed_dims = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split(
        [int(h * w) for h, w in value_spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for level, (h, w) in enumerate(value_spatial_shapes):
        v = (value_list[level].flatten(2).transpose(1, 2)
             .reshape(bs * num_heads, embed_dims, int(h), int(w)))
        grid = (sampling_grids[:, :, :, level].transpose(1, 2)
                .flatten(0, 1))
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampling_value_list.append(sampled)
    attn = (attention_weights.transpose(1, 2)
            .reshape(bs * num_heads, 1, num_queries,
                     num_levels * num_points))
    out = ((torch.stack(sampling_value_list, dim=-2).flatten(-2) * attn)
           .sum(-1).view(bs, num_heads * embed_dims, num_queries))
    return out.transpose(1, 2).contiguous()


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_detr3d():
    import torch.nn as tnn

    class BaseModule(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    class MSDAF:
        @staticmethod
        def apply(value, spatial, start_idx, locs, weights, step):
            return _msda_pytorch(value, spatial, start_idx, locs, weights,
                                 step)

    def _noinit(*a, **k):
        return None

    _stub("mmcv")
    _stub("mmcv.cnn", xavier_init=_noinit, constant_init=_noinit,
          build_norm_layer=lambda cfg, dims: (None, tnn.LayerNorm(dims)),
          Linear=tnn.Linear, bias_init_with_prob=lambda p: 0.0,
          Scale=tnn.Identity)
    _stub("mmcv.cnn.bricks")
    _stub("mmcv.cnn.bricks.transformer",
          BaseTransformerLayer=BaseModule,
          TransformerLayerSequence=BaseModule,
          build_transformer_layer_sequence=_noinit,
          build_attention=_noinit, build_feedforward_network=_noinit)
    _stub("mmcv.cnn.bricks.registry", ATTENTION=_Registry(),
          TRANSFORMER_LAYER=_Registry(), TRANSFORMER_LAYER_SEQUENCE=_Registry())
    _stub("mmcv.ops")
    _stub("mmcv.ops.multi_scale_deform_attn",
          MultiScaleDeformableAttnFunction=MSDAF)
    _stub("mmcv.runner", BaseModule=BaseModule,
          force_fp32=lambda **k: (lambda f: f))
    _stub("mmcv.runner.base_module", BaseModule=BaseModule)
    _stub("mmcv.utils",
          deprecated_api_warning=lambda *a, **k: (lambda f: f),
          ConfigDict=dict)
    mmdet_mu = _stub("mmdet.models.utils", builder=None)
    _stub("mmdet.models.utils.builder", TRANSFORMER=_Registry())
    mmdet_mu.builder = sys.modules["mmdet.models.utils.builder"]

    def inverse_sigmoid(x, eps=1e-5):
        x = x.clamp(min=0, max=1)
        return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

    _stub("mmdet.models.utils.transformer", inverse_sigmoid=inverse_sigmoid)
    _stub("mmdet"); _stub("mmdet.models")

    # the plugin's own positional_encoding, under its package path
    import importlib.util
    ref = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
           "models/utils")
    for pkg in ("projects", "projects.mmdet3d_plugin",
                "projects.mmdet3d_plugin.models",
                "projects.mmdet3d_plugin.models.utils"):
        _stub(pkg)
    spec = importlib.util.spec_from_file_location(
        "projects.mmdet3d_plugin.models.utils.positional_encoding",
        f"{ref}/positional_encoding.py")
    pe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pe)
    sys.modules[spec.name] = pe
    sys.modules["projects.mmdet3d_plugin.models.utils"].positional_encoding \
        = pe

    spec = importlib.util.spec_from_file_location(
        "ref_detr3d", f"{ref}/detr3d_transformer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_deformable_aggregation_matches_reference():
    from panacea_tpu.perception.deformable import (
        DeformableFeatureAggregation,
    )

    ref_mod = load_reference_detr3d()
    b, n, q, c, g, p = 1, 2, 4, 32, 4, 3
    levels = [(8, 16), (4, 8)]
    ref = ref_mod.DeformableFeatureAggregationCuda(
        embed_dims=c, num_groups=g, num_levels=len(levels), num_cams=n,
        dropout=0.0, num_pts=p)
    torch.manual_seed(0)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.1

    rs = np.random.RandomState(1)
    inst = rs.randn(b, q, c).astype(np.float32)
    qpos = rs.randn(b, q, c).astype(np.float32)
    ref_pts01 = rs.uniform(0.2, 0.8, (b, q, 3)).astype(np.float32)
    feats = [rs.randn(b, n, h, w, c).astype(np.float32) for h, w in levels]
    pad_h, pad_w = 64, 128
    # camera: lidar x-forward -> z-forward pinhole
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 50, 64, 50, 32
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.stack([K @ R, K @ R])[None]  # (1, N, 4, 4)

    # ---- reference forward
    feat_flat = torch.cat(
        [torch.from_numpy(f).permute(0, 1, 4, 2, 3).flatten(0, 1)
         .flatten(2).transpose(1, 2) for f in feats], dim=1)
    spatial = torch.tensor([[h, w] for h, w in levels], dtype=torch.long)
    start = torch.tensor([0, levels[0][0] * levels[0][1]], dtype=torch.long)
    img_metas = [{"pad_shape": [(pad_h, pad_w, 3)]}]
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(inst), torch.from_numpy(qpos), feat_flat,
            torch.from_numpy(ref_pts01), spatial, start,
            torch.tensor(PC), torch.from_numpy(l2i), img_metas).numpy()

    # ---- ours, with converted weights
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(wk):
        return {"kernel": sd[f"{wk}.weight"].T, "bias": sd[f"{wk}.bias"]}

    params = {
        "weights_fc": lin("weights_fc"),
        "output_proj": lin("output_proj"),
        "learnable_fc": lin("learnable_fc"),
        "cam_embed_fc1": lin("cam_embed.0"),
        "cam_embed_fc2": lin("cam_embed.2"),
        "cam_embed_ln": {"scale": sd["cam_embed.4.weight"],
                         "bias": sd["cam_embed.4.bias"]},
    }
    ours = DeformableFeatureAggregation(
        embed_dims=c, num_groups=g, num_levels=len(levels), num_cams=n,
        num_pts=p)
    pc = np.asarray(PC)
    ref_lidar = ref_pts01 * (pc[3:6] - pc[0:3]) + pc[0:3]
    # torch bias transfers VERBATIM: the uniform(-bias, bias) init lives in
    # the initializer, not as an output shift (the old shift workaround here
    # papered over a converter bug — see deformable.py learnable_fc)
    out = ours.apply(
        {"params": params}, jnp.asarray(inst), jnp.asarray(qpos),
        [jnp.asarray(f) for f in feats], jnp.asarray(ref_lidar),
        jnp.asarray(l2i), (pad_h, pad_w))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)


def load_reference_misc():
    """misc.py + positional_encoding.py with minimal stubs."""
    load_reference_detr3d()  # installs the mm* stubs + package aliases
    import importlib.util

    _stub("mmdet.core", bbox_xyxy_to_cxcywh=lambda x: x)
    ref = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
           "models/utils")
    spec = importlib.util.spec_from_file_location("ref_misc",
                                                  f"{ref}/misc.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pe = sys.modules[
        "projects.mmdet3d_plugin.models.utils.positional_encoding"]
    return mod, pe


def test_positional_encodings_match_reference():
    from panacea_tpu.perception.encoding import (
        nerf_positional_encoding,
        pos2posemb1d,
        pos2posemb3d,
    )

    _, pe = load_reference_misc()
    rs = np.random.RandomState(0)
    p3 = rs.uniform(0, 1, (2, 5, 3)).astype(np.float32)
    want = pe.pos2posemb3d(torch.from_numpy(p3)).numpy()
    got = np.asarray(pos2posemb3d(jnp.asarray(p3)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    p1 = rs.uniform(0, 1, (2, 5, 1)).astype(np.float32)
    want = pe.pos2posemb1d(torch.from_numpy(p1)).numpy()
    got = np.asarray(pos2posemb1d(jnp.asarray(p1)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    x = rs.uniform(-1, 1, (2, 5, 15)).astype(np.float32)
    want = pe.nerf_positional_encoding(torch.from_numpy(x)).numpy()
    got = np.asarray(nerf_positional_encoding(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mln_and_selayer_match_reference():
    from panacea_tpu.perception.encoding import MLN
    from panacea_tpu.perception.petr_head import SELayerLinear

    misc, _ = load_reference_misc()
    rs = np.random.RandomState(2)
    c, cdim = 16, 10

    ref = misc.MLN(cdim, f_dim=c)
    torch.manual_seed(0)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.2
    x = rs.randn(2, 5, c).astype(np.float32)
    cvec = rs.randn(2, 5, cdim).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(cvec)).numpy()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {
        "reduce": {"kernel": sd["reduce.0.weight"].T,
                   "bias": sd["reduce.0.bias"]},
        "gamma": {"kernel": sd["gamma.weight"].T, "bias": sd["gamma.bias"]},
        "beta": {"kernel": sd["beta.weight"].T, "bias": sd["beta.bias"]},
    }
    ours = MLN(f_dim=c)
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(cvec))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    ref_se = misc.SELayer_Linear(c)
    for prm in ref_se.parameters():
        prm.data = torch.randn_like(prm) * 0.2
    xs = rs.randn(2, 5, c).astype(np.float32)
    se_in = rs.randn(2, 5, c).astype(np.float32)
    with torch.no_grad():
        want = ref_se(torch.from_numpy(xs), torch.from_numpy(se_in)).numpy()
    sd = {k: v.numpy() for k, v in ref_se.state_dict().items()}
    params = {
        "conv_reduce": {"kernel": sd["conv_reduce.weight"].T,
                        "bias": sd["conv_reduce.bias"]},
        "conv_expand": {"kernel": sd["conv_expand.weight"].T,
                        "bias": sd["conv_expand.bias"]},
    }
    got = SELayerLinear(channels=c).apply({"params": params}, jnp.asarray(xs),
                           jnp.asarray(se_in))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def load_reference_focal_head():
    import importlib.util

    import torch.nn as tnn

    load_reference_detr3d()

    class AnchorFreeHead(tnn.Module):
        def __init__(self, num_classes, in_channels, init_cfg=None):
            super().__init__()

    def _cxcywh_to_xyxy(b):
        cx, cy, w_, h_ = b.unbind(-1)
        return torch.stack([cx - w_ / 2, cy - h_ / 2,
                            cx + w_ / 2, cy + h_ / 2], dim=-1)

    _stub("mmdet.core", bbox_xyxy_to_cxcywh=_bbox_xyxy_to_cxcywh,
          bbox_cxcywh_to_xyxy=_cxcywh_to_xyxy, build_assigner=None,
          build_sampler=None, multi_apply=None, reduce_mean=None,
          bbox_overlaps=None)
    _stub("mmdet.models", HEADS=sys.modules[
        "mmcv.cnn.bricks.registry"].ATTENTION, build_loss=lambda cfg: None)
    _stub("mmdet.models.dense_heads")
    _stub("mmdet.models.dense_heads.anchor_free_head",
          AnchorFreeHead=AnchorFreeHead)
    _stub("mmdet3d"); _stub("mmdet3d.models")
    _stub("mmdet3d.models.utils", clip_sigmoid=lambda x: x.sigmoid().clamp(
        min=1e-4, max=1 - 1e-4))
    ref = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
           "models")
    # misc under its package alias (focal_head imports from it)
    spec = importlib.util.spec_from_file_location(
        "projects.mmdet3d_plugin.models.utils.misc",
        f"{ref}/utils/misc.py")
    misc = importlib.util.module_from_spec(spec)
    import mmdet.core as mc
    mc.bbox_xyxy_to_cxcywh = _bbox_xyxy_to_cxcywh
    spec.loader.exec_module(misc)
    sys.modules[spec.name] = misc
    sys.modules["projects.mmdet3d_plugin.models.utils"].misc = misc

    spec = importlib.util.spec_from_file_location(
        "ref_focal_head", f"{ref}/dense_heads/focal_head.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, misc


def _bbox_xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b.unbind(-1)
    return torch.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], dim=-1)


def test_focal_head_matches_reference():
    """FocalPETR salient-token head: towers, ltrb/center decode, and the
    topk_indexes selection vs the actual reference FocalHead
    (dense_heads/focal_head.py:30-180), through the converter mapping."""
    import flax

    from panacea_tpu.perception.focal_head import FocalHead
    from panacea_tpu.utils.convert import (
        build_focal_head_mapping,
        convert_state_dict,
    )

    mod, misc = load_reference_focal_head()
    b, n, c, h, w = 1, 2, 32, 8, 16
    ref = mod.FocalHead(num_classes=10, in_channels=c, embed_dims=c,
                        stride=16, infer_ratio=0.5, train_cfg=None)
    ref.eval()
    torch.manual_seed(0)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.2

    rs = np.random.RandomState(3)
    feats = rs.randn(b, n, c, h, w).astype(np.float32)
    loc = misc.locations(torch.zeros(1, c, h, w), 16, h * 16, w * 16)[None]
    with torch.no_grad():
        out_ref = ref(loc, img_feats=torch.from_numpy(feats))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params2, missing, unexpected = convert_state_dict(
        {f"img_roi_head.{k}": v for k, v in sd.items()},
        build_focal_head_mapping(path_prefix=()))
    assert not missing and not unexpected, (missing, unexpected)

    ours = FocalHead(num_classes=10, embed_dims=c, infer_ratio=0.5)
    out = ours.apply({"params": params2},
                     jnp.asarray(feats.transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(
        np.asarray(out["enc_cls_scores"]),
        out_ref["enc_cls_scores"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["enc_bbox_preds"]),
        out_ref["enc_bbox_preds"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["pred_centers2d"]),
        out_ref["pred_centers2d"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["centerness"]),
        out_ref["centerness"].numpy(), atol=2e-4)
    # same top-k token selection (order-insensitive set compare)
    got_idx = set(np.asarray(out["topk_indexes"]).reshape(-1).tolist())
    want_idx = set(out_ref["topk_indexes"].numpy().reshape(-1).tolist())
    assert got_idx == want_idx


def test_mlnv2_matches_reference():
    """SparseHead's spatial alignment is MLNv2 — NO LayerNorm
    (detr3d_transformer.py:24-56); using the LN-modulating MLN there was a
    silent divergence (caught here)."""
    from panacea_tpu.perception.encoding import MLNv2

    ref_mod = load_reference_detr3d()
    c, cdim = 16, 14
    ref = ref_mod.MLNv2(cdim, f_dim=c)
    torch.manual_seed(3)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.2
    rs = np.random.RandomState(5)
    x = rs.randn(2, 7, c).astype(np.float32)
    cvec = rs.randn(2, 7, cdim).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(cvec)).numpy()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {
        "reduce": {"kernel": sd["reduce.0.weight"].T,
                   "bias": sd["reduce.0.bias"]},
        "gamma": {"kernel": sd["gamma.weight"].T, "bias": sd["gamma.bias"]},
        "beta": {"kernel": sd["beta.weight"].T, "bias": sd["beta.bias"]},
    }
    got = MLNv2(f_dim=c).apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(cvec))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # and the heads wire the right variant
    from panacea_tpu.perception.head import SparseHead
    import inspect

    src = inspect.getsource(SparseHead.setup)
    assert "MLNv2(f_dim=c, name=\"spatial_alignment\")" in src


def test_vovnet_backbone_matches_reference():
    """VoVNetV2 backbone torch parity (models/backbones/vovnet.py) through
    build_vovnet_mapping, at a tiny V2-19-slim-ish spec."""
    import importlib.util

    import torch.nn as tnn

    from panacea_tpu.perception.vovnet import VoVNet
    from panacea_tpu.utils.convert import (
        build_vovnet_mapping,
        convert_state_dict,
    )

    load_reference_detr3d()
    _stub("mmdet.models.builder", BACKBONES=sys.modules[
        "mmcv.cnn.bricks.registry"].ATTENTION)
    ref_dir = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
               "models/backbones")
    spec = importlib.util.spec_from_file_location("ref_vovnet",
                                                  f"{ref_dir}/vovnet.py")
    vv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vv)

    # smallest published spec so CPU parity is fast
    spec_name = "V-19-slim-eSE"
    stage_specs = vv._STAGE_SPECS[spec_name]
    ref = vv.VoVNet(spec_name, out_features=["stage2", "stage3", "stage4",
                                             "stage5"])
    ref.eval()
    torch.manual_seed(2)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.05
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.6, 1.4)

    rs = np.random.RandomState(9)
    x = rs.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    sd = {f"img_backbone.{k}": v.numpy() for k, v in ref.state_dict().items()}
    mapping = build_vovnet_mapping(
        path_prefix=(),
        num_blocks=tuple(stage_specs["block_per_stage"]),
        num_layers=stage_specs["layer_per_block"])
    params, missing, unexpected = convert_state_dict(sd, mapping)
    unexpected = [k for k in unexpected if "num_batches_tracked" not in k]
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    ours = VoVNet(stage_ch=tuple(stage_specs["stage_conv_ch"]),
                  concat_ch=tuple(stage_specs["stage_out_ch"]),
                  num_blocks=tuple(stage_specs["block_per_stage"]),
                  num_layers=stage_specs["layer_per_block"])
    outs = ours.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    for oi, key in enumerate(["stage2", "stage3", "stage4", "stage5"]):
        np.testing.assert_allclose(
            np.asarray(outs[oi]).transpose(0, 3, 1, 2),
            want[key].numpy(), atol=3e-4)


def _torch_resnet50():
    """Minimal torch ResNet-50 with torchvision/mmdet-compatible naming
    (conv1/bn1, layerX.Y.{conv,bn}{1,2,3}, downsample.0/1) — torchvision is
    not installed in this image."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class R50(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

            def stage(cin, planes, blocks, stride):
                ds = tnn.Sequential(
                    tnn.Conv2d(cin, planes * 4, 1, stride=stride,
                               bias=False),
                    tnn.BatchNorm2d(planes * 4))
                layers = [Bottleneck(cin, planes, stride, ds)]
                layers += [Bottleneck(planes * 4, planes)
                           for _ in range(blocks - 1)]
                return tnn.Sequential(*layers)

            self.layer1 = stage(64, 64, 3, 1)
            self.layer2 = stage(256, 128, 4, 2)
            self.layer3 = stage(512, 256, 6, 2)
            self.layer4 = stage(1024, 512, 3, 2)

    return R50()


def test_resnet50_backbone_matches_torch_reference():
    """ResNet-50 stage outputs vs the torch reference architecture
    (mmdet/torchvision-compatible naming consumed by
    build_resnet50_mapping), frozen-BN eval semantics."""
    from panacea_tpu.perception.resnet import ResNet50
    from panacea_tpu.utils.convert import (
        build_resnet50_mapping,
        convert_state_dict,
    )

    ref = _torch_resnet50()
    ref.eval()
    torch.manual_seed(4)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.05
    import torch.nn as tnn

    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.6, 1.4)

    rs = np.random.RandomState(11)
    x = rs.randn(1, 3, 64, 64).astype(np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        h = ref.maxpool(ref.relu(ref.bn1(ref.conv1(xt))))
        c2 = ref.layer1(h)
        c3 = ref.layer2(c2)
        c4 = ref.layer3(c3)
        c5 = ref.layer4(c4)

    sd = {f"img_backbone.{k}": v.numpy() for k, v in ref.state_dict().items()
          if not k.startswith("fc.")}
    params, missing, unexpected = convert_state_dict(
        sd, build_resnet50_mapping(path_prefix=()))
    unexpected = [k for k in unexpected if "num_batches_tracked" not in k]
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    outs = ResNet50().apply({"params": params},
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    for got, want in zip(outs, (c2, c3, c4, c5)):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want.numpy(), atol=3e-4)
