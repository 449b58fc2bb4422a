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
    # our learnable_fc output is shifted by -bias at call time; fold the
    # shift into the torch bias for equivalence
    params["learnable_fc"]["bias"] = params["learnable_fc"]["bias"] + \
        ours.bias
    out = ours.apply(
        {"params": params}, jnp.asarray(inst), jnp.asarray(qpos),
        [jnp.asarray(f) for f in feats], jnp.asarray(ref_lidar),
        jnp.asarray(l2i), (pad_h, pad_w))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)
