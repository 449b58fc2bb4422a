"""FULL torch-golden parity for StreamPETRHead (the dense PETR head).

Loads the ACTUAL reference StreamPETRHead
(metrics/.../dense_heads/streampetr_head.py:31-997) with its
PETRTemporalTransformer stack (models/utils/petr_transformer.py — the REAL
PETRMultiheadAttention / PETRTemporalDecoderLayer / PETRTransformerDecoder
classes, registries made functional), converts the randomized state dict
through `convert_streampetr_checkpoint(head='petr')` (both packed in_proj
attentions split), and matches all decoder layers' outputs: the frustum 3D
position encoding, SELayer featurized PE, MLN spatial alignment, decoder
post_norm, and the memory update.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
from test_deformable_parity import _stub, load_reference_detr3d  # noqa: E402
from test_sparse_head_parity import _Reg  # noqa: E402

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def load_reference_petr_head():
    import importlib.util

    import torch.nn as tnn

    load_reference_detr3d()  # base mm* stubs + plugin package aliases

    att_reg, layer_reg, seq_reg, trans_reg = _Reg(), _Reg(), _Reg(), _Reg()

    class TransformerLayerSequence(tnn.Module):
        def __init__(self, transformerlayers=None, num_layers=None,
                     init_cfg=None, **kw):
            super().__init__()
            self.layers = tnn.ModuleList(
                [layer_reg.build(transformerlayers)
                 for _ in range(num_layers)])
            self.num_layers = num_layers
            self.embed_dims = self.layers[0].embed_dims

    class MMFFN(tnn.Module):
        def __init__(self, embed_dims=256, feedforward_channels=1024,
                     ffn_drop=0.0, **kw):
            super().__init__()
            self.layers = tnn.Sequential(
                tnn.Sequential(tnn.Linear(embed_dims, feedforward_channels),
                               tnn.ReLU(True), tnn.Dropout(ffn_drop)),
                tnn.Linear(feedforward_channels, embed_dims),
                tnn.Dropout(ffn_drop))

        def forward(self, x, identity=None):
            out = self.layers(x)
            return (x if identity is None else identity) + out

    bricks = sys.modules["mmcv.cnn.bricks.transformer"]
    bricks.TransformerLayerSequence = TransformerLayerSequence
    bricks.BaseTransformerLayer = tnn.Module
    bricks.build_attention = att_reg.build
    bricks.build_transformer_layer_sequence = seq_reg.build
    bricks.build_feedforward_network = lambda cfg, default=None: MMFFN(
        **{k: v for k, v in dict(cfg).items() if k != "type"})
    reg_mod = sys.modules["mmcv.cnn.bricks.registry"]
    reg_mod.ATTENTION = att_reg
    reg_mod.TRANSFORMER_LAYER = layer_reg
    reg_mod.TRANSFORMER_LAYER_SEQUENCE = seq_reg
    _stub("mmcv.cnn.bricks.drop",
          build_dropout=lambda cfg: tnn.Dropout(cfg.get("drop_prob", 0.0)))
    runner = sys.modules["mmcv.runner"]
    runner.auto_fp16 = lambda **k: (lambda f: f)
    mu = sys.modules.get("mmdet.models.utils") or _stub("mmdet.models.utils")
    _stub("mmdet.models.utils.builder", TRANSFORMER=trans_reg)
    mu.builder = sys.modules["mmdet.models.utils.builder"]
    mu.build_transformer = trans_reg.build
    mu.NormedLinear = tnn.Linear

    ref = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
           "models")
    spec = importlib.util.spec_from_file_location(
        "ref_petr_transformer", f"{ref}/utils/petr_transformer.py")
    pt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pt)

    class AnchorFreeHead(tnn.Module):
        def __init__(self, num_classes, in_channels, init_cfg=None):
            super().__init__()

    _stub("mmdet.core", build_assigner=None, build_sampler=None,
          multi_apply=None, reduce_mean=None,
          bbox_xyxy_to_cxcywh=lambda b: b)
    _stub("mmdet.models", HEADS=_Reg(),
          build_loss=lambda cfg: types.SimpleNamespace(**dict(cfg)))
    _stub("mmdet.models.dense_heads")
    _stub("mmdet.models.dense_heads.anchor_free_head",
          AnchorFreeHead=AnchorFreeHead)
    _stub("mmdet3d"); _stub("mmdet3d.core"); _stub("mmdet3d.core.bbox")
    _stub("mmdet3d.core.bbox.coders",
          build_bbox_coder=lambda cfg: types.SimpleNamespace(**dict(cfg)))
    for pkg in ("projects.mmdet3d_plugin.core",
                "projects.mmdet3d_plugin.core.bbox"):
        _stub(pkg)
    _stub("projects.mmdet3d_plugin.core.bbox.util",
          normalize_bbox=lambda *a, **k: None)
    if "projects.mmdet3d_plugin.models.utils.misc" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "projects.mmdet3d_plugin.models.utils.misc",
            f"{ref}/utils/misc.py")
        misc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(misc)
        sys.modules[spec.name] = misc

    spec = importlib.util.spec_from_file_location(
        "ref_streampetr_head", f"{ref}/dense_heads/streampetr_head.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, sys.modules["projects.mmdet3d_plugin.models.utils.misc"]


def test_streampetr_head_full_forward_matches_reference():
    from panacea_tpu.perception.head import init_memory
    from panacea_tpu.perception.petr_head import StreamPETRHead
    from panacea_tpu.utils.convert import convert_streampetr_checkpoint

    mod, misc = load_reference_petr_head()
    b, n, c, q = 1, 2, 256, 12
    h, w = 8, 16
    pad_h, pad_w = 8 * 16, 16 * 16
    transformer = dict(
        type="PETRTemporalTransformer",
        decoder=dict(
            type="PETRTransformerDecoder", return_intermediate=True,
            num_layers=2,
            transformerlayers=dict(
                type="PETRTemporalDecoderLayer",
                attn_cfgs=[
                    dict(type="PETRMultiheadAttention", embed_dims=c,
                         num_heads=8, attn_drop=0.0, proj_drop=0.0),
                    dict(type="PETRMultiheadAttention", embed_dims=c,
                         num_heads=8, attn_drop=0.0, proj_drop=0.0),
                ],
                ffn_cfgs=dict(type="FFN", embed_dims=c,
                              feedforward_channels=2048, ffn_drop=0.0),
                with_cp=False,
                operation_order=("self_attn", "norm", "cross_attn", "norm",
                                 "ffn", "norm"))))
    ref = mod.StreamPETRHead(
        num_classes=10, in_channels=c, embed_dims=c, num_query=q,
        memory_len=24, topk_proposals=8, num_propagated=8,
        with_dn=False, with_ego_pos=True, train_cfg=None,
        transformer=transformer, depth_num=64, LID=True, depth_start=1,
        position_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        bbox_coder=dict(type="NMSFreeCoder", pc_range=list(PC)),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=0.25),
    )
    ref.num_pred = 2
    ref._init_layers()
    ref.reset_memory()
    ref.eval()
    torch.manual_seed(1)
    for prm in ref.parameters():
        if prm.requires_grad:
            prm.data = torch.randn_like(prm) * 0.1

    rs = np.random.RandomState(6)
    feat = rs.randn(b, n, c, h, w).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 50, 64, 50, 32
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.broadcast_to(K @ R, (b, n, 4, 4)).copy()
    intr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr = np.broadcast_to(R, (b, n, 4, 4)).copy()
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()

    loc = misc.locations(torch.zeros(1, c, h, w), 16, pad_h, pad_w)
    memory_center = loc[None].repeat(b * n, 1, 1, 1).clone()
    data_t = {
        "img_feats": torch.from_numpy(feat),
        "prev_exists": torch.zeros(b),
        "timestamp": torch.zeros(b),
        "ego_pose": torch.from_numpy(eye4),
        "ego_pose_inv": torch.from_numpy(eye4),
        "lidar2img": torch.from_numpy(l2i),
        "intrinsics": torch.from_numpy(intr),
        "extrinsics": torch.from_numpy(extr),
    }
    img_metas = [{"pad_shape": [(pad_h, pad_w, 3)]}]
    with torch.no_grad():
        outs_ref = ref(memory_center, img_metas, **data_t)

    sd = {f"pts_bbox_head.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted, _rep = convert_streampetr_checkpoint(
        sd, num_layers=2, backbone="r50", head="petr")
    bad = [k for k in _rep["unexpected"]
           if not k.endswith(("code_weights", "match_costs", "pc_range",
                              "position_range", "coords_d"))
           and "branches." not in k]
    assert not bad, bad
    params = converted["head"]

    ours = StreamPETRHead(num_classes=10, embed_dims=c, num_query=q,
                          memory_len=24, topk_proposals=8, num_propagated=8,
                          num_decoder_layers=2, num_levels=1, num_cams=n,
                          pc_range=PC, depth_num=64, lid=True,
                          depth_start=1.0,
                          position_range=(-61.2, -61.2, -10.0,
                                          61.2, 61.2, 10.0),
                          feat_level=0)
    mem = init_memory(b, 24, c)
    data_j = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.asarray(eye4),
        "ego_pose_inv": jnp.asarray(eye4),
        "lidar2img": jnp.asarray(l2i),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
    }
    mlvl = [jnp.asarray(feat.transpose(0, 1, 3, 4, 2))]
    outs, new_mem = ours.apply({"params": params}, mlvl, mem, data_j,
                               (pad_h, pad_w))

    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        outs_ref["all_cls_scores"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        outs_ref["all_bbox_preds"].numpy(), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(new_mem.embedding),
        ref.memory_embedding.numpy()[:, :24], atol=5e-4)
