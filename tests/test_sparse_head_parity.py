"""FULL torch-golden parity for the eval-recipe SparseHead.

Loads the ACTUAL reference SparseHead (metrics/.../dense_heads/
sparse_head.py:20-997) together with its Detr3DTransformer decoder stack
(functional registries; mmcv's MultiheadAttention / FFN reimplemented
faithfully; the CUDA deformable op replaced by its documented grid_sample
reference math — see test_deformable_parity), converts its randomized
state dict through `convert_streampetr_checkpoint`'s head mapping
(including the packed nn.MultiheadAttention in_proj split), and asserts
this framework's SparseHead reproduces all 6 decoder layers'
cls/bbox outputs AND the propagated memory on a fresh frame.

This is the de-risking layer for converted StreamPETR checkpoints: if this
passes, the head architecture + converter are jointly correct end to end.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
from test_deformable_parity import (  # noqa: E402
    _msda_pytorch,
    _stub,
    load_reference_detr3d,
)

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


class _Reg:
    def __init__(self):
        self.d = {}

    def register_module(self, *a, **k):
        def deco(cls):
            self.d[cls.__name__] = cls
            return cls
        return deco

    def build(self, cfg):
        cfg = dict(cfg)
        return self.d[cfg.pop("type")](**cfg)


def load_reference_sparse_head():
    import torch.nn as tnn

    detr3d = load_reference_detr3d()

    att_reg, seq_reg, layer_reg, trans_reg = _Reg(), _Reg(), _Reg(), _Reg()

    class MMMultiheadAttention(tnn.Module):
        """mmcv.cnn.bricks.transformer.MultiheadAttention semantics."""

        def __init__(self, embed_dims, num_heads, dropout=0.0,
                     batch_first=False, **kw):
            super().__init__()
            self.embed_dims = embed_dims
            self.batch_first = batch_first
            self.attn = tnn.MultiheadAttention(embed_dims, num_heads,
                                               dropout)

        def forward(self, query, key, value, identity=None, query_pos=None,
                    key_pos=None, attn_mask=None, key_padding_mask=None,
                    **kw):
            if identity is None:
                identity = query
            if query_pos is not None:
                query = query + query_pos
            if key_pos is not None:
                key = key + key_pos
            if self.batch_first:
                query, key, value = (x.transpose(0, 1)
                                     for x in (query, key, value))
            out = self.attn(query, key, value, attn_mask=attn_mask,
                            key_padding_mask=key_padding_mask)[0]
            if self.batch_first:
                out = out.transpose(0, 1)
            return identity + out

    class MMFFN(tnn.Module):
        """mmcv FFN: layers.0.0 / layers.1 naming (matches the converter's
        ffn refs)."""

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

    att_reg.d["MultiheadAttention"] = MMMultiheadAttention
    att_reg.d["DeformableFeatureAggregationCuda"] = \
        detr3d.DeformableFeatureAggregationCuda
    layer_reg.d["Detr3DTemporalDecoderLayer"] = \
        detr3d.Detr3DTemporalDecoderLayer
    seq_reg.d["Detr3DTransformerDecoder"] = detr3d.Detr3DTransformerDecoder
    trans_reg.d["Detr3DTransformer"] = detr3d.Detr3DTransformer

    # wire the functional builders into the (already stubbed) mmcv modules
    bricks = sys.modules["mmcv.cnn.bricks.transformer"]
    bricks.build_attention = att_reg.build
    bricks.build_feedforward_network = lambda cfg, default=None: MMFFN(
        **{k: v for k, v in dict(cfg).items() if k != "type"})
    bricks.build_transformer_layer_sequence = seq_reg.build

    # TransformerLayerSequence base: builds num_layers copies of the layer
    class TransformerLayerSequence(tnn.Module):
        def __init__(self, transformerlayers=None, num_layers=None,
                     init_cfg=None, **kw):
            super().__init__()
            self.layers = tnn.ModuleList(
                [layer_reg.build(transformerlayers)
                 for _ in range(num_layers)])
            self.num_layers = num_layers

    bricks.TransformerLayerSequence = TransformerLayerSequence
    # detr3d module captured the OLD stub at import time — patch in place
    detr3d.build_transformer_layer_sequence = seq_reg.build
    detr3d.build_attention = att_reg.build
    detr3d.build_feedforward_network = bricks.build_feedforward_network
    detr3d.Detr3DTransformerDecoder.__bases__ = (TransformerLayerSequence,)

    class AnchorFreeHead(tnn.Module):
        def __init__(self, num_classes, in_channels, init_cfg=None):
            super().__init__()

    def build_loss(cfg):
        return types.SimpleNamespace(**dict(cfg))

    _stub("mmdet.core", build_assigner=None, build_sampler=None,
          multi_apply=None, reduce_mean=None,
          bbox_xyxy_to_cxcywh=lambda b: b)
    mu = sys.modules["mmdet.models.utils"]
    mu.build_transformer = trans_reg.build
    mu.NormedLinear = tnn.Linear
    _stub("mmdet.models", HEADS=_Reg(), build_loss=build_loss)
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

    import importlib.util
    ref = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
           "models")
    if "projects.mmdet3d_plugin.models.utils.misc" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "projects.mmdet3d_plugin.models.utils.misc",
            f"{ref}/utils/misc.py")
        misc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(misc)
        sys.modules[spec.name] = misc
    spec = importlib.util.spec_from_file_location(
        "ref_sparse_head", f"{ref}/dense_heads/sparse_head.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_sparse_head_file(filename: str):
    """Load a sibling sparse-head variant (sparse_head_v3/v4.py) with the
    same stub environment; call AFTER load_reference_sparse_head."""
    import importlib.util
    ref = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/"
           "models/dense_heads")
    spec = importlib.util.spec_from_file_location(
        f"ref_{filename[:-3]}", f"{ref}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sparse_head_full_forward_matches_reference():
    import jax

    from panacea_tpu.perception.head import SparseHead, init_memory
    from panacea_tpu.utils.convert import convert_streampetr_checkpoint

    mod = load_reference_sparse_head()
    b, n, c, q = 1, 2, 256, 12
    levels = [(8, 16), (4, 8)]
    transformer = dict(
        type="Detr3DTransformer",
        decoder=dict(
            type="Detr3DTransformerDecoder", embed_dims=c, num_layers=2,
            transformerlayers=dict(
                type="Detr3DTemporalDecoderLayer", batch_first=True,
                attn_cfgs=[
                    dict(type="MultiheadAttention", embed_dims=c,
                         num_heads=8, dropout=0.0),
                    dict(type="DeformableFeatureAggregationCuda",
                         embed_dims=c, num_groups=8, num_levels=2,
                         num_cams=n, dropout=0.0, num_pts=3, bias=2.0),
                ],
                ffn_cfgs=dict(type="FFN", embed_dims=c,
                              feedforward_channels=2048, ffn_drop=0.0),
                with_cp=False,
                operation_order=("self_attn", "norm", "cross_attn", "norm",
                                 "ffn", "norm"))))
    ref = mod.SparseHead(
        num_classes=10, in_channels=c, embed_dims=c, num_query=q,
        memory_len=24, topk_proposals=8, num_propagated=8,
        with_dn=False, with_ego_pos=True, train_cfg=None,
        transformer=transformer,
        bbox_coder=dict(type="NMSFreeCoder", pc_range=list(PC)),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=0.25),
    )
    ref.num_pred = 2  # match num_layers (reference hardcodes 6, :167)
    ref._init_layers()
    ref.reset_memory()
    ref.eval()
    torch.manual_seed(0)
    for prm in ref.parameters():
        if prm.requires_grad:
            prm.data = torch.randn_like(prm) * 0.1

    rs = np.random.RandomState(4)
    feats = [rs.randn(b, n, c, h, w).astype(np.float32) for h, w in levels]
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 50, 64, 50, 32
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.broadcast_to(K @ R, (b, n, 4, 4)).copy()
    intr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr = np.broadcast_to(R, (b, n, 4, 4)).copy()
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    data_t = {
        "img_feats": [torch.from_numpy(f) for f in feats],
        "prev_exists": torch.zeros(b),
        "timestamp": torch.zeros(b),
        "ego_pose": torch.from_numpy(eye4),
        "ego_pose_inv": torch.from_numpy(eye4),
        "lidar2img": torch.from_numpy(l2i),
        "intrinsics": torch.from_numpy(intr),
        "extrinsics": torch.from_numpy(extr),
    }
    img_metas = [{"pad_shape": [(64, 128, 3)]}]
    with torch.no_grad():
        outs_ref = ref(img_metas, **data_t)

    # ---- convert + run ours
    sd = {f"pts_bbox_head.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted, _rep = convert_streampetr_checkpoint(
        sd, num_layers=2, backbone="r50", head="sparse")
    # benign leftovers only: constant buffers + shared-ModuleList
    # duplicate entries (cls/reg_branches.{1..} repeat branch 0's tensors)
    bad = [k for k in _rep["unexpected"]
           if not k.endswith(("code_weights", "match_costs", "pc_range"))
           and "branches." not in k]
    assert not bad, bad
    params = converted["head"]

    ours = SparseHead(num_classes=10, embed_dims=c, num_query=q,
                      memory_len=24, topk_proposals=8, num_propagated=8,
                      num_decoder_layers=2, num_levels=2, num_cams=n,
                      num_groups=8, num_pts=3, pc_range=PC)
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
    mlvl = [jnp.asarray(f.transpose(0, 1, 3, 4, 2)) for f in feats]
    outs, new_mem = ours.apply({"params": params}, mlvl, mem, data_j,
                               (64, 128))

    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        outs_ref["all_cls_scores"].numpy(), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        outs_ref["all_bbox_preds"].numpy(), atol=3e-3)
    # propagated memory matches too (post_update_memory). The reference
    # keeps topk+old rows un-truncated until the NEXT frame's pre_update
    # slices [:memory_len] (sparse_head.py:395-399); ours truncates
    # eagerly — identical at the next read, so compare the slice.
    np.testing.assert_allclose(
        np.asarray(new_mem.embedding),
        ref.memory_embedding.numpy()[:, :24], atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(new_mem.reference_point),
        ref.memory_reference_point.numpy()[:, :24], atol=3e-3)


def test_sparse_head_v3_context_queries_match_reference():
    """SparseHeadv3 (proposal context queries, eval mode / no DN): the
    reference builds reference points from proposal positions and query
    content from input_proj(proposal_features) with context_embedding
    filling nothing (all queries ARE proposals, sparse_head_v3.py:526-544);
    converted through head='sparse_v3'."""
    from panacea_tpu.perception.head import init_memory
    from panacea_tpu.perception.sparse_head_v3 import SparseHeadv3
    from panacea_tpu.utils.convert import convert_streampetr_checkpoint

    load_reference_sparse_head()  # installs the stub environment
    mod = load_reference_sparse_head_file("sparse_head_v3.py")
    b, n, c, q = 1, 2, 256, 12
    levels = [(8, 16), (4, 8)]
    transformer = dict(
        type="Detr3DTransformer",
        decoder=dict(
            type="Detr3DTransformerDecoder", embed_dims=c, num_layers=2,
            transformerlayers=dict(
                type="Detr3DTemporalDecoderLayer", batch_first=True,
                attn_cfgs=[
                    dict(type="MultiheadAttention", embed_dims=c,
                         num_heads=8, dropout=0.0),
                    dict(type="DeformableFeatureAggregationCuda",
                         embed_dims=c, num_groups=8, num_levels=2,
                         num_cams=n, dropout=0.0, num_pts=3, bias=2.0),
                ],
                ffn_cfgs=dict(type="FFN", embed_dims=c,
                              feedforward_channels=2048, ffn_drop=0.0),
                with_cp=False,
                operation_order=("self_attn", "norm", "cross_attn", "norm",
                                 "ffn", "norm"))))
    ref = mod.SparseHeadv3(
        num_classes=10, in_channels=c, embed_dims=c, num_query=q,
        memory_len=24, topk_proposals=8, num_propagated=8,
        with_dn=False, with_ego_pos=True, train_cfg=None,
        using_queries=False,
        transformer=transformer,
        bbox_coder=dict(type="NMSFreeCoder", pc_range=list(PC)),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=0.25),
    )
    ref.num_pred = 2
    ref._init_layers()
    ref.reset_memory()
    ref.eval()
    torch.manual_seed(0)
    for prm in ref.parameters():
        if prm.requires_grad:
            prm.data = torch.randn_like(prm) * 0.1

    rs = np.random.RandomState(7)
    feats = [rs.randn(b, n, c, h, w).astype(np.float32) for h, w in levels]
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 50, 64, 50, 32
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.broadcast_to(K @ R, (b, n, 4, 4)).copy()
    intr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr = np.broadcast_to(R, (b, n, 4, 4)).copy()
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    # proposals: lidar-frame positions inside pc_range + (B, P, 2C) features
    P = 10
    pos = rs.uniform(-30, 30, (b, P, 3)).astype(np.float32)
    pos[..., 2] = rs.uniform(-3, 1, (b, P))
    pfeat = rs.randn(b, P, 2 * c).astype(np.float32)
    data_t = {
        "img_feats": [torch.from_numpy(f) for f in feats],
        "prev_exists": torch.zeros(b),
        "timestamp": torch.zeros(b),
        "ego_pose": torch.from_numpy(eye4),
        "ego_pose_inv": torch.from_numpy(eye4),
        "lidar2img": torch.from_numpy(l2i),
        "intrinsics": torch.from_numpy(intr),
        "extrinsics": torch.from_numpy(extr),
    }
    img_metas = [{"pad_shape": [(64, 128, 3)]}]
    with torch.no_grad():
        outs_ref = ref(img_metas,
                       proposal_features=torch.from_numpy(pfeat),
                       proposal_positions=torch.from_numpy(pos),
                       **data_t)

    sd = {f"pts_bbox_head.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted, _rep = convert_streampetr_checkpoint(
        sd, num_layers=2, backbone="r50", head="sparse_v3")
    bad = [k for k in _rep["unexpected"]
           if not k.endswith(("code_weights", "match_costs", "pc_range"))
           and "branches." not in k]
    assert not bad, bad
    params = converted["head"]
    # using_queries=False: the reference never creates the learned
    # reference_points table (sparse_head_v3.py:262); ours declares it but
    # the context path never reads it — fill with zeros
    params["reference_points"] = jnp.zeros((q, 3), jnp.float32)

    ours = SparseHeadv3(num_classes=10, embed_dims=c, num_query=q,
                        memory_len=24, topk_proposals=8, num_propagated=8,
                        num_decoder_layers=2, num_levels=2, num_cams=n,
                        num_groups=8, num_pts=3, pc_range=PC)
    mem = init_memory(b, 24, c)
    data_j = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.asarray(eye4),
        "ego_pose_inv": jnp.asarray(eye4),
        "lidar2img": jnp.asarray(l2i),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
        "proposal_positions": jnp.asarray(pos),
        "proposal_features": jnp.asarray(pfeat),
    }
    mlvl = [jnp.asarray(f.transpose(0, 1, 3, 4, 2)) for f in feats]
    outs, new_mem = ours.apply({"params": params}, mlvl, mem, data_j,
                               (64, 128))

    # proposal-count queries (+ num_propagated from temporal_alignment)
    assert outs["all_cls_scores"].shape[2] == P + 8
    assert outs["all_cls_scores"].shape == \
        tuple(outs_ref["all_cls_scores"].shape)
    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        outs_ref["all_cls_scores"].numpy(), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        outs_ref["all_bbox_preds"].numpy(), atol=3e-3)
