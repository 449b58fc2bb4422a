"""PETRHeadDN torch-golden parity: the generation-side non-streaming
PETRv2-DN head (petr_head_dn.py) vs perception/petr_head_dn.py, converted
through the petr-head mapping (the memory towers are absent on both sides).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
from test_petr_head_parity import load_reference_petr_head  # noqa: E402

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
GEN_REF = ("/root/reference/sgm/data/nuscenes_video/projects/"
           "mmdet3d_plugin")


def load_reference_petr_head_dn():
    import importlib.util

    _, misc = load_reference_petr_head()
    spec = importlib.util.spec_from_file_location(
        "ref_petr_head_dn", f"{GEN_REF}/models/dense_heads/petr_head_dn.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, misc


def test_petr_head_dn_full_forward_matches_reference():
    from panacea_tpu.perception.head import init_memory
    from panacea_tpu.perception.petr_head_dn import PETRHeadDN
    from panacea_tpu.utils.convert import convert_streampetr_checkpoint

    mod, misc = load_reference_petr_head_dn()
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
    ref = mod.PETRHeadDN(
        num_classes=10, in_channels=c, embed_dims=c, num_query=q,
        with_dn=False, train_cfg=None, transformer=transformer,
        depth_num=64, LID=True, depth_start=1,
        position_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        bbox_coder=dict(type="NMSFreeCoder", pc_range=list(PC)),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=0.25),
    )
    ref.num_pred = 2
    ref._init_layers()
    ref.eval()
    torch.manual_seed(5)
    for prm in ref.parameters():
        if prm.requires_grad:
            prm.data = torch.randn_like(prm) * 0.1

    rs = np.random.RandomState(11)
    feat = rs.randn(b, n, c, h, w).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 50, 64, 50, 32
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.broadcast_to(K @ R, (b, n, 4, 4)).copy()
    intr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr = np.broadcast_to(R, (b, n, 4, 4)).copy()

    loc = misc.locations(torch.zeros(1, c, h, w), 16, pad_h, pad_w)
    memory_center = loc[None].repeat(b * n, 1, 1, 1).clone()
    data_t = {
        "img_feats": torch.from_numpy(feat),
        "lidar2img": torch.from_numpy(l2i),
        "intrinsics": torch.from_numpy(intr),
        "extrinsics": torch.from_numpy(extr),
    }
    img_metas = [{"pad_shape": [(pad_h, pad_w, 3)]}]
    with torch.no_grad():
        outs_ref = ref(memory_center, img_metas, None, **data_t)

    sd = {f"pts_bbox_head.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted, _rep = convert_streampetr_checkpoint(
        sd, num_layers=2, backbone="r50", head="petr")
    # the memory towers are legitimately absent from a DN-head checkpoint
    missing_ok = ("pseudo_reference_points", "time_embedding",
                  "ego_pose_pe", "ego_pose_memory")
    bad = [k for k in _rep["unexpected"]
           if not k.endswith(("code_weights", "match_costs", "pc_range",
                              "position_range", "coords_d"))
           and "branches." not in k]
    assert not bad, bad
    params = converted["head"]
    assert not any(any(t in ".".join(map(str, k)) for t in missing_ok)
                   for k in _flat_keys(params)), "memory towers leaked in"

    ours = PETRHeadDN(num_classes=10, embed_dims=c, num_query=q,
                      memory_len=24, topk_proposals=8, num_propagated=8,
                      num_decoder_layers=2, num_levels=1, num_cams=n,
                      pc_range=PC, depth_num=64, lid=True, depth_start=1.0,
                      position_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
                      feat_level=0)
    mem = init_memory(b, 24, c)
    data_j = {
        "lidar2img": jnp.asarray(l2i),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
    }
    mlvl = [jnp.asarray(feat.transpose(0, 1, 3, 4, 2))]
    outs, mem_out = ours.apply({"params": params}, mlvl, mem, data_j,
                               (pad_h, pad_w))

    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        outs_ref["all_cls_scores"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        outs_ref["all_bbox_preds"].numpy(), atol=5e-3)
    # stateless: memory passes through untouched (reset_memory no-op)
    np.testing.assert_array_equal(np.asarray(mem_out.embedding),
                                  np.asarray(mem.embedding))


def _flat_keys(tree, prefix=()):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out += _flat_keys(v, prefix + (k,))
        return out
    return [prefix]
