"""TwoStageDetr3DCrossAtten torch-golden parity vs the ACTUAL reference
module (twostage_detr3d_transformer.py:264-628), both weight layouts
(full cams*points*levels and depth-wise factorized)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
from test_deformable_parity import _stub, load_reference_detr3d  # noqa: E402

PC = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
REF = ("/root/reference/metrics/StreamPETR/projects/mmdet3d_plugin/models/"
       "utils/twostage_detr3d_transformer.py")


def load_reference_twostage():
    import importlib.util

    import torch.nn as tnn

    load_reference_detr3d()
    bricks = sys.modules["mmcv.cnn.bricks.transformer"]
    if not hasattr(bricks, "MultiScaleDeformableAttention"):
        bricks.MultiScaleDeformableAttention = tnn.Module
    if not hasattr(bricks, "TransformerLayerSequence"):
        bricks.TransformerLayerSequence = tnn.Module
    if not hasattr(bricks, "build_transformer_layer_sequence"):
        bricks.build_transformer_layer_sequence = lambda cfg: None
    _stub("mmcv.cnn.bricks.drop",
          build_dropout=lambda cfg: tnn.Dropout(cfg.get("drop_prob", 0.0)))
    mu = sys.modules.get("mmdet.models.utils") or _stub("mmdet.models.utils")
    _stub("mmdet.models.utils.builder",
          TRANSFORMER=types.SimpleNamespace(
              register_module=lambda *a, **k: (lambda c: c)))
    mu.builder = sys.modules["mmdet.models.utils.builder"]
    cnn = sys.modules["mmcv.cnn"]
    if not hasattr(cnn, "Linear"):
        cnn.Linear = tnn.Linear
    if not hasattr(cnn, "bias_init_with_prob"):
        cnn.bias_init_with_prob = lambda p: float(-np.log((1 - p) / p))
    spec = importlib.util.spec_from_file_location("ref_twostage", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("depth_wise", [False, True])
def test_twostage_cross_atten_matches_reference(depth_wise):
    from panacea_tpu.perception.twostage_attn import TwoStageDetr3DCrossAtten

    mod = load_reference_twostage()
    b, n, q, c, lvls = 1, 2, 7, 32, 2
    hs = [(12, 20), (6, 10)]
    img_shape = (192, 320)

    ref = mod.TwoStageDetr3DCrossAtten(
        embed_dims=c, num_heads=4, num_levels=lvls, num_points=3,
        num_cams=n, pc_range=PC, dropout=0.0, depth_wise_weights=depth_wise)
    ref.eval()
    torch.manual_seed(0)
    for prm in ref.parameters():
        prm.data = torch.randn_like(prm) * 0.2

    rs = np.random.RandomState(4)
    feats = [rs.randn(b, n, c, h, w).astype(np.float32) for h, w in hs]
    query = rs.randn(q, b, c).astype(np.float32)
    qpos = rs.randn(q, b, c).astype(np.float32)
    refpts = rs.uniform(0.05, 0.95, (b, q, 3)).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 100, 160, 100, 96
    R0 = np.eye(4, dtype=np.float32)
    R0[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    R1 = R0.copy()
    R1[:3, 3] = [0.5, -0.3, 0.1]
    l2i = np.stack([K @ R0, K @ R1])[None]  # (1, 2, 4, 4)

    img_metas = [{"lidar2img": l2i[0], "img_shape": [img_shape + (3,)]}]
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(query), None,
            [torch.from_numpy(f) for f in feats],
            query_pos=torch.from_numpy(qpos),
            reference_points=torch.from_numpy(refpts),
            img_metas=img_metas)
    out_ref = out_ref.permute(1, 0, 2).numpy()  # (B, Q, C)

    ours = TwoStageDetr3DCrossAtten(
        embed_dims=c, num_levels=lvls, num_points=3, num_cams=n,
        pc_range=tuple(PC), depth_wise_weights=depth_wise)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    params = {
        "attention_weights": lin("attention_weights"),
        "output_proj": lin("output_proj"),
        "pos_fc1": lin("position_encoder.0"),
        "pos_ln1": {"scale": sd["position_encoder.1.weight"],
                    "bias": sd["position_encoder.1.bias"]},
        "pos_fc2": lin("position_encoder.3"),
        "pos_ln2": {"scale": sd["position_encoder.4.weight"],
                    "bias": sd["position_encoder.4.bias"]},
    }
    out = ours.apply(
        {"params": params},
        jnp.asarray(query.transpose(1, 0, 2)),
        [jnp.asarray(f.transpose(0, 1, 3, 4, 2)) for f in feats],
        jnp.asarray(refpts), jnp.asarray(l2i), img_shape,
        query_pos=jnp.asarray(qpos.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)
