"""Perception stack tests at tiny dimensions: backbone/neck shapes, deformable
sampling vs a NumPy reference, head memory propagation, full detector step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.perception.coder import NMSFreeCoder, denormalize_bbox
from panacea_tpu.perception.deformable import bilinear_sample, project_points
from panacea_tpu.perception.detector import StreamPETRWindow, normalize_images
from panacea_tpu.perception.encoding import pos2posemb3d
from panacea_tpu.perception.fpn import FPN
from panacea_tpu.perception.head import MemoryState, init_memory
from panacea_tpu.perception.resnet import ResNet50


def test_resnet_fpn_shapes():
    model = ResNet50()
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    stages = model.apply({"params": params}, x)
    assert [s.shape for s in stages] == [
        (1, 16, 32, 256), (1, 8, 16, 512), (1, 4, 8, 1024), (1, 2, 4, 2048)
    ]
    neck = FPN(out_channels=64, num_outs=5)
    nparams = neck.init(jax.random.PRNGKey(0), stages)["params"]
    outs = neck.apply({"params": nparams}, stages)
    assert [o.shape for o in outs] == [
        (1, 8, 16, 64), (1, 4, 8, 64), (1, 2, 4, 64), (1, 1, 2, 64),
        (1, 1, 1, 64),
    ]


def test_bilinear_sample_matches_numpy():
    rs = np.random.RandomState(0)
    feat = rs.randn(2, 6, 8, 3).astype(np.float32)
    uv = rs.uniform(0.1, 0.9, (2, 4, 5, 2)).astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(uv)))

    def ref_sample(f, u, v):
        h, w = f.shape[:2]
        x = u * w - 0.5
        y = v * h - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        dx, dy = x - x0, y - y0
        def px(xi, yi):
            if 0 <= xi < w and 0 <= yi < h:
                return f[yi, xi]
            return np.zeros(f.shape[-1])
        return (px(x0, y0) * (1-dx) * (1-dy) + px(x0+1, y0) * dx * (1-dy)
                + px(x0, y0+1) * (1-dx) * dy + px(x0+1, y0+1) * dx * dy)

    for b in range(2):
        for q in range(4):
            for p in range(5):
                expected = ref_sample(feat[b], uv[b, q, p, 0], uv[b, q, p, 1])
                np.testing.assert_allclose(out[b, q, p], expected, atol=1e-5)


def test_project_points_normalization():
    l2i = np.eye(4)[None, None].repeat(2, 1)[None].repeat(1, 0)  # (1,2,4,4)
    l2i = np.broadcast_to(np.eye(4), (1, 2, 4, 4)).copy()
    l2i[:, :, 0, 0] = 100.0  # fx
    l2i[:, :, 1, 1] = 100.0
    kp = np.array([[[[1.0, 2.0, 10.0]]]])  # (1,1,1,3)
    uv = np.asarray(project_points(jnp.asarray(kp), jnp.asarray(l2i), (50, 200)))
    # u = 100*1/10 / 200 = 0.05 ; v = 100*2/10 / 50 = 0.4
    np.testing.assert_allclose(uv[0, 0, 0, 0], [0.05, 0.4], atol=1e-6)


def test_denormalize_bbox():
    nb = jnp.asarray([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.5, -0.5]])
    b = np.asarray(denormalize_bbox(nb))
    np.testing.assert_allclose(b[0, :3], [1, 2, 3])
    np.testing.assert_allclose(b[0, 3:6], [1, 1, 1])  # exp(0)
    np.testing.assert_allclose(b[0, 6], np.pi / 2, atol=1e-6)  # atan2(1,0)
    np.testing.assert_allclose(b[0, 7:], [0.5, -0.5])


@pytest.fixture(scope="module")
def tiny_detector():
    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_levels=5, num_cams=2,
    )
    b, n, h, w = 1, 2, 64, 128
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 2, n, h, w, 3))
    data_seq = {
        "prev_exists": jnp.asarray([[0.0, 1.0]]),
        "timestamp": jnp.asarray([[0.0, 0.5]]),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
        "lidar2img": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    return model, params, imgs, data_seq


def test_detector_sliding_window(tiny_detector):
    model, params, imgs, data_seq = tiny_detector
    outs, memory = model.apply({"params": params}, imgs, data_seq)
    q_total = 12 + 8  # num_query + num_propagated
    assert outs["all_cls_scores"].shape == (2, 1, q_total, 10)
    assert outs["all_bbox_preds"].shape == (2, 1, q_total, 10)
    assert memory.embedding.shape == (1, 24, 32)
    assert np.all(np.isfinite(np.asarray(outs["all_bbox_preds"])))
    # centers inside pc_range
    xyz = np.asarray(outs["all_bbox_preds"][-1][..., :3])
    assert xyz.min() >= -51.2 - 1e-3 and xyz.max() <= 51.2 + 1e-3


def test_memory_propagates_and_resets(tiny_detector):
    model, params, imgs, data_seq = tiny_detector
    _, mem = model.apply({"params": params}, imgs, data_seq)
    assert float(jnp.abs(mem.embedding).max()) > 0
    # scene change (prev_exists=0) zeroes carried memory inside pre_update
    from panacea_tpu.perception.head import SparseHead

    data0 = {k: v[:, 0] for k, v in data_seq.items()}

    def run(params, mem, data):
        return model.apply(
            {"params": params}, imgs[:, 0], mem, data,
            method=model.forward_frame,
        )

    outs2, mem2 = run(params, mem, data0)  # prev_exists=0 resets
    # after reset + post_update, memory only holds the fresh frame's top-k
    assert mem2.embedding.shape == mem.embedding.shape


def test_nms_free_coder(tiny_detector):
    model, params, imgs, data_seq = tiny_detector
    outs, _ = model.apply({"params": params}, imgs, data_seq)
    coder = NMSFreeCoder(
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0), max_num=10
    )
    dets = coder.decode(outs)
    assert len(dets) == 1
    assert dets[0]["bboxes"].shape[1] == 9
    assert (np.diff(dets[0]["scores"]) <= 1e-6).all()  # sorted desc


def test_petr_head_detector():
    """StreamPETRHead (dense PETR cross-attn + frustum PE) runs through the
    full window detector and propagates memory across frames."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.perception.detector import StreamPETRWindow

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2,
        head_type="petr", head_cfg={"depth_num": 32},
    )
    b, t, n = 1, 2, 2
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(b, t, n, 64, 128, 3), jnp.float32)
    eye = jnp.eye(4)
    # non-singular lidar2img (position_embedding inverts it)
    l2i = jnp.asarray(np.diag([100.0, 100.0, 1.0, 1.0]), jnp.float32)
    data_seq = {
        "prev_exists": jnp.asarray([[0.0, 1.0]]),
        "timestamp": jnp.asarray([[0.0, 0.5]]),
        "ego_pose": jnp.broadcast_to(eye, (b, t, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, t, 4, 4)),
        "lidar2img": jnp.broadcast_to(l2i, (b, t, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(l2i, (b, t, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(eye, (b, t, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    # petr-specific towers exist
    assert "position_encoder" in params["head"]
    assert "memory_embed" in params["head"]
    outs, memory = model.apply({"params": params}, imgs, data_seq)
    # queries + propagated slots, as in the reference head
    assert outs["all_cls_scores"].shape == (2, b, 12 + 8, 10)
    assert outs["all_bbox_preds"].shape == (2, b, 12 + 8, 10)
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()
    assert np.abs(np.asarray(memory.embedding)).sum() > 0


def test_focal_head_and_petr_sparsification():
    """FocalHead emits valid topk_indexes; the PETR head restricted to a
    full-token selection (any permutation) matches dense exactly — KV
    attention is permutation-invariant — and a 50% selection still runs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.perception.focal_head import FocalHead
    from panacea_tpu.perception.head import init_memory
    from panacea_tpu.perception.petr_head import StreamPETRHead

    b, n, fh, fw, c = 1, 2, 4, 8, 32
    feat = jnp.asarray(
        np.random.RandomState(0).randn(b, n, fh, fw, c), jnp.float32)

    fhd = FocalHead(embed_dims=c, infer_ratio=0.5)
    fp = fhd.init(jax.random.PRNGKey(0), feat)["params"]
    outs = fhd.apply({"params": fp}, feat)
    k = outs["topk_indexes"].shape[1]
    assert k == n * fh * fw // 2
    idx = np.asarray(outs["topk_indexes"])[..., 0]
    assert (idx >= 0).all() and (idx < n * fh * fw).all()
    assert len(np.unique(idx[0])) == k  # distinct tokens
    assert outs["enc_cls_scores"].shape == (b * n, fh * fw, 10)
    assert outs["enc_bbox_preds"].shape == (b * n, fh * fw, 4)

    head = StreamPETRHead(
        embed_dims=c, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=n, depth_num=8,
    )
    eye = jnp.eye(4)
    l2i = jnp.broadcast_to(jnp.diag(jnp.asarray([100.0, 100.0, 1.0, 1.0])),
                           (b, n, 4, 4))
    data = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(eye, (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, 4, 4)),
        "lidar2img": l2i,
        "intrinsics": l2i,
        "extrinsics": jnp.broadcast_to(eye, (b, n, 4, 4)),
    }
    mem = init_memory(b, 24, c)
    hp = head.init(jax.random.PRNGKey(0), [feat], mem, data,
                   (64, 128))["params"]
    dense, _ = head.apply({"params": hp}, [feat], mem, data, (64, 128))
    # full-token "selection" in reversed order == dense (permutation-invariant)
    full = jnp.arange(n * fh * fw)[::-1].reshape(1, -1, 1)
    perm, _ = head.apply({"params": hp}, [feat], mem, data, (64, 128),
                         topk_indexes=full)
    np.testing.assert_allclose(
        np.asarray(dense["all_cls_scores"]),
        np.asarray(perm["all_cls_scores"]), atol=2e-5)
    # sparse selection runs and differs
    sparse, _ = head.apply({"params": hp}, [feat], mem, data, (64, 128),
                           topk_indexes=outs["topk_indexes"])
    assert np.isfinite(np.asarray(sparse["all_cls_scores"])).all()
