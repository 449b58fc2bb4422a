"""Joint 2D->3D head family tests (perception/joint_head.py vs reference
joint_streampetr_head.py:37-233, :781-800)."""

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.head import init_memory
from panacea_tpu.perception.joint_head import (
    JointStreamPETRHead,
    QueryRoIHead,
    roi_align,
)

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_roi_align_matches_naive_bilinear():
    rs = np.random.RandomState(0)
    feat = rs.randn(1, 8, 8, 3).astype(np.float32)
    boxes = np.array([[[16.0, 16.0, 80.0, 80.0]]], np.float32)  # img px
    # sampling_ratio=1: one sample at each bin center
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                               out_size=(2, 2), spatial_scale=1 / 16,
                               sampling_ratio=1))
    # bin centers at (1+0.25*4, ...) - 0.5 in feature coords
    def bil(f, y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        wy, wx = y - y0, x - x0
        y0c, x0c = np.clip(y0, 0, 7), np.clip(x0, 0, 7)
        y1c, x1c = np.clip(y0 + 1, 0, 7), np.clip(x0 + 1, 0, 7)
        return ((1 - wy) * (1 - wx) * f[y0c, x0c]
                + (1 - wy) * wx * f[y0c, x1c]
                + wy * (1 - wx) * f[y1c, x0c] + wy * wx * f[y1c, x1c])

    b = np.array([16, 16, 80, 80]) / 16.0
    bw, bh = b[2] - b[0], b[3] - b[1]
    for i in range(2):
        for j in range(2):
            y = b[1] + (i + 0.5) / 2 * bh - 0.5
            x = b[0] + (j + 0.5) / 2 * bw - 0.5
            np.testing.assert_allclose(out[0, 0, i, j], bil(feat[0], y, x),
                                       rtol=1e-5)


def test_roi_align_matches_torchvision_aligned():
    """Golden vs torchvision.ops.roi_align(aligned=True) — the exact mmcv
    semantics the reference's QueryRoIHead/cascade stages consume
    (joint_streampetr_head.py:37-233). Covers in-bounds, partially
    out-of-bounds, and sub-pixel rois at sampling_ratio 1 and 2."""
    import pytest

    torch = pytest.importorskip("torch")
    tvops = pytest.importorskip("torchvision.ops")

    rs = np.random.RandomState(1)
    m, h, w, c = 2, 10, 14, 5
    feat = rs.randn(m, h, w, c).astype(np.float32)
    boxes = np.stack([
        # (M, P, 4) image-pixel xyxy at stride 16: in-bounds, tiny sub-pixel,
        # hanging off every edge, fully outside
        np.array([[20, 25, 150, 120], [33.3, 17.9, 41.2, 25.4],
                  [-40, -30, 90, 70], [-500, -500, -400, -430]], np.float32),
        np.array([[0, 0, 224, 160], [100, 60, 180, 150],
                  [60.5, 40.25, 199.75, 130.5], [208, 144, 280, 200]],
                 np.float32),
    ])
    for sr in (1, 2):
        ours = np.asarray(roi_align(
            jnp.asarray(feat), jnp.asarray(boxes), out_size=(7, 7),
            spatial_scale=1 / 16.0, sampling_ratio=sr))
        tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
        tboxes = [torch.from_numpy(b) for b in boxes]
        ref = tvops.roi_align(tfeat, tboxes, output_size=(7, 7),
                              spatial_scale=1 / 16.0, sampling_ratio=sr,
                              aligned=True)
        ref = ref.numpy().reshape(m, 4, c, 7, 7).transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_roi_align_matches_naive_kernel_transcription():
    """Independent oracle: a direct per-sample-point loop transcription of
    the mmcv/torchvision RoIAlign(aligned=True) kernel algorithm (bin grid
    of sampling_ratio^2 points at (p + (i+0.5)/g)*bin, zero outside
    [-1, size], edge-clamped bilinear, mean over the grid). Runs in every
    environment (the torchvision golden above skips without torchvision)."""

    def naive(feat, boxes, oh, ow, scale, g):
        m, h, w, c = feat.shape
        p = boxes.shape[1]
        out = np.zeros((m, p, oh, ow, c), np.float64)
        for mi in range(m):
            for pi in range(p):
                x1, y1, x2, y2 = boxes[mi, pi] * scale - 0.5
                bin_h = (y2 - y1) / oh
                bin_w = (x2 - x1) / ow
                for ph in range(oh):
                    for pw in range(ow):
                        acc = np.zeros((c,), np.float64)
                        for iy in range(g):
                            for ix in range(g):
                                y = y1 + (ph + (iy + 0.5) / g) * bin_h
                                x = x1 + (pw + (ix + 0.5) / g) * bin_w
                                if y < -1.0 or y > h or x < -1.0 or x > w:
                                    continue
                                y = min(max(y, 0.0), h - 1)
                                x = min(max(x, 0.0), w - 1)
                                y0, x0 = int(np.floor(y)), int(np.floor(x))
                                y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1,
                                                                   w - 1)
                                wy, wx = y - y0, x - x0
                                acc += ((1 - wy) * (1 - wx) * feat[mi, y0, x0]
                                        + (1 - wy) * wx * feat[mi, y0, x1_]
                                        + wy * (1 - wx) * feat[mi, y1_, x0]
                                        + wy * wx * feat[mi, y1_, x1_])
                        out[mi, pi, ph, pw] = acc / (g * g)
        return out

    rs = np.random.RandomState(3)
    feat = rs.randn(2, 9, 13, 4).astype(np.float32)
    boxes = np.stack([
        np.array([[18, 20, 150, 120], [-50, -40, 80, 65],
                  [30.7, 10.2, 37.9, 19.8]], np.float32),
        np.array([[0, 0, 208, 144], [100, 60, 300, 250],
                  [-600, -600, -500, -520]], np.float32),
    ])
    for g in (1, 2, 3):
        ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                    out_size=(5, 3), spatial_scale=1 / 16.0,
                                    sampling_ratio=g))
        ref = naive(feat, boxes, 5, 3, 1 / 16.0, g)
        np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_query_roi_head_unprojects_along_ray():
    """With a pinhole projection, the lifted 3D point must reproject to the
    proposal center."""
    b, n, p, c = 1, 1, 2, 32
    f, cx, cy = 100.0, 64.0, 32.0
    # realistic front camera: lidar x-forward -> camera z-forward (without a
    # rotation the camera ray maps onto lidar HEIGHT and the z-range mask
    # (-5, 3) rejects everything, reference :216-218)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = f, cx, f, cy
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.broadcast_to((K @ R), (b, n, 4, 4)).copy()
    intr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    data = {"lidar2img": jnp.asarray(l2i), "intrinsics": jnp.asarray(intr)}
    head = QueryRoIHead(embed_dims=c, conv_out_channels=32,
                        fc_out_channels=32, pc_range=PC)
    feat = jnp.ones((b, n, 8, 16, c))
    boxes = jnp.asarray(
        np.array([[[[40, 20, 80, 44], [10, 10, 30, 30]]]], np.float32))
    valid = jnp.ones((b, n, p))
    params = head.init(jax.random.PRNGKey(0), feat, boxes, valid,
                       data)["params"]
    ref, ok = head.apply({"params": params}, feat, boxes, valid, data)
    assert ref.shape == (b, n * p, 3) and ok.shape == (b, n * p)
    assert float(np.asarray(ok).sum()) > 0, "all proposals masked"
    pc = np.asarray(PC)
    xyz = np.asarray(ref)[0] * (pc[3:6] - pc[0:3]) + pc[0:3]
    # center head initializes near zero -> center ~ box center; reproject
    L = np.asarray(l2i)[0, 0]
    for k, bx in enumerate([[40, 20, 80, 44], [10, 10, 30, 30]]):
        if not float(ok[0, k]):
            continue
        hom = L @ np.array([*xyz[k], 1.0])
        u, v = hom[0] / hom[2], hom[1] / hom[2]
        assert abs(u - (bx[0] + bx[2]) / 2) < 2.0, (k, u)
        assert abs(v - (bx[1] + bx[3]) / 2) < 2.0, (k, v)


def test_joint_head_forward_uses_proposal_queries():
    b, n, c, p = 1, 2, 32, 3
    head = JointStreamPETRHead(
        num_classes=10, embed_dims=c, num_query=12, memory_len=24,
        topk_proposals=8, num_propagated=8, num_decoder_layers=2,
        num_levels=2, num_cams=n, pc_range=PC,
        query_head_cfg={"conv_out_channels": 32, "fc_out_channels": 32},
    )
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (b, n, 8 // (2**i), 16 // (2**i), c))
             for i in range(2)]
    eye = jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4))
    data = {
        "prev_exists": jnp.zeros((b,)), "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "lidar2img": eye, "intrinsics": eye, "extrinsics": eye,
        "proposal_boxes": jax.random.uniform(rng, (b, n, p, 4),
                                             minval=0, maxval=60),
        "proposal_valid": jnp.ones((b, n, p)),
    }
    mem = init_memory(b, 24, c)
    params = head.init(jax.random.PRNGKey(1), feats, mem, data,
                       (64, 128))["params"]
    assert "query_head" in params
    outs, _ = head.apply({"params": params}, feats, mem, data, (64, 128))
    # query count = N*P proposals + propagated
    assert outs["all_cls_scores"].shape == (2, b, n * p + 8, 10)
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()


def test_joint_sparse_head_with_roi_lifting():
    """JointHead = SparseHead decoder + QueryRoIHead lifting
    (joint_head.py:227 family)."""
    from panacea_tpu.perception.joint_head import JointHead

    b, n, c, p = 1, 2, 32, 3
    head = JointHead(
        num_classes=10, embed_dims=c, num_query=12, memory_len=24,
        topk_proposals=8, num_propagated=8, num_decoder_layers=2,
        num_levels=2, num_cams=n, pc_range=PC,
        query_head_cfg={"conv_out_channels": 32, "fc_out_channels": 32},
    )
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (b, n, 8 // (2**i), 16 // (2**i), c))
             for i in range(2)]
    eye = jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4))
    data = {
        "prev_exists": jnp.zeros((b,)), "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "lidar2img": eye, "intrinsics": eye, "extrinsics": eye,
        "proposal_boxes": jax.random.uniform(rng, (b, n, p, 4),
                                             minval=0, maxval=60),
        "proposal_valid": jnp.ones((b, n, p)),
    }
    mem = init_memory(b, 24, c)
    params = head.init(jax.random.PRNGKey(1), feats, mem, data,
                       (64, 128))["params"]
    assert "query_head" in params
    outs, _ = head.apply({"params": params}, feats, mem, data, (64, 128))
    # seed mode pads proposals to num_query (+ propagated)
    assert outs["all_cls_scores"].shape == (2, b, 12 + 8, 10)
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()


def test_cascade_roi_head_refines():
    from panacea_tpu.perception.cascade_roi import CascadeRoIHead

    m, p, c = 2, 4, 32
    feat = jax.random.normal(jax.random.PRNGKey(0), (m, 8, 16, c))
    boxes = jax.random.uniform(jax.random.PRNGKey(1), (m, p, 4),
                               minval=0, maxval=100)
    boxes = jnp.concatenate([jnp.minimum(boxes[..., :2], boxes[..., 2:]),
                             jnp.maximum(boxes[..., :2], boxes[..., 2:])
                             + 8.0], -1)
    valid = jnp.ones((m, p))
    head = CascadeRoIHead(num_classes=10, num_stages=3)
    params = head.init(jax.random.PRNGKey(2), feat, boxes, valid)["params"]
    assert {"bbox_head_0", "bbox_head_1", "bbox_head_2"} <= set(params)
    outs = head.apply({"params": params}, feat, boxes, valid)
    assert outs["cls_scores"].shape == (m, p, 11)
    assert outs["boxes"].shape == (m, p, 4)
    assert len(outs["stage_boxes"]) == 3
    # stages refine: boxes differ across stages
    assert not np.allclose(np.asarray(outs["stage_boxes"][0]),
                           np.asarray(outs["stage_boxes"][2]))
    s = np.asarray(outs["cls_scores"])
    assert np.isfinite(s).all() and s.min() >= 0 and s.max() <= 1
