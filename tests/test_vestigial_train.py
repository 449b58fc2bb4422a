"""Training-branch tests for the vestigial head families
(perception/vestigial_train.py vs the reference loss code that every family
file repeats: joint_head.py:754-1101, joint_headv2/v3, joint_streampetr_head,
sparse_head_v4:630-966, simmod_head.py:389-658, cascade_roi_head.py:191-286).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.perception.coder import normalize_bbox
from panacea_tpu.perception.vestigial_train import (
    bbox2delta,
    cascade_roi_loss,
    detr3d_family_loss,
    detr3d_layer_targets,
    max_iou_assign,
    rotated_iou_3d,
    simmod_iou3d_loss,
)

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _mk_gt(rs, g):
    boxes = np.stack([
        rs.uniform(-30, 30, g), rs.uniform(-30, 30, g),
        rs.uniform(-2, 1, g), rs.uniform(1, 3, g), rs.uniform(2, 5, g),
        rs.uniform(1, 2, g), rs.uniform(-np.pi, np.pi, g),
        rs.uniform(-2, 2, g), rs.uniform(-2, 2, g)], -1)
    labels = rs.randint(0, 10, g)
    return boxes, labels


def test_detr3d_loss_perfect_predictions_near_zero_bbox():
    rs = np.random.RandomState(0)
    g, q, c = 3, 8, 10
    gt_boxes, gt_labels = _mk_gt(rs, g)
    gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
    preds = rs.uniform(-1, 1, (1, 1, q, 10))
    preds[0, 0, :g] = gt_norm
    logits = np.full((1, 1, q, c), -10.0)
    for i in range(g):
        logits[0, 0, i, gt_labels[i]] = 10.0
    out = detr3d_family_loss(jnp.asarray(logits), jnp.asarray(preds),
                             [gt_boxes], [gt_labels])
    assert float(out["loss_bbox"]) < 1e-6
    assert float(out["loss_cls"]) < 1e-2
    # shifted predictions raise the bbox loss
    out2 = detr3d_family_loss(jnp.asarray(logits),
                              jnp.asarray(preds + 0.5), [gt_boxes],
                              [gt_labels])
    assert float(out2["loss_bbox"]) > float(out["loss_bbox"]) + 0.1


def test_detr3d_loss_matches_torch_oracle():
    """Oracle: a line-by-line torch transcription of the reference
    loss_single (joint_head.py:865-932; identical in sparse_head_v4.py:740
    and the other family files) with mmdet FocalLoss / weighted-L1 /
    HungarianAssigner3D semantics (hungarian_assigner_3d.py:29-90,
    match costs FocalLossCost(2.0) + BBox3DL1Cost(0.25) on [:8] with
    code-weight scaling, with_velo=False)."""
    torch = pytest.importorskip("torch")
    from scipy.optimize import linear_sum_assignment

    CW = np.array([2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])

    def norm_t(b):
        return torch.cat([b[..., 0:3], b[..., 3:6].log(),
                          b[..., 6:7].sin(), b[..., 6:7].cos(),
                          b[..., 7:9]], -1)

    def focal_cost(logits, gt_labels, weight=2.0, alpha=0.25, gamma=2.0,
                   eps=1e-12):
        p = logits.sigmoid()
        neg = (1 - alpha) * p.pow(gamma) * (-(1 - p + eps).log())
        pos = alpha * (1 - p).pow(gamma) * (-(p + eps).log())
        return (pos - neg)[:, gt_labels] * weight

    def mmdet_focal(pred, target_lbl, num_classes, avg, weight=2.0,
                    alpha=0.25, gamma=2.0):
        t = torch.nn.functional.one_hot(
            target_lbl, num_classes + 1)[..., :num_classes].float()
        ps = pred.sigmoid()
        pt = (1 - ps) * t + ps * (1 - t)
        fw = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            pred, t, reduction="none")
        return weight * (ce * fw).sum() / avg

    rs = np.random.RandomState(7)
    b, q, c, L = 2, 12, 10, 2
    gt_lists = [_mk_gt(rs, 4), _mk_gt(rs, 2)]
    logits = rs.randn(L, b, q, c).astype(np.float64)
    preds = rs.uniform(-2, 2, (L, b, q, 10)).astype(np.float64)

    # ---- oracle over layers ----
    losses = []
    for li in range(L):
        labels = torch.full((b, q), c, dtype=torch.long)
        tgts = torch.zeros((b, q, 9), dtype=torch.float64)
        wts = torch.zeros((b, q), dtype=torch.float64)
        n_pos = 0
        for i in range(b):
            gt_b = torch.tensor(gt_lists[i][0])
            gt_l = torch.tensor(gt_lists[i][1])
            cls_t = torch.tensor(logits[li, i])
            reg_t = torch.tensor(preds[li, i])
            cc = focal_cost(cls_t, gt_l)
            gt_n = norm_t(gt_b)
            bp = reg_t * torch.tensor(CW)
            gn = gt_n * torch.tensor(CW)
            rc = 0.25 * torch.cdist(bp[:, :8], gn[:, :8], p=1)
            rows, cols = linear_sum_assignment((cc + rc).numpy())
            labels[i, rows] = gt_l[cols]
            tgts[i, rows] = gt_b[cols]
            wts[i, rows] = 1.0
            n_pos += len(rows)
        cls_scores = torch.tensor(logits[li]).reshape(-1, c)
        cls_loss = mmdet_focal(cls_scores, labels.reshape(-1), c,
                               max(n_pos, 1))
        gt_norm = norm_t(tgts).reshape(-1, 10)
        isnotnan = torch.isfinite(gt_norm).all(-1)
        bw = (wts.reshape(-1)[:, None] * torch.tensor(CW))
        diff = (torch.tensor(preds[li]).reshape(-1, 10) - gt_norm).abs() * bw
        bbox_loss = 0.25 * diff[isnotnan].sum() / max(n_pos, 1)
        losses.append((float(cls_loss), float(bbox_loss)))

    out = detr3d_family_loss(
        jnp.asarray(logits), jnp.asarray(preds),
        [g[0] for g in gt_lists], [g[1] for g in gt_lists])
    np.testing.assert_allclose(float(out["loss_cls"]), losses[-1][0],
                               rtol=1e-5)
    np.testing.assert_allclose(float(out["loss_bbox"]), losses[-1][1],
                               rtol=1e-5)
    np.testing.assert_allclose(float(out["d0.loss_cls"]), losses[0][0],
                               rtol=1e-5)
    np.testing.assert_allclose(float(out["d0.loss_bbox"]), losses[0][1],
                               rtol=1e-5)


def test_guided_assignment_pins_queries():
    """SimMOD guided assignment (simmod_head.py:421-431): a pre-assigned
    query keeps its GT even when another query has lower cost."""
    gt_boxes, gt_labels = _mk_gt(np.random.RandomState(1), 1)
    gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
    q = 4
    preds = np.zeros((q, 10))
    preds[0] = gt_norm[0]          # query 0 is the natural match
    logits = np.full((q, 10), -5.0)
    logits[0, gt_labels[0]] = 5.0
    pre = np.full((q,), -1)
    pre[2] = 0                     # but query 2 is pinned to gt 0
    labels, tgts, pos, n_pos, _ = detr3d_layer_targets(
        logits[None], preds[None], [gt_boxes], [gt_labels], 10,
        pre_assigns_list=[pre])
    assert labels[0, 2] == gt_labels[0] and pos[0, 2] == 1.0
    assert pos[0, 0] == 0.0 and n_pos == 1


def test_rotated_iou3d_exact_cases():
    # identical boxes -> 1
    a = np.array([[0, 0, 0, 2, 4, 2, 0.3]])
    np.testing.assert_allclose(rotated_iou_3d(a, a), [1.0], atol=1e-9)
    # axis-aligned half-overlap in x: boxes 4 long, shifted 2 -> inter 1/3
    b1 = np.array([[0, 0, 0, 2, 4, 2, 0.0]])
    b2 = np.array([[2, 0, 0, 2, 4, 2, 0.0]])
    np.testing.assert_allclose(rotated_iou_3d(b1, b2), [2 * 2 * 2 /
                                                        (16 + 16 - 8)],
                               atol=1e-9)
    # rotation by pi is the same box
    b3 = np.array([[0, 0, 0, 2, 4, 2, np.pi]])
    np.testing.assert_allclose(rotated_iou_3d(b1, b3), [1.0], atol=1e-6)
    # z-disjoint -> 0
    b4 = np.array([[0, 0, 5.0, 2, 4, 2, 0.0]])
    np.testing.assert_allclose(rotated_iou_3d(b1, b4), [0.0], atol=1e-9)
    # unit cube vs 45-degree-rotated unit cube: octagon intersection
    # area = 2*(sqrt(2)-1), IoU = a/(2-a)
    c1 = np.array([[0, 0, 0, 1, 1, 1, 0.0]])
    c2 = np.array([[0, 0, 0, 1, 1, 1, np.pi / 4]])
    a_oct = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(rotated_iou_3d(c1, c2),
                               [a_oct / (2 - a_oct)], atol=1e-9)


def test_simmod_iou3d_loss_rewards_calibrated_quality():
    rs = np.random.RandomState(3)
    gt_boxes, gt_labels = _mk_gt(rs, 2)
    gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
    q = 4
    preds = np.tile(gt_norm[:1], (q, 1))
    preds[:2] = gt_norm              # queries 0/1 match exactly -> iou 1
    pos = np.array([[1.0, 1.0, 0.0, 0.0]])
    tgts = np.zeros((1, q, 9))
    tgts[0, :2] = gt_boxes
    good = simmod_iou3d_loss(jnp.asarray(preds[None]),
                             jnp.full((1, q), 8.0), jnp.asarray(tgts),
                             jnp.asarray(pos))
    bad = simmod_iou3d_loss(jnp.asarray(preds[None]),
                            jnp.full((1, q), -8.0), jnp.asarray(tgts),
                            jnp.asarray(pos))
    # exact-match pairs have squashed target 1.0 -> confident logit wins
    assert float(good) < 0.01 < float(bad)


def test_max_iou_assign_mmdet_semantics():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    boxes = np.array([
        [0, 0, 10, 10],      # iou 1 with gt0 -> pos
        [0, 0, 5, 10],       # iou 0.5 with gt0 -> pos at thr 0.5
        [8, 8, 18, 18],      # low iou -> neg
        [100, 100, 110, 110]  # iou 0 -> neg
    ], np.float64)
    a = max_iou_assign(boxes, gt, 0.5, 0.5, 0.5)
    assert list(a) == [1, 1, 0, 0]
    # low-quality positive: gt1's best box claims it via min_pos_iou
    boxes2 = np.array([[18, 18, 28, 28]], np.float64)  # iou ~0.47 w/ gt1
    a2 = max_iou_assign(boxes2, gt, 0.7, 0.7, 0.3)
    assert list(a2) == [2]
    # no gt -> all negative
    assert list(max_iou_assign(boxes2, np.zeros((0, 4)), .5, .5, .5)) == [0]


def test_cascade_roi_loss_perfect_stage():
    rs = np.random.RandomState(5)
    m, p, c = 1, 3, 10
    gt = [np.array([[10, 10, 30, 40], [50, 50, 80, 90]], np.float64)]
    gt_l = [np.array([2, 7])]
    boxes = np.array([[[10, 10, 30, 40], [50, 50, 80, 90],
                       [200, 200, 210, 210]]], np.float64)
    valid = np.ones((m, p))
    # stage predictions: zero deltas (proposals == gt) + confident logits
    cls = np.full((m, p, c + 1), -8.0)
    cls[0, 0, 2] = 8.0
    cls[0, 1, 7] = 8.0
    cls[0, 2, c] = 8.0  # background
    reg = np.zeros((m, p, 4))
    out = cascade_roi_loss(
        [jnp.asarray(cls)], [jnp.asarray(reg)], [boxes], valid, gt, gt_l,
        num_classes=c, stage_cfg=({"pos_iou_thr": 0.5, "neg_iou_thr": 0.5,
                                   "min_pos_iou": 0.5,
                                   "stds": (0.1, 0.1, 0.2, 0.2)},),
        stage_weights=(1.0,))
    assert float(out["s0.loss_bbox"]) < 1e-9
    assert float(out["s0.loss_cls"]) < 1e-3
    # wrong deltas raise the reg loss, stage weights scale it
    reg2 = reg + 1.0
    out2 = cascade_roi_loss(
        [jnp.asarray(cls)], [jnp.asarray(reg2)], [boxes], valid, gt, gt_l,
        num_classes=c, stage_weights=(0.5,))
    assert float(out2["s0.loss_bbox"]) > 0.1
    full = cascade_roi_loss(
        [jnp.asarray(cls)], [jnp.asarray(reg2)], [boxes], valid, gt, gt_l,
        num_classes=c, stage_weights=(1.0,))
    np.testing.assert_allclose(float(out2["s0.loss_bbox"]) * 2,
                               float(full["s0.loss_bbox"]), rtol=1e-6)


def test_bbox2delta_roundtrip_with_decode():
    from panacea_tpu.perception.atss import delta_decode

    rs = np.random.RandomState(9)
    props = rs.uniform(0, 50, (6, 4))
    props[:, 2:] = props[:, :2] + rs.uniform(5, 30, (6, 2))
    gts = props + rs.uniform(-3, 3, (6, 4))
    gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 1.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(props, gts, stds=stds)
    back = np.asarray(delta_decode(jnp.asarray(props), jnp.asarray(deltas),
                                   stds=stds))
    np.testing.assert_allclose(back, gts, atol=1e-5)


def test_cascade_train_loss_through_head():
    """End-to-end: CascadeRoIHead forward -> cascade_train_loss, stage s
    supervised on its own input boxes (cascade_roi_head.py:191-286)."""
    import jax

    from panacea_tpu.perception.cascade_roi import (
        CascadeRoIHead,
        cascade_train_loss,
    )

    m, p, c = 2, 4, 32
    feat = jax.random.normal(jax.random.PRNGKey(0), (m, 8, 16, c))
    boxes = np.tile(np.array([[10, 10, 40, 40], [60, 20, 100, 70],
                              [5, 5, 25, 25], [120, 80, 180, 120]],
                             np.float64)[None], (m, 1, 1))
    valid = np.ones((m, p))
    head = CascadeRoIHead(num_classes=10, num_stages=3)
    params = head.init(jax.random.PRNGKey(2), jnp.asarray(feat),
                       jnp.asarray(boxes), jnp.asarray(valid))["params"]
    outs = head.apply({"params": params}, jnp.asarray(feat),
                      jnp.asarray(boxes), jnp.asarray(valid))
    assert len(outs["stage_reg"]) == 3
    gt = [np.array([[9, 9, 41, 42]], np.float64),
          np.array([[58, 18, 99, 72], [121, 79, 178, 119]], np.float64)]
    gt_l = [np.array([3]), np.array([1, 6])]
    losses = cascade_train_loss(outs, boxes, valid, gt, gt_l,
                                num_classes=10)
    for k in ("s0.loss_cls", "s0.loss_bbox", "s1.loss_cls", "s2.loss_cls",
              "loss"):
        assert k in losses and np.isfinite(float(losses[k])), k
    assert float(losses["loss"]) > 0


def test_family_loss_entry_points_importable():
    from panacea_tpu.perception.joint_head import joint_family_loss
    from panacea_tpu.perception.simmod import simmod_loss
    from panacea_tpu.perception.sparse_head_v3 import sparse_v4_loss

    rs = np.random.RandomState(11)
    gt_boxes, gt_labels = _mk_gt(rs, 2)
    outs = {
        "all_cls_scores": jnp.asarray(rs.randn(2, 1, 6, 10)),
        "all_bbox_preds": jnp.asarray(rs.uniform(-1, 1, (2, 1, 6, 10))),
    }
    for fn in (joint_family_loss, sparse_v4_loss, simmod_loss):
        losses = fn(outs, [gt_boxes], [gt_labels])
        assert np.isfinite(float(losses["loss"]))
        assert "d0.loss_cls" in losses and "loss_bbox" in losses


def test_simmod_loss_iou3d_channel():
    """compute_loss_iou3d reads the quality logit from the LAST bbox channel
    (code_size=11, simmod_head.py:637 pred_ious = bbox_preds[..., -1]); the
    box terms are unchanged vs the 10-channel head."""
    from panacea_tpu.perception.simmod import simmod_loss

    rs = np.random.RandomState(13)
    gt_boxes, gt_labels = _mk_gt(rs, 2)
    preds11 = rs.uniform(-1, 1, (2, 1, 6, 11))
    outs11 = {
        "all_cls_scores": jnp.asarray(rs.randn(2, 1, 6, 10)),
        "all_bbox_preds": jnp.asarray(preds11),
    }
    losses = simmod_loss(outs11, [gt_boxes], [gt_labels],
                         compute_loss_iou3d=True)
    assert "loss_iou3d" in losses and "d0.loss_iou3d" in losses
    assert np.isfinite(float(losses["loss_iou3d"]))
    assert float(losses["loss_iou3d"]) > 0
    # iou3d term is additive on top of the shared box/cls terms
    base = simmod_loss(outs11, [gt_boxes], [gt_labels])
    np.testing.assert_allclose(
        float(losses["loss_cls"]), float(base["loss_cls"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses["loss_bbox"]), float(base["loss_bbox"]), rtol=1e-6)
    # and the box terms ignore the 11th channel entirely
    outs10 = {"all_cls_scores": outs11["all_cls_scores"],
              "all_bbox_preds": jnp.asarray(preds11[..., :10])}
    base10 = simmod_loss(outs10, [gt_boxes], [gt_labels])
    np.testing.assert_allclose(
        float(base["loss"]), float(base10["loss"]), rtol=1e-6)
    # 10-channel preds with the flag on is a config error
    with pytest.raises(AssertionError):
        simmod_loss(outs10, [gt_boxes], [gt_labels],
                    compute_loss_iou3d=True)
