"""FocalHead 2D training recipe: assigner recovery, loss formulas, heatmap
targets, and an end-to-end loss through the flax FocalHead."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from panacea_tpu.perception.focal_train import (  # noqa: E402
    cxcywh_to_xyxy,
    draw_heatmap_gaussian,
    focal_head_loss,
    gaussian_focal_loss,
    heatmap_target,
    hungarian_assign_2d,
    quality_focal_loss,
    xyxy_to_cxcywh,
)


def test_hungarian_2d_recovers_obvious_assignment():
    rs = np.random.RandomState(0)
    q, c, g = 12, 10, 3
    hw = (256, 704)
    gt = np.array([[10, 10, 60, 50], [100, 30, 200, 120],
                   [300, 200, 400, 250]], np.float64)
    gtl = np.array([1, 4, 7])
    c2d = (gt[:, :2] + gt[:, 2:]) / 2
    factor = np.array([hw[1], hw[0], hw[1], hw[0]], np.float64)
    bbox_pred = rs.uniform(0.3, 0.7, (q, 4))
    # plant near-perfect predictions at queries 2, 5, 9
    planted = [2, 5, 9]
    bbox_pred[planted] = xyxy_to_cxcywh(gt / factor)
    cen_pred = rs.uniform(0, 1, (q, 2))
    cen_pred[planted] = c2d / factor[:2]
    logits = np.full((q, c), -4.0)
    for qi, gi in zip(planted, range(g)):
        logits[qi, gtl[gi]] = 4.0
    pos, asg = hungarian_assign_2d(logits, bbox_pred, cen_pred, gt, gtl,
                                   c2d, hw)
    assert pos.sum() == g
    assert set(np.nonzero(pos)[0]) == set(planted)
    for qi, gi in zip(planted, range(g)):
        assert asg[qi] == gi

    # no gt -> empty assignment
    pos0, _ = hungarian_assign_2d(logits, bbox_pred, cen_pred,
                                  np.zeros((0, 4)), np.zeros((0,), np.int64),
                                  np.zeros((0, 2)), hw)
    assert not pos0.any()


def test_quality_focal_loss_formula():
    # negatives: plain focal pull to zero, scaled by p^beta
    logits = jnp.asarray([[2.0, -3.0]])
    labels = jnp.asarray([2])  # background (num_classes=2)
    scores = jnp.asarray([0.0])
    loss = quality_focal_loss(logits, labels, scores, num_classes=2)
    p = jax.nn.sigmoid(2.0)
    expect = -np.log(1 - p) * p ** 2
    np.testing.assert_allclose(loss[0, 0], expect, rtol=1e-5)
    # positive at its label column: pulled toward the quality score
    labels = jnp.asarray([0])
    scores = jnp.asarray([jax.nn.sigmoid(2.0)])  # p == q -> zero loss
    loss = quality_focal_loss(logits, labels, scores, num_classes=2)
    np.testing.assert_allclose(float(loss[0, 0]), 0.0, atol=1e-6)


def test_gaussian_focal_and_heatmap():
    hm = np.zeros((16, 16))
    draw_heatmap_gaussian(hm, (8.0, 8.0), radius=3)
    assert hm[8, 8] == 1.0 and hm[8, 9] < 1.0
    # off-canvas center is a no-op
    before = hm.copy()
    draw_heatmap_gaussian(hm, (-5.0, 8.0), radius=3)
    np.testing.assert_array_equal(hm, before)

    gt = np.array([[100.0, 100.0, 160.0, 180.0]])
    c = np.array([[130.0, 140.0]])
    target = heatmap_target(c, gt, (256, 704))
    assert target.shape == (16, 44)
    assert target[140 // 16, 130 // 16] == 1.0

    # perfect prediction at the peak -> ~zero loss there
    pred = jnp.asarray(np.clip(target, 1e-4, 1 - 1e-4))
    l = gaussian_focal_loss(pred, jnp.asarray(target))
    assert float(l[140 // 16, 130 // 16]) < 1e-6


def test_focal_head_loss_end_to_end_and_ranks_fit():
    from panacea_tpu.perception.focal_head import FocalHead

    rs = np.random.RandomState(1)
    b, n, h, w, c = 1, 2, 16, 44, 32
    head = FocalHead(embed_dims=c, num_classes=10)
    feat = jnp.asarray(rs.randn(b, n, h, w, c), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feat)["params"]
    outs = head.apply({"params": params}, feat)

    hw = (h * 16, w * 16)
    gts = [np.array([[32.0, 32.0, 160.0, 160.0]]), np.zeros((0, 4))]
    gtl = [np.array([3]), np.zeros((0,), np.int64)]
    c2d = [np.array([[96.0, 96.0]]), np.zeros((0, 2))]
    losses = focal_head_loss(outs, gts, gtl, c2d, hw)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # planting the GT into the predictions must reduce bbox+centers losses
    q = h * w
    outs2 = dict(outs)
    factor = np.array([hw[1], hw[0], hw[1], hw[0]], np.float64)
    planted = np.asarray(outs["enc_bbox_preds"]).copy()
    planted[0, 5] = xyxy_to_cxcywh(gts[0] / factor)[0]
    cen2 = np.asarray(outs["pred_centers2d"]).copy()
    cen2[0, 5] = c2d[0][0] / factor[:2]
    cls2 = np.asarray(outs["enc_cls_scores"]).copy()
    cls2[0, 5, 3] = 8.0
    outs2["enc_bbox_preds"] = jnp.asarray(planted)
    outs2["pred_centers2d"] = jnp.asarray(cen2)
    outs2["enc_cls_scores"] = jnp.asarray(cls2)
    losses2 = focal_head_loss(outs2, gts, gtl, c2d, hw)
    assert float(losses2["enc_loss_bbox"]) < float(losses["enc_loss_bbox"])
    assert float(losses2["centers2d_losses"]) < float(
        losses["centers2d_losses"])
    assert float(losses2["enc_loss_iou"]) < float(losses["enc_loss_iou"])


def test_focal_head_loss_differentiable_under_grad_jit():
    """The 2D recipe must actually train: grads of the total loss w.r.t.
    the FocalHead params are finite and nonzero under jit (the assignment
    rides pure_callback on detached predictions)."""
    from panacea_tpu.perception.focal_head import FocalHead
    from panacea_tpu.perception.focal_train import pad_gt_2d

    rs = np.random.RandomState(3)
    b, n, h, w, c = 1, 2, 8, 22, 32
    head = FocalHead(embed_dims=c, num_classes=10)
    feat = jnp.asarray(rs.randn(b, n, h, w, c), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feat)["params"]
    hw = (h * 16, w * 16)
    gtb, gtl, c2d = pad_gt_2d(
        [np.array([[16.0, 16.0, 100.0, 90.0]]), np.zeros((0, 4))],
        [np.array([2]), np.zeros((0,), np.int64)],
        [np.array([[58.0, 53.0]]), np.zeros((0, 2))])

    @jax.jit
    def total(p):
        outs = head.apply({"params": p}, feat)
        losses = focal_head_loss(outs, gtb, gtl, c2d, hw)
        return sum(losses.values())

    g = jax.grad(total)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_box_conversions_roundtrip():
    rs = np.random.RandomState(2)
    xyxy = np.sort(rs.rand(5, 4), axis=-1)[:, [0, 1, 2, 3]]
    np.testing.assert_allclose(cxcywh_to_xyxy(xyxy_to_cxcywh(xyxy)), xyxy,
                               atol=1e-12)
