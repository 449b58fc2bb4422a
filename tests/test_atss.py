"""ATSS aux-head tests: anchors, assignment, delta coding roundtrip, GIoU,
centerness, head forward."""

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.atss import (
    ATSSHead,
    atss_assign,
    centerness_target,
    delta_decode,
    delta_encode,
    giou_loss,
    grid_anchors,
    iou_xyxy,
)


def test_grid_anchors():
    anchors = grid_anchors([(4, 8), (2, 4)], strides=(8, 16))
    assert anchors[0].shape == (32, 4)
    assert anchors[1].shape == (8, 4)
    a0 = anchors[0][0]
    # first anchor centered at (0, 0) with side 64 (mmdet center_offset=0)
    np.testing.assert_allclose([(a0[0]+a0[2])/2, (a0[1]+a0[3])/2], [0, 0])
    np.testing.assert_allclose(a0[2]-a0[0], 64)
    a1 = anchors[0][1]  # next column shifts by one stride
    np.testing.assert_allclose([(a1[0]+a1[2])/2, (a1[1]+a1[3])/2], [8, 0])


def test_iou_identity():
    boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], dtype=float)
    ious = iou_xyxy(boxes, boxes)
    np.testing.assert_allclose(np.diag(ious), 1.0)
    assert 0 < ious[0, 1] < 1


def test_atss_assigns_anchor_on_gt():
    anchors = grid_anchors([(8, 16), (4, 8)], strides=(8, 16))
    gt = np.array([[20.0, 20.0, 60.0, 60.0]])
    assigned = atss_assign(anchors, gt, topk=9)
    assert (assigned == 0).sum() > 0
    # positives' centers lie inside the gt
    allc = np.concatenate(anchors)
    pos = allc[assigned == 0]
    cx = (pos[:, 0] + pos[:, 2]) / 2
    cy = (pos[:, 1] + pos[:, 3]) / 2
    assert ((cx > 20) & (cx < 60) & (cy > 20) & (cy < 60)).all()


def test_delta_roundtrip():
    anchors = np.array([[0, 0, 64, 64], [32, 32, 96, 96]], dtype=float)
    gt = np.array([[5, 8, 60, 70], [30, 40, 100, 90]], dtype=float)
    deltas = delta_encode(anchors, gt)
    rec = np.asarray(delta_decode(jnp.asarray(anchors), jnp.asarray(deltas)))
    np.testing.assert_allclose(rec, gt, atol=1e-4)


def test_giou_loss_zero_for_identical():
    b = jnp.asarray([[0.0, 0, 10, 10]])
    assert float(giou_loss(b, b)[0]) < 1e-6
    far = jnp.asarray([[100.0, 100, 110, 110]])
    assert float(giou_loss(b, far)[0]) > 1.0


def test_centerness():
    anchors = np.array([[20, 20, 40, 40]], dtype=float)  # center (30,30)
    gt = np.array([[20, 20, 40, 40]], dtype=float)  # centered -> 1.0
    np.testing.assert_allclose(centerness_target(anchors, gt), 1.0)
    gt_off = np.array([[29, 29, 60, 60]], dtype=float)
    assert centerness_target(anchors, gt_off)[0] < 0.5


def test_atss_head_forward():
    head = ATSSHead(num_classes=10, feat_channels=32, stacked_convs=2,
                    num_levels=2)
    feats = [jnp.zeros((1, 8, 16, 32)), jnp.zeros((1, 4, 8, 32))]
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    outs = head.apply({"params": params}, feats)
    assert len(outs) == 2
    cls, bbox, ctr = outs[0]
    assert cls.shape == (1, 8, 16, 10)
    assert bbox.shape == (1, 8, 16, 4)
    assert ctr.shape == (1, 8, 16, 1)
