"""Detection training loss tests: focal loss math, Hungarian matching,
end-to-end loss on tiny head outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.train_losses import (
    detection_loss_single,
    focal_cls_cost,
    hungarian_assign,
    sigmoid_focal_loss,
)

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_focal_loss_background_low_for_negative_logits():
    logits = jnp.full((4, 10), -10.0)
    labels = jnp.full((4,), 10)  # background
    l = sigmoid_focal_loss(logits, labels, 10)
    assert float(l.max()) < 1e-3
    # confident wrong prediction is penalized
    logits = logits.at[0, 3].set(10.0)
    l2 = sigmoid_focal_loss(logits, labels, 10)
    assert float(l2[0]) > 1.0


def test_hungarian_assign_prefers_low_cost():
    cost = np.array([[0.1, 5.0], [5.0, 0.2], [3.0, 3.0]])
    rows, cols = hungarian_assign(cost)
    pairs = dict(zip(rows.tolist(), cols.tolist()))
    assert pairs[0] == 0 and pairs[1] == 1


def test_detection_loss_perfect_predictions_small():
    rs = np.random.RandomState(0)
    g = 5
    gt_boxes = np.zeros((g, 9))
    gt_boxes[:, :2] = rs.uniform(-30, 30, (g, 2))
    gt_boxes[:, 3:6] = rs.uniform(1, 3, (g, 3))
    gt_boxes[:, 6] = rs.uniform(-3, 3, g)
    gt_labels = rs.randint(0, 10, g)

    q = 20
    logits = np.full((q, 10), -8.0, dtype=np.float32)
    preds = np.zeros((q, 10), dtype=np.float32)
    preds[:, 3:6] = 0.5
    # first g queries predict the gt perfectly
    from panacea_tpu.perception.coder import normalize_bbox

    gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
    preds[:g] = gt_norm
    for i in range(g):
        logits[i, gt_labels[i]] = 8.0

    out = detection_loss_single(
        jnp.asarray(logits), jnp.asarray(preds), gt_boxes, gt_labels, PC
    )
    assert float(out["loss_bbox"]) < 1e-3
    assert float(out["loss_cls"]) < 0.05

    # scrambled predictions cost more
    out_bad = detection_loss_single(
        jnp.asarray(logits),
        jnp.asarray(preds + rs.normal(0, 1, preds.shape).astype(np.float32)),
        gt_boxes, gt_labels, PC,
    )
    assert float(out_bad["loss_bbox"]) > float(out["loss_bbox"])


def test_detection_loss_empty_gt():
    out = detection_loss_single(
        jnp.zeros((8, 10)), jnp.zeros((8, 10)),
        np.zeros((0, 9)), np.zeros((0,), dtype=int), PC,
    )
    assert np.isfinite(float(out["loss_cls"]))
    assert float(out["loss_bbox"]) == 0.0
