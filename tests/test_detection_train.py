"""Detection training loss tests: focal loss math, Hungarian matching,
end-to-end loss on tiny head outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_detector_train_step_reduces_loss():
    import optax

    from panacea_tpu.perception.detector import StreamPETRWindow
    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2, pc_range=PC,
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

    rs = np.random.RandomState(0)
    g = 3
    gt_boxes = np.zeros((g, 9))
    gt_boxes[:, :2] = rs.uniform(-20, 20, (g, 2))
    gt_boxes[:, 3:6] = rs.uniform(1, 3, (g, 3))
    gt_labels = rs.randint(0, 10, g)

    opt = optax.adam(1e-3)
    _, train_step = make_detector_train(model, opt, PC)
    state = init_detector_train(model, opt, params)
    losses = []
    for _ in range(4):
        state, loss = train_step(state, imgs, data_seq, gt_boxes, gt_labels)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
