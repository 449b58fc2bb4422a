"""Detection training losses for the StreamPETR head.

Equivalents of the reference's HungarianAssigner3D (scipy matching,
metrics/.../core/bbox/assigners/hungarian_assigner_3d.py), sigmoid focal
classification loss (mmdet FocalLoss, gamma 2 / alpha 0.25) and the
code-weighted L1 box regression loss (config: loss_cls weight 2.0, loss_bbox
0.25, code_weights [2,2,1,1,1,1,1,1,1,1]).

Assignment runs on host (scipy) between jitted cost and loss computations —
the same split the reference uses (CPU linear_sum_assignment).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.coder import normalize_bbox

CODE_WEIGHTS = (2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)


def sigmoid_focal_loss(logits, labels, num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25):
    """labels == num_classes means background. Per-element sum over classes."""
    onehot = jax.nn.one_hot(labels, num_classes)
    p = jax.nn.sigmoid(logits)
    ce = -(onehot * jnp.log(jnp.clip(p, 1e-8))
           + (1 - onehot) * jnp.log(jnp.clip(1 - p, 1e-8)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return (alpha_t * (1 - p_t) ** gamma * ce).sum(-1)


def focal_cls_cost(logits, gt_labels, gamma: float = 2.0, alpha: float = 0.25,
                   eps: float = 1e-12):
    """mmdet FocalLossCost: cost[q, g] for assigning query q to gt g."""
    p = jax.nn.sigmoid(logits)  # (Q, C)
    neg = (1 - alpha) * p**gamma * -jnp.log(1 - p + eps)
    pos = alpha * (1 - p) ** gamma * -jnp.log(p + eps)
    return (pos - neg)[:, gt_labels]  # (Q, G)


def bbox_l1_cost(bbox_preds, gt_boxes_norm, pc_range=None):
    """mmdet BBox3DL1Cost under HungarianAssigner3D's code-weight scaling
    (hungarian_assigner_3d.py:59-67): both pred and normalized gt are
    multiplied by match_costs=code_weights; xyz stays raw meters
    (normalize_bbox does not pc-normalize), with_velo=False restricts the
    cost to the first 8 dims (cx..rot_cos). ``pc_range`` is unused (kept
    for callers)."""
    mc = jnp.asarray(CODE_WEIGHTS)[:8]
    p = bbox_preds[..., :8] * mc
    g = gt_boxes_norm[..., :8] * mc
    return jnp.abs(p[:, None] - g[None, :]).sum(-1)


def hungarian_assign(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost)


def detection_loss_single(
    cls_logits: jnp.ndarray,   # (Q, C)
    bbox_preds: jnp.ndarray,   # (Q, 10) xyz denormalized, rest raw
    gt_boxes: np.ndarray,      # (G, 9) (cx,cy,cz,w,l,h,yaw,vx,vy)
    gt_labels: np.ndarray,     # (G,)
    pc_range: Sequence[float],
    num_classes: int = 10,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
) -> Dict[str, jnp.ndarray]:
    """One sample, one decoder layer. Host-side Hungarian matching on the
    detached cost, then jittable losses on the matched pairs."""
    q = cls_logits.shape[0]
    g = len(gt_labels)
    if g == 0:
        labels = jnp.full((q,), num_classes)
        cls_l = sigmoid_focal_loss(cls_logits, labels, num_classes).mean()
        return {"loss_cls": cls_weight * cls_l,
                "loss_bbox": jnp.zeros(())}

    gt_norm = jnp.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
    cost = (
        cls_weight * focal_cls_cost(cls_logits, jnp.asarray(gt_labels))
        + bbox_weight * bbox_l1_cost(bbox_preds, gt_norm, pc_range)
    )
    rows, cols = hungarian_assign(np.asarray(jax.lax.stop_gradient(cost)))

    labels = np.full((q,), num_classes, dtype=np.int64)
    labels[rows] = np.asarray(gt_labels)[cols]
    cls_l = sigmoid_focal_loss(
        cls_logits, jnp.asarray(labels), num_classes
    ).sum() / max(g, 1)

    cw = jnp.asarray(CODE_WEIGHTS)
    pred_m = bbox_preds[jnp.asarray(rows)]
    gt_m = gt_norm[jnp.asarray(cols)]
    # compare in normalized-code space but with real-xyz preds (the head
    # already denormalized xyz; gt_norm has raw xyz) — both raw here
    diff = jnp.abs(pred_m - gt_m) * cw
    # ignore nan velocity targets
    diff = jnp.where(jnp.isfinite(diff), diff, 0.0)
    bbox_l = diff.sum() / max(g, 1)
    return {"loss_cls": cls_weight * cls_l, "loss_bbox": bbox_weight * bbox_l}
