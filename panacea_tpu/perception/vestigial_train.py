"""Training branches for the vestigial head families (VERDICT r3 #3).

The reference ships full target/loss code for every head family even though
no shipped config instantiates the joint/simmod/cascade/sparse-v4 ones. The
mm-stack repeats the SAME DETR-3D Hungarian loss boilerplate in each file —
joint_head.py:754-1101, joint_headv2.py:709-1046, joint_headv3.py:776-1113,
joint_streampetr_head.py:889-1233, sparse_head_v4.py:630-966,
simmod_head.py:389-658 are line-identical modulo the SimMOD deltas — so here
it is ONE shared implementation following this repo's detection-training
pattern (host-side assignment, jitted losses: perception/train_losses.py,
yolox_head.py SimOTA), plus the per-family deltas:

  * SimMOD (simmod_head.py): optional guided assignment (queries carrying a
    proposal's pre-matched GT index are pinned; the reference calls
    ``assigner.restricted_assign`` which is DEFINED NOWHERE in the snapshot —
    dead code — so the semantics here are the documented intent: pinned
    pre-assignments + Hungarian on the rest) and the IoU3D quality branch
    (BCE of the predicted IoU logit against clamp(2*iou3d-0.5, 0, 1),
    simmod_head.py:629-641, 757-762 — exact rotated-BEV x height IoU).
  * Cascade RoI (cascade_roi_head.py:191-286 + mmdet CascadeRoIHead):
    per-stage MaxIoU assignment with rising positive thresholds, delta
    targets against each stage's input boxes, CE + SmoothL1, stage weights.

All host-side target math is NumPy; the loss terms are jax-traceable given
fixed targets (the YOLOX pattern).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.coder import normalize_bbox
from panacea_tpu.perception.train_losses import (
    CODE_WEIGHTS,
    bbox_l1_cost,
    focal_cls_cost,
    hungarian_assign,
    sigmoid_focal_loss,
)


# --------------------------------------------------------------- DETR-3D ----
def detr3d_layer_targets(
    cls_logits: np.ndarray,        # (B, Q, C) logits
    bbox_preds: np.ndarray,        # (B, Q, 10)
    gt_boxes_list: Sequence[np.ndarray],   # per image (G_i, 9)
    gt_labels_list: Sequence[np.ndarray],  # per image (G_i,)
    num_classes: int,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
    pre_assigns_list: Optional[Sequence[np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Host-side per-layer targets (joint_head.py:754-864 _get_target_single
    + get_targets): Hungarian assignment with focal-cls + code-weighted-L1
    costs; returns (labels (B,Q), bbox_targets (B,Q,9), bbox_pos (B,Q),
    num_total_pos, num_total_neg). ``pre_assigns_list``: per image (Q,)
    GT index or -1 — SimMOD guided assignment pins those queries and
    Hungarian-matches only the remaining queries to the remaining GTs."""
    b, q = cls_logits.shape[:2]
    labels = np.full((b, q), num_classes, dtype=np.int64)
    bbox_targets = np.zeros((b, q, 9), dtype=np.float64)
    bbox_pos = np.zeros((b, q), dtype=np.float64)
    num_pos = 0
    for i in range(b):
        gt_b = np.asarray(gt_boxes_list[i], np.float64).reshape(-1, 9)
        gt_l = np.asarray(gt_labels_list[i]).reshape(-1)
        g = len(gt_l)
        if g == 0:
            continue
        rows_pin, cols_pin = [], []
        free_q = np.arange(q)
        free_g = np.arange(g)
        if pre_assigns_list is not None:
            pa = np.asarray(pre_assigns_list[i]).reshape(-1)
            seen = set()
            for qi in range(q):
                gi = int(pa[qi])
                if 0 <= gi < g and gi not in seen:
                    rows_pin.append(qi)
                    cols_pin.append(gi)
                    seen.add(gi)
            free_q = np.setdiff1d(free_q, np.asarray(rows_pin, int))
            free_g = np.setdiff1d(free_g, np.asarray(cols_pin, int))
        if len(free_g) and len(free_q):
            gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_b[free_g])))
            cost = (cls_weight * np.asarray(focal_cls_cost(
                        jnp.asarray(cls_logits[i][free_q]),
                        jnp.asarray(gt_l[free_g])))
                    + bbox_weight * np.asarray(bbox_l1_cost(
                        jnp.asarray(bbox_preds[i][free_q]),
                        jnp.asarray(gt_norm))))
            r, c = hungarian_assign(cost)
            rows = np.concatenate([np.asarray(rows_pin, int), free_q[r]])
            cols = np.concatenate([np.asarray(cols_pin, int), free_g[c]])
        else:
            rows = np.asarray(rows_pin, int)
            cols = np.asarray(cols_pin, int)
        labels[i, rows] = gt_l[cols]
        bbox_targets[i, rows] = gt_b[cols]
        bbox_pos[i, rows] = 1.0
        num_pos += len(rows)
    return labels, bbox_targets, bbox_pos, num_pos, b * q - num_pos


def detr3d_layer_loss(
    cls_logits: jnp.ndarray,     # (B, Q, C)
    bbox_preds: jnp.ndarray,     # (B, Q, 10)
    labels: jnp.ndarray,         # (B, Q)
    bbox_targets: jnp.ndarray,   # (B, Q, 9)
    bbox_pos: jnp.ndarray,       # (B, Q)
    num_pos: float,
    num_neg: float,
    num_classes: int,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
    bg_cls_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder layer's (loss_cls, loss_bbox) — joint_head.py:865-932
    loss_single exactly: focal sum / max(num_pos + bg_w*num_neg, 1);
    code-weighted L1 of pred[:10] vs normalize_bbox(targets) over rows whose
    NORMALIZED target is fully finite, / max(num_pos, 1)."""
    cls_af = jnp.maximum(num_pos * 1.0 + num_neg * bg_cls_weight, 1.0)
    cls_l = sigmoid_focal_loss(cls_logits, labels, num_classes).sum() / cls_af

    gt_norm = normalize_bbox(bbox_targets)                   # (B, Q, 10)
    isnotnan = jnp.isfinite(gt_norm).all(-1)                 # (B, Q)
    cw = jnp.asarray(CODE_WEIGHTS)
    w = bbox_pos[..., None] * cw                             # (B, Q, 10)
    diff = jnp.abs(bbox_preds[..., :10]
                   - jnp.where(isnotnan[..., None], gt_norm, 0.0)) * w
    diff = diff * isnotnan[..., None]
    bbox_l = diff.sum() / jnp.maximum(num_pos, 1.0)
    return (jnp.nan_to_num(cls_weight * cls_l),
            jnp.nan_to_num(bbox_weight * bbox_l))


def detr3d_family_loss(
    all_cls_scores: jnp.ndarray,   # (L, B, Q, C)
    all_bbox_preds: jnp.ndarray,   # (L, B, Q, 10)
    gt_boxes_list: Sequence[np.ndarray],
    gt_labels_list: Sequence[np.ndarray],
    num_classes: int = 10,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
    bg_cls_weight: float = 0.0,
    pre_assigns_list: Optional[Sequence[np.ndarray]] = None,
    iou3d_logits: Optional[jnp.ndarray] = None,   # (L, B, Q) SimMOD quality
    iou3d_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Full multi-layer loss (joint_head.py:992-1101 loss and the identical
    v2/v3/joint_streampetr/sparse_v4/simmod copies): per-decoder-layer
    loss_single; keys 'loss_cls'/'loss_bbox' for the last layer and
    'd{i}.loss_*' for the rest, plus 'loss_iou3d' when SimMOD's quality
    branch is enabled. 'loss' carries the total."""
    n_layers = int(all_cls_scores.shape[0])
    out: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros(())
    cls_np = np.asarray(jax.lax.stop_gradient(all_cls_scores))
    reg_np = np.asarray(jax.lax.stop_gradient(all_bbox_preds))
    for li in range(n_layers):
        labels, tgts, pos, n_pos, n_neg = detr3d_layer_targets(
            cls_np[li], reg_np[li], gt_boxes_list, gt_labels_list,
            num_classes, cls_weight, bbox_weight,
            pre_assigns_list=pre_assigns_list)
        cls_l, bbox_l = detr3d_layer_loss(
            all_cls_scores[li], all_bbox_preds[li], jnp.asarray(labels),
            jnp.asarray(tgts), jnp.asarray(pos), n_pos, n_neg, num_classes,
            cls_weight, bbox_weight, bg_cls_weight)
        prefix = "" if li == n_layers - 1 else f"d{li}."
        out[f"{prefix}loss_cls"] = cls_l
        out[f"{prefix}loss_bbox"] = bbox_l
        total = total + cls_l + bbox_l
        if iou3d_logits is not None:
            iou_l = simmod_iou3d_loss(
                all_bbox_preds[li], iou3d_logits[li], jnp.asarray(tgts),
                jnp.asarray(pos)) * iou3d_weight
            out[f"{prefix}loss_iou3d"] = iou_l
            total = total + iou_l
    out["loss"] = total
    return out


# ------------------------------------------------------------ SimMOD IoU3D -
def _rect_corners(cx, cy, w, l, yaw):
    """BEV rectangle corners (4, 2); w along y, l along x pre-rotation
    (nuScenes box convention as consumed by the iou3d calculator)."""
    dx, dy = l / 2.0, w / 2.0
    # counter-clockwise (the clipper's inside test requires CCW)
    base = np.array([[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return base @ rot.T + np.array([cx, cy])


def _convex_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip convex polygon ``subject`` by convex ``clip``
    (both (N, 2) counter-clockwise)."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        inp, out = out, []
        if not inp:
            break

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= -1e-12

        for j, cur in enumerate(inp):
            prev = inp[j - 1]
            if inside(cur):
                if not inside(prev):
                    out.append(_seg_x(prev, cur, a, b))
                out.append(cur)
            elif inside(prev):
                out.append(_seg_x(prev, cur, a, b))
    return np.asarray(out) if out else np.zeros((0, 2))


def _seg_x(p, q, a, b):
    """Intersection of segment pq with infinite line ab."""
    d1 = q - p
    d2 = b - a
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < 1e-12:
        return q
    t = ((a[0] - p[0]) * d2[1] - (a[1] - p[1]) * d2[0]) / denom
    return p + t * d1


def _poly_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) -
                           np.dot(y, np.roll(x, -1))))


def rotated_iou_3d(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Exact paired 3D IoU of (N, >=7) boxes (cx, cy, cz_bottom, w, l, h,
    yaw): rotated-BEV polygon intersection x vertical overlap — the mmcv
    iou3d_calculator semantics simmod_head.py:757-762 consumes (it shifts
    gravity-center z to bottom z first; callers here do the same)."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    out = np.zeros(len(pred))
    for i, (p, t) in enumerate(zip(pred, target)):
        pa = _rect_corners(p[0], p[1], p[3], p[4], p[6])
        ta = _rect_corners(t[0], t[1], t[3], t[4], t[6])
        inter2d = _poly_area(_convex_clip(pa, ta))
        zlo = max(p[2], t[2])
        zhi = min(p[2] + p[5], t[2] + t[5])
        inter = inter2d * max(zhi - zlo, 0.0)
        vol_p = p[3] * p[4] * p[5]
        vol_t = t[3] * t[4] * t[5]
        union = vol_p + vol_t - inter
        out[i] = inter / union if union > 0 else 0.0
    return out


def simmod_iou3d_targets(bbox_preds: np.ndarray, bbox_targets: np.ndarray,
                         bbox_pos: np.ndarray) -> np.ndarray:
    """Host-side IoU targets (simmod_head.py:629-637): decode the predicted
    codes, shift both pred and target gravity-center z to bottom z, take the
    exact rotated 3D IoU and squash clamp(2*iou - 0.5, 0, 1). Rows without a
    matched GT get target 0 (they are masked out of the BCE anyway)."""
    from panacea_tpu.perception.coder import denormalize_bbox

    b, q = bbox_pos.shape
    out = np.zeros((b, q), np.float64)
    dec = np.asarray(denormalize_bbox(jnp.asarray(bbox_preds[..., :10])))
    for i in range(b):
        pos = np.nonzero(bbox_pos[i] > 0)[0]
        if not len(pos):
            continue
        p = dec[i][pos].copy()
        t = bbox_targets[i][pos].copy()
        p[:, 2] -= 0.5 * p[:, 5]
        t[:, 2] -= 0.5 * t[:, 5]
        iou = rotated_iou_3d(p, t)
        out[i, pos] = np.clip(2.0 * iou - 0.5, 0.0, 1.0)
    return out


def simmod_iou3d_loss(bbox_preds: jnp.ndarray, iou_logits: jnp.ndarray,
                      bbox_targets: jnp.ndarray, bbox_pos: jnp.ndarray
                      ) -> jnp.ndarray:
    """BCE(pred IoU logit, squashed exact IoU) over matched rows
    (simmod_head.py:629-641, iou3d_criterion = BCEWithLogitsLoss)."""
    tgt = jnp.asarray(simmod_iou3d_targets(
        np.asarray(jax.lax.stop_gradient(bbox_preds)),
        np.asarray(jax.lax.stop_gradient(bbox_targets)),
        np.asarray(jax.lax.stop_gradient(bbox_pos))))
    logit = iou_logits
    bce = (jnp.maximum(logit, 0) - logit * tgt
           + jnp.log1p(jnp.exp(-jnp.abs(logit))))
    n = jnp.maximum(bbox_pos.sum(), 1.0)
    return jnp.nan_to_num((bce * bbox_pos).sum() / n)


# --------------------------------------------------------- cascade RoI -----
def iou_xyxy_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(P, 4) x (G, 4) pairwise IoU."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1],
                                                           0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1],
                                                           0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def max_iou_assign(boxes: np.ndarray, gt: np.ndarray,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float) -> np.ndarray:
    """mmdet MaxIoUAssigner (gt_max_assign_all=True): returns per-box
    assignment: -1 ignore, 0 negative, g+1 positive-to-gt-g."""
    p = len(boxes)
    assigned = np.full((p,), -1, dtype=np.int64)
    if len(gt) == 0:
        return np.zeros((p,), dtype=np.int64)
    ious = iou_xyxy_matrix(boxes, gt)          # (P, G)
    max_iou = ious.max(axis=1)
    argmax = ious.argmax(axis=1)
    assigned[max_iou < neg_iou_thr] = 0
    pos = max_iou >= pos_iou_thr
    assigned[pos] = argmax[pos] + 1
    # low-quality positives: each gt claims boxes sharing its best iou
    gt_max = ious.max(axis=0)
    for g in range(len(gt)):
        if gt_max[g] >= min_pos_iou:
            assigned[np.abs(ious[:, g] - gt_max[g]) < 1e-9] = g + 1
    return assigned


def bbox2delta(proposals: np.ndarray, gt: np.ndarray,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(0.1, 0.1, 0.2, 0.2)) -> np.ndarray:
    """mmdet DeltaXYWHBBoxCoder.encode."""
    pw = proposals[:, 2] - proposals[:, 0]
    ph = proposals[:, 3] - proposals[:, 1]
    px = proposals[:, 0] + pw * 0.5
    py = proposals[:, 1] + ph * 0.5
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gx = gt[:, 0] + gw * 0.5
    gy = gt[:, 1] + gh * 0.5
    d = np.stack([(gx - px) / np.maximum(pw, 1e-6),
                  (gy - py) / np.maximum(ph, 1e-6),
                  np.log(np.maximum(gw, 1e-6) / np.maximum(pw, 1e-6)),
                  np.log(np.maximum(gh, 1e-6) / np.maximum(ph, 1e-6))], -1)
    return (d - np.asarray(means)) / np.asarray(stds)


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


# per-stage mmdet cascade train cfg (pos thr rises; stds shrink)
CASCADE_STAGE_CFG = (
    {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
     "stds": (0.1, 0.1, 0.2, 0.2)},
    {"pos_iou_thr": 0.6, "neg_iou_thr": 0.6, "min_pos_iou": 0.6,
     "stds": (0.05, 0.05, 0.1, 0.1)},
    {"pos_iou_thr": 0.7, "neg_iou_thr": 0.7, "min_pos_iou": 0.7,
     "stds": (0.033, 0.033, 0.067, 0.067)},
)
CASCADE_STAGE_WEIGHTS = (1.0, 0.5, 0.25)


def cascade_roi_loss(
    stage_cls: Sequence[jnp.ndarray],    # per stage (M, P, C+1) logits
    stage_reg: Sequence[jnp.ndarray],    # per stage (M, P, 4) deltas
    stage_input_boxes: Sequence[np.ndarray],  # per stage (M, P, 4) inputs
    valid: np.ndarray,                   # (M, P) proposal validity
    gt_boxes: Sequence[np.ndarray],      # per image (G_i, 4) xyxy
    gt_labels: Sequence[np.ndarray],     # per image (G_i,)
    num_classes: int,
    stage_cfg=CASCADE_STAGE_CFG,
    stage_weights=CASCADE_STAGE_WEIGHTS,
) -> Dict[str, jnp.ndarray]:
    """mmdet CascadeRoIHead.forward_train (cascade_roi_head.py:191-286 +
    BBoxHead.loss): per stage, MaxIoU-assign the STAGE'S OWN input boxes
    (refined by the previous stage), CE over C+1 softmax classes averaged
    over sampled rois, SmoothL1 on deltas of positives averaged the same
    way, each scaled by the stage weight. Padded/invalid proposals are
    excluded from both assignment and averaging."""
    out: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros(())
    m, p = valid.shape
    for si, (cls, reg, boxes_in) in enumerate(
            zip(stage_cls, stage_reg, stage_input_boxes)):
        cfg = stage_cfg[min(si, len(stage_cfg) - 1)]
        lw = stage_weights[min(si, len(stage_weights) - 1)]
        labels = np.full((m, p), num_classes, dtype=np.int64)  # background
        deltas = np.zeros((m, p, 4))
        pos_w = np.zeros((m, p))
        for i in range(m):
            ok = valid[i] > 0
            gt_b = np.asarray(gt_boxes[i], np.float64).reshape(-1, 4)
            gt_l = np.asarray(gt_labels[i]).reshape(-1)
            if ok.sum() == 0:
                continue
            assigned = max_iou_assign(
                np.asarray(boxes_in[i][ok], np.float64), gt_b,
                cfg["pos_iou_thr"], cfg["neg_iou_thr"], cfg["min_pos_iou"])
            idx = np.nonzero(ok)[0]
            pos = assigned > 0
            labels[i, idx[pos]] = gt_l[assigned[pos] - 1]
            if pos.any():
                deltas[i, idx[pos]] = bbox2delta(
                    np.asarray(boxes_in[i][ok], np.float64)[pos],
                    gt_b[assigned[pos] - 1], stds=cfg["stds"])
                pos_w[i, idx[pos]] = 1.0
        n_valid = max(float(valid.sum()), 1.0)
        logp = jax.nn.log_softmax(cls, axis=-1)
        ce = -jnp.take_along_axis(
            logp, jnp.asarray(labels)[..., None], axis=-1)[..., 0]
        cls_l = (ce * jnp.asarray(valid)).sum() / n_valid
        reg_l = (smooth_l1(reg - jnp.asarray(deltas)).sum(-1)
                 * jnp.asarray(pos_w)).sum() / n_valid
        out[f"s{si}.loss_cls"] = lw * cls_l
        out[f"s{si}.loss_bbox"] = lw * reg_l
        total = total + lw * (cls_l + reg_l)
    out["loss"] = total
    return out
