"""FocalHead 2D training: HungarianAssigner2D targets + the five losses.

TPU-native rebuild of the reference FocalHead training recipe
(metrics/.../dense_heads/focal_head.py:196-540,
core/bbox/assigners/hungarian_assigner_2d.py:20-158,
models/losses/iou_loss.py:7-69):

- per-image Hungarian matching over four costs — focal classification
  cost, L1 on normalized cxcywh boxes, GIoU on pixel xyxy boxes, and an
  L1 centers2d cost (hungarian_assigner_2d.py:127-145) — run host-side
  with scipy like the 3D assigner (perception/train.py pattern);
- Quality Focal Loss for classification (the reference's
  ``loss_cls2d(cls_scores, (labels, iou_score))`` tuple target,
  focal_head.py:339-341), GIoU via the IOULoss math, L1 box and centers2d
  losses, and a Gaussian-focal centerness loss against per-image
  center heatmaps (``_get_heatmap_single``'s min-ltrb radius,
  focal_head.py:372-385).

All matching is NumPy; the losses are jnp so they can sit inside a jit
via pure_callback-produced targets, mirroring perception/train.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- geometry
def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    axis=-1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1],
                    axis=-1)


def _giou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise GIoU, a (N,4) x b (M,4) -> (N,M)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    etl = np.minimum(a[:, None, :2], b[None, :, :2])
    ebr = np.maximum(a[:, None, 2:], b[None, :, 2:])
    ewh = np.clip(ebr - etl, 0, None)
    enclose = ewh[..., 0] * ewh[..., 1] + 1e-7
    iou = inter / (union + 1e-7)
    return iou - (enclose - union) / enclose


def _focal_cost(logits: np.ndarray, gt_labels: np.ndarray,
                alpha: float = 0.25, gamma: float = 2.0,
                eps: float = 1e-12) -> np.ndarray:
    """mmdet FocalLossCost: (N, C) logits x (M,) labels -> (N, M)."""
    p = 1 / (1 + np.exp(-logits))
    neg = -np.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -np.log(p + eps) * alpha * (1 - p) ** gamma
    return (pos - neg)[:, gt_labels]


def hungarian_assign_2d(
    cls_logits: np.ndarray,
    bbox_pred: np.ndarray,
    pred_centers2d: np.ndarray,
    gt_bboxes: np.ndarray,
    gt_labels: np.ndarray,
    centers2d: np.ndarray,
    img_hw: Tuple[int, int],
    cls_weight: float = 2.0,
    reg_weight: float = 5.0,
    iou_weight: float = 2.0,
    centers2d_weight: float = 10.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """One image (hungarian_assigner_2d.py:58-158). cls_logits (Q, C);
    bbox_pred (Q, 4) normalized cxcywh; pred_centers2d (Q, 2) normalized;
    gt_bboxes (G, 4) pixel xyxy; centers2d (G, 2) pixel.
    Returns (pos_mask (Q,) bool, assigned_gt (Q,) int)."""
    from scipy.optimize import linear_sum_assignment

    q = bbox_pred.shape[0]
    pos = np.zeros((q,), bool)
    asg = np.zeros((q,), np.int64)
    if len(gt_bboxes) == 0:
        return pos, asg
    h, w = img_hw
    factor = np.array([w, h, w, h], np.float64)
    cost = cls_weight * _focal_cost(cls_logits, gt_labels)
    gt_norm = xyxy_to_cxcywh(gt_bboxes / factor)
    cost += reg_weight * np.abs(
        bbox_pred[:, None] - gt_norm[None]).sum(-1)
    boxes_px = cxcywh_to_xyxy(bbox_pred) * factor
    cost += iou_weight * (-_giou_xyxy(boxes_px, gt_bboxes))
    cost += centers2d_weight * np.abs(
        pred_centers2d[:, None] - (centers2d / factor[:2])[None]).sum(-1)
    cost = np.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
    rows, cols = linear_sum_assignment(cost)
    pos[rows] = True
    asg[rows] = cols
    return pos, asg


# ------------------------------------------------------------------ losses
def clip_sigmoid(x, eps: float = 1e-4):
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


def quality_focal_loss(logits, labels, scores, num_classes: int,
                       beta: float = 2.0):
    """mmdet QualityFocalLoss (sigmoid form): negatives pulled to 0,
    positives to their (detached) IoU quality score. logits (Q, C),
    labels (Q,) with num_classes = background, scores (Q,)."""
    p = jax.nn.sigmoid(logits)
    # all-negative base term
    ce_neg = -jnp.log(jnp.clip(1 - p, 1e-12))
    loss = ce_neg * p ** beta
    pos = labels < num_classes
    onehot = jax.nn.one_hot(jnp.where(pos, labels, 0), num_classes)
    q = scores[:, None] * onehot
    ce = -(q * jnp.log(jnp.clip(p, 1e-12))
           + (1 - q) * jnp.log(jnp.clip(1 - p, 1e-12)))
    loss_pos = ce * jnp.abs(q - p) ** beta
    return jnp.where((pos[:, None] & (onehot > 0)), loss_pos, loss)


def gaussian_focal_loss(pred, gaussian_target, alpha: float = 2.0,
                        gamma: float = 4.0):
    """mmdet GaussianFocalLoss (CornerNet): pred in (0,1)."""
    eps = 1e-12
    pos_w = (gaussian_target == 1).astype(pred.dtype)
    neg_w = (1 - gaussian_target) ** gamma
    pos = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos_w
    neg = -jnp.log(1 - pred + eps) * pred ** alpha * neg_w * (1 - pos_w)
    return pos + neg


def gaussian_2d(radius: int, sigma: float) -> np.ndarray:
    m = radius
    y, x = np.ogrid[-m:m + 1, -m:m + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_heatmap_gaussian(heatmap: np.ndarray, center, radius: int,
                          k: float = 1.0) -> np.ndarray:
    """centerpoint draw_heatmap_gaussian (max-composited gaussian splat)."""
    diameter = 2 * radius + 1
    gaussian = gaussian_2d(radius, sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    hh, wk = heatmap.shape
    if not (0 <= x < wk and 0 <= y < hh):
        return heatmap
    left, right = min(x, radius), min(wk - x, radius + 1)
    top, bottom = min(y, radius), min(hh - y, radius + 1)
    masked = heatmap[y - top:y + bottom, x - left:x + right]
    g = gaussian[radius - top:radius + bottom, radius - left:radius + right]
    np.maximum(masked, g * k, out=masked)
    return heatmap


def heatmap_target(centers2d: np.ndarray, gt_bboxes: np.ndarray,
                   img_hw: Tuple[int, int], stride: int = 16) -> np.ndarray:
    """Per-image centerness heatmap (focal_head.py:372-385): radius =
    ceil(min ltrb extent / 16), clamped to >= 1."""
    h, w = img_hw
    hm = np.zeros((h // stride, w // stride), np.float64)
    for c, b in zip(centers2d, gt_bboxes):
        bound = [c[0] - b[0], c[1] - b[1], b[2] - c[0], b[3] - c[1]]
        r = max(1.0, np.ceil(min(bound) / 16))
        draw_heatmap_gaussian(hm, c / stride, radius=int(r))
    return hm


def pad_gt_2d(gt_bboxes_list, gt_labels_list, centers2d_list):
    """Per-image lists -> padded (N, G, .) arrays with -1 label padding."""
    n = len(gt_labels_list)
    g = max([1] + [len(np.asarray(l).reshape(-1)) for l in gt_labels_list])
    gtb = np.zeros((n, g, 4), np.float32)
    gtl = np.full((n, g), -1, np.int32)
    c2d = np.zeros((n, g, 2), np.float32)
    for i in range(n):
        k = len(np.asarray(gt_labels_list[i]).reshape(-1))
        if k:
            gtb[i, :k] = np.asarray(gt_bboxes_list[i],
                                    np.float32).reshape(-1, 4)
            gtl[i, :k] = np.asarray(gt_labels_list[i]).reshape(-1)
            c2d[i, :k] = np.asarray(centers2d_list[i],
                                    np.float32).reshape(-1, 2)
    return gtb, gtl, c2d


def make_focal_targets_host(img_hw: Tuple[int, int], num_classes: int,
                            lw: Dict[str, float]):
    """Host target builder (the assigner + heatmap half of
    focal_head.py:258-371), pure_callback-compatible: padded (N, G, .) gt
    arrays in, fixed-shape target arrays out."""
    h, w = img_hw
    factor = np.array([w, h, w, h], np.float64)

    def host(cls_logits, bbox_preds, cen_preds, gtb_all, gtl_all, c2d_all):
        cls_logits = np.asarray(cls_logits, np.float64)
        bbox_preds = np.asarray(bbox_preds, np.float64)
        cen_preds = np.asarray(cen_preds, np.float64)
        n_img, q = cls_logits.shape[:2]
        labels = np.full((n_img, q), num_classes, np.int32)
        bbox_t = np.zeros((n_img, q, 4), np.float32)
        bbox_w = np.zeros((n_img, q, 4), np.float32)
        cen_t = np.zeros((n_img, q, 2), np.float32)
        heatmaps = np.zeros((n_img, h // 16, w // 16), np.float32)
        n_pos = 0
        for i in range(n_img):
            valid = np.asarray(gtl_all[i]) >= 0
            gtb = np.asarray(gtb_all[i], np.float64)[valid]
            gtl = np.asarray(gtl_all[i], np.int64)[valid]
            c2d = np.asarray(c2d_all[i], np.float64)[valid]
            heatmaps[i] = heatmap_target(c2d, gtb, img_hw)
            pos, asg = hungarian_assign_2d(
                cls_logits[i], bbox_preds[i], cen_preds[i], gtb, gtl, c2d,
                img_hw, cls_weight=lw["cls"], reg_weight=lw["bbox"],
                iou_weight=lw["iou"], centers2d_weight=lw["centers2d"])
            n_pos += int(pos.sum())
            if pos.any():
                labels[i][pos] = gtl[asg[pos]]
                bbox_t[i][pos] = xyxy_to_cxcywh(gtb / factor)[asg[pos]]
                bbox_w[i][pos] = 1.0
                cen_t[i][pos] = (c2d / factor[:2])[asg[pos]]
        return labels, bbox_t, bbox_w, cen_t, heatmaps, np.float32(n_pos)

    return host


def focal_head_loss(
    outs: Dict[str, jnp.ndarray],
    gt_bboxes,
    gt_labels,
    centers2d,
    img_hw: Tuple[int, int],
    num_classes: int = 10,
    loss_weights: Dict[str, float] = None,
) -> Dict[str, jnp.ndarray]:
    """Whole-head loss (focal_head.py:196-371). outs: FocalHead.__call__
    dict (Q = H*W tokens per image); gt_bboxes/gt_labels/centers2d either
    per-image lists (padded here; eager call sites) or already-padded
    (N, G, .) arrays with -1 label padding (jit call sites). The Hungarian
    assignment + heatmap targets run host-side through jax.pure_callback on
    detached predictions, so the returned losses are DIFFERENTIABLE w.r.t.
    the head outputs under jit/grad (the perception/train.py pattern).
    Default loss weights mirror the reference StreamPETR focal configs
    (cls 2.0, bbox 5.0, iou 2.0, centers2d 10.0, centerness 2.0)."""
    lw = {"cls": 2.0, "bbox": 5.0, "iou": 2.0, "centers2d": 10.0,
          "centerness": 2.0}
    lw.update(loss_weights or {})
    h, w = img_hw
    if isinstance(gt_labels, (list, tuple)):
        gt_bboxes, gt_labels, centers2d = pad_gt_2d(
            gt_bboxes, gt_labels, centers2d)
    host = make_focal_targets_host(img_hw, num_classes, lw)

    n_img, q = outs["enc_cls_scores"].shape[:2]
    jl, jt, jw_, jc, hm, n_pos = jax.pure_callback(
        host,
        (
            jax.ShapeDtypeStruct((n_img, q), jnp.int32),
            jax.ShapeDtypeStruct((n_img, q, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_img, q, 4), jnp.float32),
            jax.ShapeDtypeStruct((n_img, q, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_img, h // 16, w // 16), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
        ),
        jax.lax.stop_gradient(outs["enc_cls_scores"]),
        jax.lax.stop_gradient(outs["enc_bbox_preds"]),
        jax.lax.stop_gradient(outs["pred_centers2d"]),
        jnp.asarray(gt_bboxes, jnp.float32),
        jnp.asarray(gt_labels, jnp.int32),
        jnp.asarray(centers2d, jnp.float32),
    )
    jl = jl.reshape(-1)
    jt = jt.reshape(-1, 4)
    jw_ = jw_.reshape(-1, 4)
    jc = jc.reshape(-1, 2)
    avg = jnp.maximum(n_pos, 1.0)

    logits = outs["enc_cls_scores"].reshape(-1, num_classes)
    preds = outs["enc_bbox_preds"].reshape(-1, 4)
    cenp = outs["pred_centers2d"].reshape(-1, 2)

    # pixel-space GIoU (IOULoss giou mode on converted boxes)
    fac = jnp.asarray([w, h, w, h], jnp.float32)
    px = _giou_xyxy_jnp(_cxcywh_to_xyxy_jnp(preds) * fac,
                        _cxcywh_to_xyxy_jnp(jt) * fac)
    loss_iou = ((1.0 - px) * jw_[:, 0]).sum() / avg * lw["iou"]
    iou_q = jax.lax.stop_gradient(_iou_xyxy_aligned_jnp(
        _cxcywh_to_xyxy_jnp(jt) * fac, _cxcywh_to_xyxy_jnp(preds) * fac))

    cls_avg = jnp.maximum(n_pos, 1.0)  # bg_cls_weight=0 (focal_head.py:83)
    loss_cls = quality_focal_loss(
        logits, jl, iou_q, num_classes).sum() / cls_avg * lw["cls"]

    cen = clip_sigmoid(outs["centerness"].reshape(n_img, -1, 1))
    loss_centerness = gaussian_focal_loss(
        cen, hm.reshape(n_img, -1, 1)).sum() / avg * lw["centerness"]

    loss_bbox = (jnp.abs(preds - jt) * jw_).sum() / avg * lw["bbox"]
    loss_centers2d = (jnp.abs(cenp - jc) * jw_[:, :2]).sum() / avg \
        * lw["centers2d"]
    return {
        "enc_loss_cls": loss_cls,
        "enc_loss_bbox": loss_bbox,
        "enc_loss_iou": loss_iou,
        "centers2d_losses": loss_centers2d,
        "centerness_losses": loss_centerness,
    }


def _cxcywh_to_xyxy_jnp(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def _iou_xyxy_aligned_jnp(a, b):
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(br - tl, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = ((a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
            + (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]) - inter)
    return inter / (area + 1e-7)


def _giou_xyxy_jnp(a, b):
    """Aligned GIoU (IOULoss math on xyxy, iou_loss.py:14-55)."""
    inter_iou = _iou_xyxy_aligned_jnp(a, b)
    etl = jnp.minimum(a[..., :2], b[..., :2])
    ebr = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.clip(ebr - etl, 0)
    enclose = ewh[..., 0] * ewh[..., 1] + 1e-7
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(br - tl, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = ((a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
            + (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]) - inter)
    return inter_iou - (enclose - area) / enclose
