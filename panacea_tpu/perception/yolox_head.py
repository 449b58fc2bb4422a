"""YOLOXHeadCustom — 2D auxiliary detection head (YOLOX family).

TPU-native rebuild of the reference
metrics/StreamPETR/projects/mmdet3d_plugin/models/dense_heads/
yolox_head.py:21-615: per-level (non-shared) conv towers with
BN(eps 1e-3)+Swish, 1x1 predictors for class/bbox/objectness/centers2d
offset, point priors at stride offsets (MlvlPointGenerator offset=0,
:116), exp-decoded boxes (:382-392), and SimOTA dynamic-k assignment for
training (:534-607, mmdet SimOTAAssigner semantics). Used by the
focal/joint-head detector family as the 2D proposal branch.

TPU shape: the forward is pure per-level convs (jit-friendly); the SimOTA
assignment is host-side NumPy (like atss_assign / the Hungarian callback —
data-dependent top-k loops don't belong in XLA), producing fixed-shape
per-prior targets that yolox_loss consumes inside jit.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.resnet import FrozenBatchNorm

Dtype = Any


def mlvl_priors(featmap_sizes: Sequence[Tuple[int, int]],
                strides: Sequence[int]) -> np.ndarray:
    """(P, 4) [cx, cy, stride_w, stride_h] point priors, offset 0
    (MlvlPointGenerator(strides, offset=0), yolox_head.py:116)."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        p = np.stack([xs.reshape(-1) * s, ys.reshape(-1) * s,
                      np.full(h * w, s), np.full(h * w, s)], -1)
        out.append(p)
    return np.concatenate(out, 0).astype(np.float32)


def bbox_decode(priors: np.ndarray, bbox_preds) :
    """xy offset * stride + prior, wh = exp * stride -> xyxy
    (yolox_head.py:382-392)."""
    xys = bbox_preds[..., :2] * priors[:, 2:] + priors[:, :2]
    whs = jnp.exp(bbox_preds[..., 2:]) * priors[:, 2:]
    return jnp.stack([
        xys[..., 0] - whs[..., 0] / 2, xys[..., 1] - whs[..., 1] / 2,
        xys[..., 0] + whs[..., 0] / 2, xys[..., 1] + whs[..., 1] / 2,
    ], -1)


def centers2d_decode(priors: np.ndarray, centers2d):
    """(yolox_head.py:394-396)."""
    return centers2d[..., :2] * priors[:, 2:] + priors[:, :2]


class YOLOXHead(nn.Module):
    """Multi-level forward. feats: list of (B, H_l, W_l, C). Returns the
    reference outs dict with FLATTENED (B, P, .) predictions (the torch
    head keeps per-level lists and flattens in loss(); flattening here
    keeps one fixed-shape pytree)."""

    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Sequence[int] = (8, 16, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Dict[str, Any]:
        assert len(feats) == len(self.strides)
        cls_all, bbox_all, obj_all, ctr_all = [], [], [], []
        for li, x in enumerate(feats):
            b = x.shape[0]

            def tower(name, h):
                for i in range(self.stacked_convs):
                    h = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"{name}{i}_conv")(h)
                    # reference norm_cfg: BN eps 1e-3 (yolox_head.py:61);
                    # eval-mode stats (batch-stat updates during 2D-aux
                    # training are NOT replicated — stats convert from
                    # checkpoints and mean/var remain plain params here)
                    h = FrozenBatchNorm(dtype=self.dtype, eps=1e-3,
                                        name=f"{name}{i}_bn")(h)
                    h = nn.swish(h)
                return h

            cls_feat = tower(f"l{li}_cls", x)
            reg_feat = tower(f"l{li}_reg", x)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name=f"l{li}_conv_cls")(cls_feat)
            reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                          name=f"l{li}_conv_reg")(reg_feat)
            obj = nn.Conv(1, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name=f"l{li}_conv_obj")(reg_feat)
            ctr = nn.Conv(2, (1, 1), dtype=self.dtype,
                          name=f"l{li}_conv_centers2d")(reg_feat)
            cls_all.append(cls.reshape(b, -1, self.num_classes))
            bbox_all.append(reg.reshape(b, -1, 4))
            obj_all.append(obj.reshape(b, -1))
            ctr_all.append(ctr.reshape(b, -1, 2))
        return {
            "enc_cls_scores": jnp.concatenate(cls_all, 1),
            "enc_bbox_preds": jnp.concatenate(bbox_all, 1),
            "objectnesses": jnp.concatenate(obj_all, 1),
            "pred_centers2d_offset": jnp.concatenate(ctr_all, 1),
            "topk_indexes": None,
        }


# ---------------------------------------------------------------- training

def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    ar_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), -1)
    ar_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), -1)
    return inter / np.maximum(ar_a[:, None] + ar_b[None] - inter, 1e-9)


def simota_assign(
    cls_preds: np.ndarray,      # (P, C) logits
    objectness: np.ndarray,     # (P,) logits
    priors: np.ndarray,         # (P, 4) cx,cy,sw,sh
    decoded: np.ndarray,        # (P, 4) xyxy
    gt_boxes: np.ndarray,       # (G, 4) xyxy
    gt_labels: np.ndarray,      # (G,)
    center_radius: float = 2.5,
    candidate_topk: int = 10,
    iou_weight: float = 3.0,
    cls_weight: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """mmdet SimOTAAssigner: returns (assigned_gt (P,) -1=bg, max_iou (P,)).

    Candidates = priors whose OFFSET center (prior + stride/2,
    yolox_head.py:573-575) lies in a gt box or its center-radius window;
    cost = BCE(cls*obj vs onehot) + 3*(-log IoU) + inf outside candidates;
    dynamic k per gt from the top-10 IoU sum; prior conflicts resolved by
    min cost."""
    p = len(priors)
    g = len(gt_boxes)
    assigned = np.full(p, -1, np.int64)
    max_iou = np.zeros(p, np.float32)
    if g == 0:
        return assigned, max_iou
    centers = priors[:, :2] + priors[:, 2:] * 0.5
    in_box = ((centers[:, None, 0] >= gt_boxes[None, :, 0])
              & (centers[:, None, 0] <= gt_boxes[None, :, 2])
              & (centers[:, None, 1] >= gt_boxes[None, :, 1])
              & (centers[:, None, 1] <= gt_boxes[None, :, 3]))
    gt_c = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
    r = center_radius * priors[:, 2:3]
    in_ctr = ((np.abs(centers[:, None, 0] - gt_c[None, :, 0]) <= r)
              & (np.abs(centers[:, None, 1] - gt_c[None, :, 1]) <= r))
    is_cand = (in_box | in_ctr).any(1)
    cand_mask_pg = in_box & in_ctr               # (P, G) "in both" bonus
    if not is_cand.any():
        return assigned, max_iou
    cand = np.where(is_cand)[0]

    ious = _iou_xyxy(decoded[cand], gt_boxes)    # (Nc, G)
    iou_cost = -np.log(ious + 1e-8)
    score = (1 / (1 + np.exp(-cls_preds[cand]))
             * 1 / (1 + np.exp(-objectness[cand, None])))
    onehot = np.eye(cls_preds.shape[1], dtype=np.float32)[
        np.clip(gt_labels, 0, None)]             # (G, C)
    sq = np.sqrt(np.clip(score, 1e-8, 1 - 1e-8))
    bce = -(onehot[None] * np.log(sq[:, None])
            + (1 - onehot[None]) * np.log(1 - sq[:, None])).sum(-1)
    cost = (cls_weight * bce + iou_weight * iou_cost
            + 100000.0 * (~cand_mask_pg[cand]))

    k = min(candidate_topk, len(cand))
    topk_ious = -np.sort(-ious, axis=0)[:k]
    dynamic_k = np.clip(topk_ious.sum(0).astype(np.int64), 1, None)
    match = np.zeros_like(cost, dtype=bool)
    for gi in range(g):
        idx = np.argsort(cost[:, gi])[: dynamic_k[gi]]
        match[idx, gi] = True
    multi = match.sum(1) > 1
    if multi.any():
        best = cost[multi].argmin(1)
        match[multi] = False
        match[np.where(multi)[0], best] = True
    pos = match.any(1)
    gt_idx = match.argmax(1)
    assigned[cand[pos]] = gt_idx[pos]
    max_iou[cand[pos]] = ious[pos, gt_idx[pos]]
    return assigned, max_iou


def yolox_targets(
    priors: np.ndarray,
    cls_preds: np.ndarray,       # (B, P, C) logits (host copies)
    objectness: np.ndarray,      # (B, P)
    decoded: np.ndarray,         # (B, P, 4)
    gt_boxes: Sequence[np.ndarray],
    gt_labels: Sequence[np.ndarray],
    centers2d: Sequence[np.ndarray] = None,
    num_classes: int = 10,
):
    """Batch SimOTA targets (yolox_head.py:534-607): per-prior
    (pos_mask (B,P), cls_target (B,P,C) iou-weighted onehot,
    obj_target (B,P), bbox_target (B,P,4) xyxy, l1_target (B,P,4),
    centers2d_target (B,P,2), num_pos)."""
    b, p = objectness.shape
    pos_mask = np.zeros((b, p), np.float32)
    cls_t = np.zeros((b, p, num_classes), np.float32)
    obj_t = np.zeros((b, p), np.float32)
    bbox_t = np.zeros((b, p, 4), np.float32)
    l1_t = np.zeros((b, p, 4), np.float32)
    ctr_t = np.zeros((b, p, 2), np.float32)
    total = 0.0
    for bi in range(b):
        gb, gl = np.asarray(gt_boxes[bi]), np.asarray(gt_labels[bi])
        if len(gb) == 0:
            continue
        assigned, ious = simota_assign(
            cls_preds[bi], objectness[bi], priors, decoded[bi], gb, gl)
        pos = assigned >= 0
        if not pos.any():
            continue
        gi = assigned[pos]
        pos_mask[bi, pos] = 1.0
        obj_t[bi, pos] = 1.0
        cls_t[bi, pos] = (np.eye(num_classes, dtype=np.float32)[gl[gi]]
                          * ious[pos][:, None])
        bbox_t[bi, pos] = gb[gi]
        # l1 target in prior-normalized cxcywh-log space (:606-611)
        cxcy = (gb[gi, :2] + gb[gi, 2:]) / 2
        wh = gb[gi, 2:] - gb[gi, :2]
        pr = priors[pos]
        l1_t[bi, pos, :2] = (cxcy - pr[:, :2]) / pr[:, 2:]
        l1_t[bi, pos, 2:] = np.log(wh / pr[:, 2:] + 1e-8)
        if centers2d is not None and len(centers2d[bi]):
            c2 = np.asarray(centers2d[bi])[gi]
            ctr_t[bi, pos] = (c2 - pr[:, :2]) / pr[:, 2:]
        total += float(pos.sum())
    return pos_mask, cls_t, obj_t, bbox_t, l1_t, ctr_t, np.float32(total)


def yolox_loss(outs: Dict[str, jnp.ndarray], priors: np.ndarray, targets,
               use_l1: bool = False) -> Dict[str, jnp.ndarray]:
    """IoU(square) + obj/cls BCE + centers2d L1 (+optional box L1), each
    sum-reduced / num_pos (yolox_head.py:509-529, loss cfgs :64-81)."""
    import optax

    pos_mask, cls_t, obj_t, bbox_t, l1_t, ctr_t, num_pos = [
        jnp.asarray(t) for t in targets]
    n = jnp.maximum(num_pos, 1.0)
    pri = jnp.asarray(priors)

    decoded = bbox_decode(pri, outs["enc_bbox_preds"])
    tl = jnp.maximum(decoded[..., :2], bbox_t[..., :2])
    br = jnp.minimum(decoded[..., 2:], bbox_t[..., 2:])
    wh = jnp.clip(br - tl, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.prod(jnp.clip(decoded[..., 2:] - decoded[..., :2], 0), -1)
    area_g = jnp.prod(jnp.clip(bbox_t[..., 2:] - bbox_t[..., :2], 0), -1)
    iou = inter / jnp.maximum(area_p + area_g - inter, 1e-9)
    loss_iou = 5.0 * ((1 - iou**2) * pos_mask).sum() / n  # mode='square'

    loss_obj = optax.sigmoid_binary_cross_entropy(
        outs["objectnesses"], obj_t).sum() / n
    loss_cls = (optax.sigmoid_binary_cross_entropy(
        outs["enc_cls_scores"], cls_t).sum(-1) * pos_mask).sum() / n
    loss_ctr = (jnp.abs(outs["pred_centers2d_offset"] - ctr_t).sum(-1)
                * pos_mask).sum() / n
    out = {"enc_loss_cls": loss_cls, "enc_loss_iou": loss_iou,
           "enc_loss_obj": loss_obj, "enc_loss_centers2d": loss_ctr}
    if use_l1:
        out["enc_loss_bbox"] = (jnp.abs(
            outs["enc_bbox_preds"] - l1_t).sum(-1) * pos_mask).sum() / n
    return out
