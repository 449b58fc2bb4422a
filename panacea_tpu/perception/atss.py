"""ATSS 2D auxiliary detection head.

Equivalent of the reference's ATSSTaskHead (metrics/.../dense_heads/
atss_head.py; config streampetr_r50_atss_512x256_window.py:63-99): per-level
anchor grids (octave scale 8, ratio 1.0, strides 8..128), 4 stacked convs,
cls/bbox/centerness branches, ATSS assignment (top-k by center distance,
mean+std IoU threshold), DeltaXYWH box coding, focal + GIoU + centerness
losses. Used as a 2D training auxiliary for the multi-view detector.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

STRIDES = (8, 16, 32, 64, 128)


class ATSSHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: list of (B, H_l, W_l, C). Returns per-level
        (cls (B,H,W,num_classes), bbox (B,H,W,4), centerness (B,H,W,1))."""
        outs = []
        # branch convs shared across levels (mmdet convention)
        cls_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"cls_conv{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"reg_conv{i}")
            for i in range(self.stacked_convs)
        ]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1,
                          dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="cls_out")
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                          name="reg_out")
        ctr_out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                          name="ctr_out")
        scales = self.param("scales", nn.initializers.ones,
                            (self.num_levels,))
        for li, f in enumerate(feats):
            c = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            r = f
            for conv in reg_convs:
                r = nn.relu(conv(r))
            outs.append((
                cls_out(c),
                reg_out(r) * scales[li],
                ctr_out(r),
            ))
        return outs


def fpn_shapes(img_hw: Tuple[int, int],
               num_levels: int = 5) -> List[Tuple[int, int]]:
    """Per-level feature shapes the FPN actually produces: stride-8 first
    output, then ceil-halving (extra levels come from stride-2 convs, so a
    1x2 map halves to 1x1, not 0x1)."""
    h = -(-img_hw[0] // 8)
    w = -(-img_hw[1] // 8)
    out = []
    for _ in range(num_levels):
        out.append((h, w))
        h = max(1, -(-h // 2))
        w = max(1, -(-w // 2))
    return out


def grid_anchors(shapes_hw: List[Tuple[int, int]], strides=STRIDES,
                 octave_base_scale: float = 8.0) -> List[np.ndarray]:
    """Single square anchor per location (ratio 1.0, 1 scale/octave):
    side = stride * octave_base_scale, centered at (x, y)*stride — mmdet
    AnchorGenerator's default center_offset=0. (the reference ATSS config
    window.py:69-74 does not override it), which converted 2D-pretrained
    checkpoints' learned deltas assume."""
    out = []
    for (h, w), s in zip(shapes_hw, strides):
        side = s * octave_base_scale
        ys = np.arange(h) * float(s)
        xs = np.arange(w) * float(s)
        cx, cy = np.meshgrid(xs, ys)
        anchors = np.stack(
            [cx - side / 2, cy - side / 2, cx + side / 2, cy + side / 2],
            axis=-1,
        ).reshape(-1, 4)
        out.append(anchors)
    return out


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M) IoU."""
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    return inter / np.maximum(union, 1e-9)


def atss_assign(anchors_per_level: List[np.ndarray], gt_boxes: np.ndarray,
                topk: int = 9) -> np.ndarray:
    """ATSS: per gt, candidate top-k closest anchors per level; threshold =
    mean + std of candidate IoUs; positives must have center inside the gt.
    Returns assigned gt index per anchor (-1 = background)."""
    anchors = np.concatenate(anchors_per_level, axis=0)
    n = len(anchors)
    g = len(gt_boxes)
    assigned = np.full(n, -1, dtype=np.int64)
    if g == 0:
        return assigned
    ious = iou_xyxy(anchors, gt_boxes)  # (N, G)
    centers = np.stack(
        [(anchors[:, 0] + anchors[:, 2]) / 2,
         (anchors[:, 1] + anchors[:, 3]) / 2], axis=1)
    gt_centers = np.stack(
        [(gt_boxes[:, 0] + gt_boxes[:, 2]) / 2,
         (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2], axis=1)
    dists = np.linalg.norm(centers[:, None] - gt_centers[None], axis=-1)

    candidate_idx = []
    start = 0
    for a in anchors_per_level:
        lvl_n = len(a)
        k = min(topk, lvl_n)
        d = dists[start:start + lvl_n]
        idx = np.argsort(d, axis=0)[:k] + start  # (k, G)
        candidate_idx.append(idx)
        start += lvl_n
    candidate_idx = np.concatenate(candidate_idx, axis=0)  # (k*L, G)

    best_iou = np.full(n, -1.0)
    for gi in range(g):
        cand = candidate_idx[:, gi]
        cious = ious[cand, gi]
        thr = cious.mean() + cious.std()
        ok = cious >= thr
        # center-in-gt constraint
        cx, cy = centers[cand, 0], centers[cand, 1]
        inside = (
            (cx > gt_boxes[gi, 0]) & (cx < gt_boxes[gi, 2])
            & (cy > gt_boxes[gi, 1]) & (cy < gt_boxes[gi, 3])
        )
        pos = cand[ok & inside]
        for ai in pos:
            if ious[ai, gi] > best_iou[ai]:
                best_iou[ai] = ious[ai, gi]
                assigned[ai] = gi
    return assigned


def delta_encode(anchors, gt, means=(0, 0, 0, 0), stds=(0.1, 0.1, 0.2, 0.2)):
    """DeltaXYWHBBoxCoder.encode."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    gw = np.maximum(gt[:, 2] - gt[:, 0], 1e-6)
    gh = np.maximum(gt[:, 3] - gt[:, 1], 1e-6)
    gx = (gt[:, 0] + gt[:, 2]) / 2
    gy = (gt[:, 1] + gt[:, 3]) / 2
    d = np.stack([(gx - ax) / aw, (gy - ay) / ah,
                  np.log(gw / aw), np.log(gh / ah)], axis=1)
    return (d - np.asarray(means)) / np.asarray(stds)


def delta_decode(anchors, deltas, means=(0, 0, 0, 0),
                 stds=(0.1, 0.1, 0.2, 0.2)):
    d = deltas * jnp.asarray(stds) + jnp.asarray(means)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    cx = d[:, 0] * aw + ax
    cy = d[:, 1] * ah + ay
    w = jnp.exp(jnp.clip(d[:, 2], -10, 4)) * aw
    h = jnp.exp(jnp.clip(d[:, 3], -10, 4)) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def giou_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU for (N,4) xyxy pairs."""
    area_p = jnp.clip(pred[:, 2] - pred[:, 0], 0) * jnp.clip(
        pred[:, 3] - pred[:, 1], 0)
    area_g = jnp.clip(gt[:, 2] - gt[:, 0], 0) * jnp.clip(
        gt[:, 3] - gt[:, 1], 0)
    lt = jnp.maximum(pred[:, :2], gt[:, :2])
    rb = jnp.minimum(pred[:, 2:], gt[:, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0), axis=1)
    union = area_p + area_g - inter
    iou = inter / jnp.maximum(union, 1e-9)
    lt_c = jnp.minimum(pred[:, :2], gt[:, :2])
    rb_c = jnp.maximum(pred[:, 2:], gt[:, 2:])
    area_c = jnp.prod(jnp.clip(rb_c - lt_c, 0), axis=1)
    giou = iou - (area_c - union) / jnp.maximum(area_c, 1e-9)
    return 1.0 - giou


def centerness_target(anchors: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) at anchor centers."""
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    l = ax - gt[:, 0]
    r = gt[:, 2] - ax
    t = ay - gt[:, 1]
    b = gt[:, 3] - ay
    lr = np.minimum(l, r) / np.maximum(np.maximum(l, r), 1e-9)
    tb = np.minimum(t, b) / np.maximum(np.maximum(t, b), 1e-9)
    return np.sqrt(np.clip(lr * tb, 0, None))
