"""CustomCascadeRoIHead — multi-stage 2D RoI refinement.

TPU-native rebuild of metrics/.../dense_heads/cascade_roi_head.py:16-630
(mmdet CascadeRoIHead with Shared2FCBBoxHead stages): each stage RoIAligns
the current boxes, runs shared FCs, predicts per-class scores + box deltas,
and the decoded boxes seed the next stage; inference averages the stage
class scores (cascade_roi_head.py simple_test convention).

TPU shape: fixed-shape padded proposals (M, P, 4) + validity mask; the
ragged per-image lists and NMS of the reference live outside the jit
boundary (host-side, like the coder)."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.atss import delta_decode
from panacea_tpu.perception.joint_head import roi_align

Dtype = Any


class Shared2FCBBoxHead(nn.Module):
    """mmdet Shared2FCBBoxHead: flatten 7x7 RoI -> fc(1024) x2 ->
    cls (C+1 softmax logits) + class-agnostic box deltas."""

    num_classes: int = 10
    fc_out_channels: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rois: jnp.ndarray):
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="fc_cls")(x)
        reg = nn.Dense(4, dtype=self.dtype, name="fc_reg")(x)
        return cls, reg


class CascadeRoIHead(nn.Module):
    num_classes: int = 10
    num_stages: int = 3
    feat_stride: int = 16
    roi_size: Tuple[int, int] = (7, 7)
    sampling_ratio: int = 2  # mmcv RoIAlign grid (2x2 samples/bin)
    # per-stage target stds (mmdet cascade defaults)
    stage_stds: Sequence[Sequence[float]] = (
        (0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, boxes: jnp.ndarray,
                 valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """feat: (M, H, W, C); boxes: (M, P, 4) image-pixel xyxy;
        valid: (M, P). Returns dict with per-stage refined 'boxes'
        (M, P, 4), averaged 'cls_scores' (M, P, C+1) and per-stage lists."""
        m, p = boxes.shape[:2]
        stage_cls, stage_boxes, stage_reg = [], [], []
        cur = boxes
        for si in range(self.num_stages):
            rois = roi_align(feat, cur, self.roi_size,
                             1.0 / self.feat_stride,
                             sampling_ratio=self.sampling_ratio)
            cls, reg = Shared2FCBBoxHead(
                num_classes=self.num_classes, dtype=self.dtype,
                name=f"bbox_head_{si}")(rois.reshape(m * p,
                                                     *rois.shape[2:]))
            cls = cls.reshape(m, p, -1)
            reg = reg.reshape(m, p, 4)
            decoded = delta_decode(
                cur.reshape(-1, 4), reg.reshape(-1, 4),
                stds=tuple(self.stage_stds[min(si,
                                               len(self.stage_stds) - 1)]),
            ).reshape(m, p, 4)
            stage_cls.append(cls)
            stage_boxes.append(decoded)
            stage_reg.append(reg)
            cur = jax.lax.stop_gradient(decoded)
        avg_cls = jax.nn.softmax(jnp.stack(stage_cls), axis=-1).mean(0)
        avg_cls = avg_cls * valid[..., None]
        return {
            "cls_scores": avg_cls,
            "boxes": stage_boxes[-1],
            "stage_cls": stage_cls,
            "stage_boxes": stage_boxes,
            "stage_reg": stage_reg,
        }


def cascade_train_loss(outs: Dict[str, jnp.ndarray], input_boxes, valid,
                       gt_boxes_list, gt_labels_list, num_classes: int,
                       stage_stds: Sequence[Sequence[float]] = None,
                       **kw):
    """CustomCascadeRoIHead training loss (cascade_roi_head.py:191-286
    forward_train): stage s is supervised against ITS OWN input boxes —
    the original proposals for stage 0, stage s-1's refined (stop-gradient)
    boxes after — via vestigial_train.cascade_roi_loss.

    Pass the head's ``stage_stds`` when it diverges from the mmdet cascade
    defaults so the delta targets are encoded in the SAME normalization the
    forward decode applies (CascadeRoIHead.stage_stds)."""
    import numpy as np

    from panacea_tpu.perception.vestigial_train import (CASCADE_STAGE_CFG,
                                                        cascade_roi_loss)

    if stage_stds is not None and "stage_cfg" not in kw:
        kw["stage_cfg"] = tuple(
            dict(cfg, stds=tuple(stage_stds[min(si, len(stage_stds) - 1)]))
            for si, cfg in enumerate(CASCADE_STAGE_CFG))
    stage_inputs = [np.asarray(input_boxes)] + [
        np.asarray(b) for b in outs["stage_boxes"][:-1]]
    # stage regression targets compare DELTAS; recover each stage's raw
    # delta predictions from the head outputs
    return cascade_roi_loss(outs["stage_cls"], outs["stage_reg"],
                            stage_inputs, np.asarray(valid), gt_boxes_list,
                            gt_labels_list, num_classes, **kw)
