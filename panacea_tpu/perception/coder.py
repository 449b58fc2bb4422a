"""Box (de)normalization + NMS-free decoding.

Equivalents of metrics/.../core/bbox/util.py:3-51 and
core/bbox/coders/nms_free_coder.py:9-113. JAX-jittable: top-k selection stays
fixed-size; range/score filtering returns a validity mask instead of ragged
arrays.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """(cx,cy,cz,w,l,h,rot[,vx,vy]) -> (cx,cy,cz,log w,log l,log h,sin,cos[,vx,vy])."""
    out = [
        bboxes[..., 0:3],
        jnp.log(bboxes[..., 3:6]),
        jnp.sin(bboxes[..., 6:7]),
        jnp.cos(bboxes[..., 6:7]),
    ]
    if bboxes.shape[-1] > 7:
        out.append(bboxes[..., 7:9])
    return jnp.concatenate(out, axis=-1)


def denormalize_bbox(nb: jnp.ndarray) -> jnp.ndarray:
    rot = jnp.arctan2(nb[..., 6:7], nb[..., 7:8])
    out = [nb[..., 0:3], jnp.exp(nb[..., 3:6]), rot]
    if nb.shape[-1] > 8:
        out.append(nb[..., 8:10])
    return jnp.concatenate(out, axis=-1)


class NMSFreeCoder:
    def __init__(
        self,
        pc_range: Sequence[float],
        voxel_size=None,
        post_center_range: Sequence[float] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
        max_num: int = 300,
        score_threshold: Optional[float] = None,
        num_classes: int = 10,
    ):
        self.pc_range = pc_range
        self.post_center_range = np.asarray(post_center_range)
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.num_classes = num_classes

    def decode_single(self, cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray
                      ) -> Dict[str, np.ndarray]:
        """cls_scores (Q, num_classes) logits; bbox_preds (Q, 10) normalized.
        Returns dict of numpy arrays filtered by the post-center range."""
        scores_all = jax.nn.sigmoid(cls_scores).reshape(-1)
        scores, idx = jax.lax.top_k(scores_all, self.max_num)
        labels = idx % self.num_classes
        box_idx = idx // self.num_classes
        boxes = denormalize_bbox(bbox_preds[box_idx])

        boxes_np = np.asarray(boxes)
        scores_np = np.asarray(scores)
        labels_np = np.asarray(labels)
        mask = (
            (boxes_np[:, :3] >= self.post_center_range[:3]).all(axis=1)
            & (boxes_np[:, :3] <= self.post_center_range[3:]).all(axis=1)
        )
        if self.score_threshold is not None:
            mask &= scores_np >= self.score_threshold
        return {
            "bboxes": boxes_np[mask],
            "scores": scores_np[mask],
            "labels": labels_np[mask],
            # query index of each kept box — lets callers gather aligned
            # per-query side outputs (trajectories, ious) without replaying
            # the selection (motion_head.decode_with_traj)
            "box_idx": np.asarray(box_idx)[mask],
        }

    def decode(self, preds: Dict[str, jnp.ndarray]):
        cls = preds["all_cls_scores"][-1]
        reg = preds["all_bbox_preds"][-1]
        return [self.decode_single(cls[i], reg[i]) for i in range(cls.shape[0])]
