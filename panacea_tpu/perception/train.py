"""StreamPETR detector training step.

The reference trains with mmcv's runner + HungarianAssigner3D on CPU
(streampetr_r50_atss_512x256_window.py:253-276). JAX version: a two-pass
scheme — (1) jitted forward produces per-layer predictions, (2) host-side
Hungarian matching on the final-layer cost, (3) jitted loss+grad with the
assignment as input (every decoder layer supervised with the same matching,
as in DETR-style training with shared branches).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from panacea_tpu.perception.coder import normalize_bbox
from panacea_tpu.perception.train_losses import (
    CODE_WEIGHTS,
    bbox_l1_cost,
    focal_cls_cost,
    hungarian_assign,
    sigmoid_focal_loss,
)


class DetTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_detector_train(model, optimizer, pc_range,
                        num_classes: int = 10,
                        cls_weight: float = 2.0, bbox_weight: float = 0.25):
    """Returns (forward_fn, train_step): forward_fn gives predictions for
    matching; train_step applies the update given assignments."""

    @jax.jit
    def forward(params, imgs_seq, data_seq):
        outs, _ = model.apply({"params": params}, imgs_seq, data_seq)
        return outs

    def assign(outs, gt_boxes: np.ndarray, gt_labels: np.ndarray):
        """Host: Hungarian on the final decoder layer, sample 0."""
        cls_logits = outs["all_cls_scores"][-1][0]
        bbox_preds = outs["all_bbox_preds"][-1][0]
        g = len(gt_labels)
        if g == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
        cost = (
            cls_weight * focal_cls_cost(cls_logits, jnp.asarray(gt_labels))
            + bbox_weight * bbox_l1_cost(bbox_preds, jnp.asarray(gt_norm),
                                         pc_range)
        )
        return hungarian_assign(np.asarray(cost))

    def loss_fn(params, imgs_seq, data_seq, labels_q, gt_norm_q, bbox_mask_q,
                num_gt):
        """labels_q: (Q,) class per query (num_classes = bg);
        gt_norm_q: (Q, 10) matched normalized gt per query;
        bbox_mask_q: (Q,) 1.0 where matched."""
        outs, _ = model.apply({"params": params}, imgs_seq, data_seq)
        total = 0.0
        cw = jnp.asarray(CODE_WEIGHTS)
        n_layers = outs["all_cls_scores"].shape[0]
        for li in range(n_layers):
            cls_logits = outs["all_cls_scores"][li][0]
            bbox_preds = outs["all_bbox_preds"][li][0]
            cls_l = sigmoid_focal_loss(
                cls_logits, labels_q, num_classes
            ).sum() / jnp.maximum(num_gt, 1)
            diff = jnp.abs(bbox_preds - gt_norm_q) * cw
            diff = jnp.where(jnp.isfinite(diff), diff, 0.0)
            bbox_l = (diff.sum(-1) * bbox_mask_q).sum() / jnp.maximum(num_gt, 1)
            total = total + cls_weight * cls_l + bbox_weight * bbox_l
        return total / n_layers

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def apply_updates(state: DetTrainState, grads):
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return DetTrainState(params, opt_state, state.step + 1)

    def train_step(state: DetTrainState, imgs_seq, data_seq,
                   gt_boxes: np.ndarray, gt_labels: np.ndarray):
        outs = forward(state.params, imgs_seq, data_seq)
        rows, cols = assign(outs, gt_boxes, gt_labels)
        q = outs["all_cls_scores"].shape[2]
        labels_q = np.full((q,), 10, dtype=np.int64)
        gt_norm_q = np.zeros((q, 10), dtype=np.float32)
        mask_q = np.zeros((q,), dtype=np.float32)
        if len(rows):
            gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
            labels_q[rows] = np.asarray(gt_labels)[cols]
            gt_norm_q[rows] = gt_norm[cols]
            mask_q[rows] = 1.0
        loss, grads = grad_fn(
            state.params, imgs_seq, data_seq, jnp.asarray(labels_q),
            jnp.asarray(gt_norm_q), jnp.asarray(mask_q),
            jnp.float32(max(len(rows), 1)),
        )
        state = apply_updates(state, grads)
        return state, float(loss)

    return forward, train_step


def init_detector_train(model, optimizer, params) -> DetTrainState:
    return DetTrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
