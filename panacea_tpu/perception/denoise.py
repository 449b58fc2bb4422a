"""Denoising (DN) query branch for SparseHead training.

Equivalent of the reference's prepare_for_dn / dn loss path
(sparse_head.py:275-355, 438-530, config: scalar=10 noise groups,
noise_scale=1.0, split=0.75, dn_weight=1.0): ground-truth boxes are noised
into extra "reconstruction" queries placed BEFORE the match queries, with an
attention mask so (a) match queries never see DN queries, (b) DN groups never
see each other. JAX version: static max_gt padding instead of dynamic
per-batch sizes; masks are additive (-inf) biases.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


class DNPack(NamedTuple):
    ref: jnp.ndarray          # (B, pad, 3) normalized noised centers
    labels: jnp.ndarray       # (B, pad) class or num_classes (flipped/pad)
    box_targets: jnp.ndarray  # (B, pad, 10) normalized gt codes
    valid: jnp.ndarray        # (B, pad) 1.0 where a real gt occupies the slot
    attn_mask: jnp.ndarray    # (pad+Q+P, pad+Q+M) additive mask
    pad_size: int


def build_dn_attn_mask(pad_size: int, num_query: int, num_propagated: int,
                       memory_len: int, scalar: int) -> np.ndarray:
    """(sparse_head.py:322-346): True=blocked -> additive -inf mask of shape
    (pad+Q+P, pad+Q+M)."""
    single = pad_size // scalar
    q_size = pad_size + num_query + num_propagated
    k_size = pad_size + num_query + memory_len
    blocked = np.zeros((q_size, k_size), dtype=bool)
    # match (and propagated) queries cannot see DN queries
    blocked[pad_size:, :pad_size] = True
    # DN groups cannot see each other
    for i in range(scalar):
        lo, hi = single * i, single * (i + 1)
        blocked[lo:hi, :lo] = True
        blocked[lo:hi, hi:pad_size] = True
    return np.where(blocked, NEG_INF, 0.0).astype(np.float32)


def prepare_dn(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,   # (B, Gmax, >=7) zero-padded
    gt_labels: jnp.ndarray,  # (B, Gmax) with -1 padding
    num_query: int,
    num_propagated: int,
    memory_len: int,
    pc_range: Sequence[float],
    num_classes: int = 10,
    scalar: int = 10,
    noise_scale: float = 1.0,
    split: float = 0.75,
) -> DNPack:
    from panacea_tpu.perception.coder import normalize_bbox

    b, gmax = gt_labels.shape
    pad_size = gmax * scalar
    pc = jnp.asarray(pc_range)

    valid = (gt_labels >= 0).astype(jnp.float32)
    boxes_r = jnp.tile(gt_boxes, (1, scalar, 1))        # (B, pad, D)
    labels_r = jnp.tile(gt_labels, (1, scalar))
    valid_r = jnp.tile(valid, (1, scalar))

    k_noise = rng
    rand_prob = jax.random.uniform(
        k_noise, (b, pad_size, 3), minval=-1.0, maxval=1.0
    )
    diff = boxes_r[..., 3:6] / 2.0
    center = boxes_r[..., 0:3] + rand_prob * diff * noise_scale
    center = (center - pc[0:3]) / (pc[3:6] - pc[0:3])
    center = jnp.clip(center, 0.0, 1.0)

    # heavily-noised copies become negatives (label flipped to background)
    flip = jnp.linalg.norm(rand_prob, axis=-1) > split
    labels_out = jnp.where(flip, num_classes, labels_r)
    labels_out = jnp.where(valid_r > 0, labels_out, num_classes)

    if gt_boxes.shape[-1] < 9:
        gt9 = jnp.concatenate(
            [boxes_r, jnp.zeros(boxes_r.shape[:-1] + (9 - gt_boxes.shape[-1],))],
            axis=-1,
        )
    else:
        gt9 = boxes_r[..., :9]
    box_targets = normalize_bbox(
        gt9.at[..., 3:6].set(jnp.maximum(gt9[..., 3:6], 1e-3))
    )

    mask = jnp.asarray(build_dn_attn_mask(
        pad_size, num_query, num_propagated, memory_len, scalar
    ))
    return DNPack(center, labels_out, box_targets, valid_r, mask, pad_size)


def dn_loss(outs_dn_cls: jnp.ndarray, outs_dn_reg: jnp.ndarray,
            pack: DNPack, pc_range, num_classes: int = 10,
            dn_weight: float = 1.0, split: float = 0.75,
            cls_weight: float = 2.0, bbox_weight: float = 0.25,
            reduce_fn=None) -> jnp.ndarray:
    """Focal + code-weighted L1 on the DN slice (dn_loss_single,
    sparse_head.py:710-766), all decoder layers SUMMED (:847-858, the loss
    dict carries dn_loss_* plus every d{i}.dn_loss_*). outs_dn_*:
    (L, B, pad, ...).

    Reference normalizers: cls avg_factor = num_tgt * pi/6 * split^3 (the
    expected positive rate of the flip ball, :737) with focal loss_weight
    2.0 (config :154-159); bbox regresses ALL known rows — label-flipped
    negatives included (bbox_weights = ones_like, :741) — with rows whose
    target has any non-finite dim dropped whole (:757) and avg_factor =
    num_tgt."""
    from panacea_tpu.perception.train_losses import (
        CODE_WEIGHTS,
        sigmoid_focal_loss,
    )

    cw = jnp.asarray(CODE_WEIGHTS)
    # ``reduce_fn``: mmdet reduce_mean hook (dn_loss_single :730-737 wraps
    # num_tgt in reduce_mean under DDP) — avg factors rank-averaged before
    # normalizing so pmean'd grads match the global-batch gradient
    if reduce_fn is None:
        reduce_fn = lambda x: x  # noqa: E731
    num_tgt = jnp.maximum(reduce_fn(pack.valid.sum()), 1.0)
    cls_af = jnp.maximum(num_tgt * 3.14159 / 6 * split**3, 1.0)
    row_ok = pack.valid * jnp.isfinite(pack.box_targets).all(-1)
    total = 0.0
    n_layers = outs_dn_cls.shape[0]
    for li in range(n_layers):
        cls_l = (
            sigmoid_focal_loss(outs_dn_cls[li], pack.labels, num_classes)
            * jnp.maximum(pack.valid, 0.0)
        ).sum() / cls_af
        diff = jnp.abs(outs_dn_reg[li] - pack.box_targets) * cw
        diff = jnp.where(jnp.isfinite(diff), diff, 0.0)
        box_l = (diff.sum(-1) * row_ok).sum() / num_tgt
        total = total + cls_weight * cls_l + bbox_weight * box_l
    return dn_weight * total
