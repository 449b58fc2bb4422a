"""FocalPETR 2D auxiliary head — salient-token selection for dense PETR.

Rebuild of metrics/.../dense_heads/focal_head.py:21-195: shared conv+GN+ReLU
towers over the stride-16 feature map, 1x1 heads for class logits,
centerness, LTRB box regression and 2D center offsets; the per-token sample
weight sigmoid(cls)*sigmoid(centerness) picks the top-k image tokens
(``topk_indexes``) that the PETR head's dense cross-attention then restricts
itself to (streampetr_head.py:440 topk_gather). Inference keeps
``infer_ratio`` of the tokens.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.head import inverse_sigmoid

Dtype = Any


def token_locations(h: int, w: int) -> jnp.ndarray:
    """Normalized (0,1) pixel-center grid, (H, W, 2) xy (misc.py locations)."""
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    cx, cy = jnp.meshgrid(xs, ys)
    return jnp.stack([cx, cy], axis=-1)


def apply_ltrb(loc, ltrb):
    """(H, W, 2) x (N, H, W, 4) -> cxcywh in [0,1] (misc.py:50-67)."""
    x1 = jnp.clip(loc[..., 0] - ltrb[..., 0], 0, 1)
    y1 = jnp.clip(loc[..., 1] - ltrb[..., 1], 0, 1)
    x2 = jnp.clip(loc[..., 0] + ltrb[..., 2], 0, 1)
    y2 = jnp.clip(loc[..., 1] + ltrb[..., 3], 0, 1)
    return jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def apply_center_offset(loc, off):
    return jax.nn.sigmoid(inverse_sigmoid(loc) + off)


class FocalHead(nn.Module):
    """Returns the reference's outs dict incl. ``topk_indexes`` (B, K, 1)."""

    num_classes: int = 10
    embed_dims: int = 256
    infer_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, sample_ratio=None) -> Dict[str, Any]:
        """feat: (B, N, H, W, C) stride-16 level."""
        b, n, h, w, c = feat.shape
        x = feat.reshape(b * n, h, w, c)
        loc = token_locations(h, w)

        def tower(name):
            y = nn.Conv(self.embed_dims, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_gn")(y)
            return nn.relu(y)

        cls_feat = tower("shared_cls")
        cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      bias_init=nn.initializers.constant(-4.595),
                      name="cls")(cls_feat)
        centerness = nn.Conv(1, (1, 1), dtype=self.dtype,
                             bias_init=nn.initializers.constant(-4.595),
                             name="centerness")(cls_feat)

        reg_feat = tower("shared_reg")
        ltrb = jax.nn.sigmoid(
            nn.Conv(4, (1, 1), dtype=self.dtype, name="ltrb")(reg_feat))
        center_off = nn.Conv(2, (1, 1), dtype=self.dtype,
                             name="center2d")(reg_feat)

        cls_logits = cls.reshape(b * n, h * w, self.num_classes)
        centerness_t = centerness.reshape(b * n, h * w, 1)
        pred_bboxes = apply_ltrb(loc, ltrb).reshape(b * n, h * w, 4)
        pred_centers2d = apply_center_offset(
            loc, center_off).reshape(b * n, h * w, 2)

        ratio = self.infer_ratio if sample_ratio is None else sample_ratio
        num_tokens = n * h * w
        k = max(1, int(num_tokens * ratio))
        cls_score = cls_logits.max(axis=-1).reshape(b, num_tokens, 1)
        weight = (jax.nn.sigmoid(jax.lax.stop_gradient(cls_score))
                  * jax.nn.sigmoid(jax.lax.stop_gradient(
                      centerness_t.reshape(b, num_tokens, 1))))
        _, topk = jax.lax.top_k(weight[..., 0], k)
        return {
            "enc_cls_scores": cls_logits,
            "enc_bbox_preds": pred_bboxes,
            "pred_centers2d": pred_centers2d,
            "centerness": centerness_t,
            "topk_indexes": topk[..., None],  # (B, K, 1)
        }
