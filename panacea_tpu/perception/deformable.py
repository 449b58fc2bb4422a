"""Multi-camera multi-scale deformable feature aggregation — XLA-native.

Replaces the mmcv C++/CUDA ``MultiScaleDeformableAttnFunction`` used by the
reference eval detector (metrics/.../detr3d_transformer.py:525-613): 3D key
points (reference point + learnable offsets) are projected into all 6 cameras,
bilinearly sampled from every FPN level, and fused with per-group softmax
weights. Pure gather + interpolation, vectorized over (cams, queries, points,
levels) — no custom kernel needed on TPU; XLA lowers the gathers efficiently.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.encoding import MLN

Dtype = Any


def bilinear_sample(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """feat: (B, H, W, C); uv: (B, Q, P, 2) normalized to [0,1] over the padded
    image; returns (B, Q, P, C). align_corners=False grid convention
    (x = u*W - 0.5), zero padding outside."""
    b, h, w, c = feat.shape
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = feat.reshape(b, h * w, c)
        idx = yi_c * w + xi_c  # (B, Q, P)
        vals = jnp.take_along_axis(
            flat[:, :, None, :],
            idx.reshape(b, -1)[:, :, None, None].astype(jnp.int32),
            axis=1,
        ).reshape(b, *idx.shape[1:], c)
        return vals * inside[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0, y0 + 1)
    v10 = gather(x0 + 1, y0)
    v11 = gather(x0 + 1, y0 + 1)
    wx, wy = dx[..., None], dy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v10 * wx * (1 - wy)
        + v01 * (1 - wx) * wy
        + v11 * wx * wy
    )


def project_points(key_points: jnp.ndarray, lidar2img: jnp.ndarray,
                   pad_hw: Tuple[int, int]) -> jnp.ndarray:
    """key_points: (B, Q, P, 3) in lidar/ego frame; lidar2img: (B, N, 4, 4);
    returns uv (B, N, Q, P, 2) normalized by the padded image size
    (detr3d_transformer.py:594-602)."""
    pts = jnp.concatenate(
        [key_points, jnp.ones_like(key_points[..., :1])], axis=-1
    )
    cam = jnp.einsum("bnij,bqpj->bnqpi", lidar2img, pts)
    depth = jnp.clip(cam[..., 2:3], min=1e-5)
    uv = cam[..., :2] / depth
    return uv / jnp.asarray([pad_hw[1], pad_hw[0]], dtype=uv.dtype)


class DeformableFeatureAggregation(nn.Module):
    """(detr3d_transformer.py:525-613). Functional layout: queries attend to
    all cams/levels/points with learned offsets + weights."""

    embed_dims: int = 256
    num_groups: int = 8
    num_levels: int = 5
    num_cams: int = 6
    num_pts: int = 13
    bias: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, instance_feature, query_pos, mlvl_feats,
                 reference_points_3d, lidar2img, pad_hw):
        """instance_feature/query_pos: (B, Q, C); mlvl_feats: list of
        (B, N, H, W, C); reference_points_3d: (B, Q, 3) in lidar coords;
        lidar2img: (B, N, 4, 4). Returns (B, Q, C)."""
        b, q, c = instance_feature.shape
        g = self.num_groups
        gd = c // g

        # torch init: nn.init.uniform_(bias, -self.bias, self.bias)
        # (detr3d_transformer.py:562). MUST be expressed in the initializer,
        # not as an output shift — converted checkpoints carry the centered
        # bias already, and an extra "- self.bias" on the output would move
        # every key point by a constant -bias metres (caught by
        # test_sparse_head_v3_context_queries_match_reference).
        bias0 = self.bias

        def _centered_uniform(key, shape, dtype=jnp.float_):
            return jax.random.uniform(key, shape, dtype, -bias0, bias0)

        offsets = nn.Dense(
            self.num_pts * 3, dtype=self.dtype,
            bias_init=_centered_uniform,
            name="learnable_fc",
        )(instance_feature)
        key_points = reference_points_3d[:, :, None, :] + offsets.reshape(
            b, q, self.num_pts, 3
        )

        # per-cam weights (softmax over levels*points within each group)
        l2i_flat = lidar2img[..., :3, :].reshape(b, self.num_cams, 12)
        cam_embed = nn.Dense(c // 2, dtype=self.dtype,
                             name="cam_embed_fc1")(l2i_flat)
        cam_embed = nn.relu(cam_embed)
        cam_embed = nn.Dense(c, dtype=self.dtype,
                             name="cam_embed_fc2")(cam_embed)
        cam_embed = nn.relu(cam_embed)
        cam_embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="cam_embed_ln")(cam_embed)
        feat_pos = (
            (instance_feature + query_pos)[:, None, :, :]
            + cam_embed[:, :, None, :]
        )  # (B, N, Q, C)
        weights = nn.Dense(
            g * self.num_levels * self.num_pts, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="weights_fc",
        )(feat_pos)
        # softmax over cams x levels x points JOINTLY per (query, group) —
        # the reference normalizes across all cameras at once
        # (detr3d_transformer.py:583: reshape(bs, anchor, -1, G).softmax(-2)
        # with -1 = N*L*P), NOT per camera
        lp = self.num_levels * self.num_pts
        weights = weights.reshape(b, self.num_cams, q, lp, g)
        weights = jnp.moveaxis(weights, 1, 2)           # (B, Q, N, LP, G)
        weights = weights.reshape(b, q, self.num_cams * lp, g)
        weights = jax.nn.softmax(weights, axis=-2)
        weights = weights.reshape(b, q, self.num_cams, lp, g)
        weights = jnp.moveaxis(weights, 2, 1).reshape(
            b, self.num_cams, q, self.num_levels, self.num_pts, g
        )

        uv = project_points(key_points, lidar2img, pad_hw)  # (B,N,Q,P,2)
        uv_flat = uv.reshape(b * self.num_cams, q, self.num_pts, 2)

        acc = jnp.zeros((b, self.num_cams, q, g, gd), self.dtype)
        for li, feat in enumerate(mlvl_feats):
            fb = feat.reshape((b * self.num_cams,) + feat.shape[2:])
            sampled = bilinear_sample(fb, uv_flat)  # (B*N, Q, P, C)
            sampled = sampled.reshape(b, self.num_cams, q, self.num_pts, g, gd)
            w = weights[:, :, :, li][..., None]  # (B,N,Q,P,G,1)
            acc = acc + (sampled * w).sum(axis=3)
        out = acc.sum(axis=1).reshape(b, q, c)  # sum over cams
        out = nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
        return instance_feature + out
