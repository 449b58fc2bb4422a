"""TwoStageDetr3DCrossAtten — single-point projective cross-attention.

TPU-native rebuild of metrics/.../models/utils/twostage_detr3d_transformer.py
(:264-628): the Detr3D-style attention used by the two-stage (SimMOD-family)
decoders. Each query's single 3D reference point is projected into all
cameras (feature_sampling, :551-628), one bilinear sample per camera per
FPN level (align_corners=True), weighted by sigmoid attention weights over
cams x points x levels — either a full ``num_cams*num_levels*num_points``
linear or the depth-wise factorized ``num_cams+num_points+num_levels``
split (:461-470) — masked by in-frustum/valid-range visibility, summed,
projected, and combined as ``dropout(output) + residual + pos_encoder(
inverse_sigmoid(ref3d))`` (:478-484). Registered but referenced by no
shipped config (vestigial); SimMODHead here can route its cross-attention
through it via ``cross_attn='twostage'``.

The CUDA ``grid_sample`` becomes an XLA gather+bilinear (same math as
perception/deformable.py, align_corners=True convention).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.head import inverse_sigmoid

Dtype = Any


def bilinear_sample_ac(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True, padding_mode='zeros') for a single
    point set. feat (B, H, W, C); grid (B, P, 2) in [-1, 1] xy.
    Returns (B, P, C)."""
    b, h, w, c = feat.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def tap(xi, yi, wgt):
        inside = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c
        f = jnp.take_along_axis(
            feat.reshape(b, h * w, c), idx[..., None], axis=1)
        return f * (wgt * inside)[..., None]

    return (tap(x0, y0, (1 - dx) * (1 - dy)) + tap(x0 + 1, y0, dx * (1 - dy))
            + tap(x0, y0 + 1, (1 - dx) * dy) + tap(x0 + 1, y0 + 1, dx * dy))


def project_reference_points(
    reference_points: jnp.ndarray,
    lidar2img: jnp.ndarray,
    pc_range: Sequence[float],
    img_shape: Tuple[int, int],
    valid_ranges: Optional[jnp.ndarray] = None,
):
    """feature_sampling's projection half (:560-613). reference_points
    (B, Q, 3) normalized [0,1]; lidar2img (B, N, 4, 4); img_shape (H, W).
    Returns (cam_xy (B, N, Q, 2) in [-1,1], mask (B, N, Q, 1))."""
    pr = jnp.asarray(pc_range)
    pts = reference_points * (pr[3:6] - pr[0:3]) + pr[0:3]
    pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
    cam = jnp.einsum("bnij,bqj->bnqi", lidar2img, pts)
    eps = 1e-5
    mask = cam[..., 2:3] > eps
    xy = cam[..., 0:2] / jnp.maximum(cam[..., 2:3], eps)
    h, w = img_shape
    xy = xy / jnp.asarray([w, h], xy.dtype)
    xy = (xy - 0.5) * 2.0
    if valid_ranges is None:
        vr = jnp.asarray([-1.0, -1.0, 1.0, 1.0])
        vr = jnp.broadcast_to(vr, xy.shape[:2] + (4,))
    else:
        nrm = jnp.asarray([w, h, w, h], jnp.float32)
        vr = (valid_ranges / nrm - 0.5) * 2.0
    vr = vr[:, :, None, :]
    mask = (mask & (xy[..., 0:1] > vr[..., 0:1]) & (xy[..., 0:1] < vr[..., 2:3])
            & (xy[..., 1:2] > vr[..., 1:2]) & (xy[..., 1:2] < vr[..., 3:4]))
    return xy, mask.astype(xy.dtype)


class TwoStageDetr3DCrossAtten(nn.Module):
    """Config mirrors twostage_detr3d_transformer.py:283-300."""

    embed_dims: int = 256
    num_levels: int = 4
    num_points: int = 5
    num_cams: int = 6
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    attention_weights_normalize: bool = False
    depth_wise_weights: bool = False
    pos_encoder_linear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, mlvl_feats: List[jnp.ndarray],
                 reference_points, lidar2img, img_shape: Tuple[int, int],
                 query_pos=None, valid_ranges=None):
        """query (B, Q, C); mlvl_feats: list of (B, N, H, W, C);
        reference_points (B, Q, 3) in [0,1]. Returns (B, Q, C)."""
        residual = query
        if query_pos is not None:
            query = query + query_pos
        b, q, c = query.shape
        n = self.num_cams

        xy, mask = project_reference_points(
            reference_points, lidar2img, self.pc_range, img_shape,
            valid_ranges)

        # one sample per (cam, level); the point axis is broadcast
        samples = []
        for feat in mlvl_feats:
            fb = feat.reshape(b * n, *feat.shape[2:])
            s = bilinear_sample_ac(fb, xy.reshape(b * n, q, 2))
            samples.append(s.reshape(b, n, q, c))
        out = jnp.stack(samples, -1)  # (B, N, Q, C, L)

        if self.depth_wise_weights:
            wsplit = nn.Dense(n + self.num_points + self.num_levels,
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              dtype=self.dtype, name="attention_weights")(
                                  query)
            cam_w = wsplit[..., :n]
            pt_w = wsplit[..., n:n + self.num_points]
            lvl_w = wsplit[..., n + self.num_points:]
            attn = (cam_w[..., :, None, None]
                    * pt_w[..., None, :, None]
                    * lvl_w[..., None, None, :])
        else:
            attn = nn.Dense(n * self.num_levels * self.num_points,
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, name="attention_weights")(
                                query)
            attn = attn.reshape(b, q, n, self.num_points, self.num_levels)
        attn = jax.nn.sigmoid(attn)
        # mask (B, N, Q, 1) -> (B, Q, N, 1, 1)
        attn = attn * mask.transpose(0, 2, 1, 3)[..., None]
        # out (B, N, Q, C, L) -> weighted sum over cams/points/levels
        weighted = (out.transpose(0, 2, 3, 1, 4)[:, :, :, :, None, :]
                    * attn[:, :, None, :, :, :])
        agg = weighted.sum((-3, -2, -1))  # (B, Q, C)
        agg = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name="output_proj")(agg)

        if self.pos_encoder_linear:
            pos_feat = nn.Dense(self.embed_dims, dtype=self.dtype,
                                name="position_encoder")(
                                    inverse_sigmoid(reference_points))
        else:
            y = inverse_sigmoid(reference_points)
            y = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name="pos_fc1")(y)
            y = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name="pos_ln1")(y))
            y = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name="pos_fc2")(y)
            pos_feat = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                            name="pos_ln2")(y))
        return agg + residual + pos_feat
