"""Joint 2D->3D head family: QueryRoIHead + JointStreamPETRHead.

TPU-native rebuild of metrics/.../dense_heads/joint_streampetr_head.py:
- ``QueryRoIHead`` (reference QueryRoIHeadv2, :37-233): lifts 2D proposal
  boxes into 3D reference points — RoIAlign crops on the stride-16 level,
  BasicBlock conv tower, a geo embedding of (roi coords, intrinsics),
  center-offset + depth heads, unprojection through img2lidar.
- ``JointStreamPETRHead`` (:236-1255): a StreamPETRHead whose queries come
  from the query head's lifted reference points instead of a learned table
  (the reference diff vs streampetr_head.py is exactly this wiring).

TPU shape: proposals are FIXED-SHAPE padded (B, N, P, 4) + validity mask —
the reference's ragged per-image proposal lists and z-range filtering
(:216-222) become masking (invalid refs zeroed, matching its zero padding),
so everything stays inside one jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.petr_head import StreamPETRHead
from panacea_tpu.perception.sparse_head_v3 import (
    SparseHeadProposal as _SparseHeadProposal,
)
from panacea_tpu.perception.resnet import FrozenBatchNorm

Dtype = Any


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray,
              out_size: Tuple[int, int] = (7, 7),
              spatial_scale: float = 1.0 / 16.0,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """Exact mmcv/torchvision RoIAlign(aligned=True) via bilinear sampling.

    feat: (M, H, W, C); boxes: (M, P, 4) xyxy in IMAGE pixels.
    Returns (M, P, oh, ow, C). mmcv semantics (mmcv.ops.roi_align, as
    consumed by joint_streampetr_head.py:37-233 / cascade stages):
    coordinates get the aligned half-pixel offset AFTER scaling, roi extents
    are NOT clamped to >=1, each bin averages a ``sampling_ratio x
    sampling_ratio`` grid of bilinear samples, and samples farther than one
    pixel outside the map contribute exact zeros. The adaptive
    ``sampling_ratio=0`` (grid = ceil(roi/out) per roi) is data-dependent —
    impossible as a static XLA shape — so a fixed ratio must be configured;
    golden-tested against torchvision.ops.roi_align(aligned=True)."""
    m, h, w, c = feat.shape
    oh, ow = out_size
    g = int(sampling_ratio)
    assert g >= 1, "adaptive sampling_ratio=0 is not expressible in XLA"
    b = boxes * spatial_scale - 0.5  # aligned=True
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    bin_w = (x2 - x1) / ow  # no >=1 clamp in aligned mode
    bin_h = (y2 - y1) / oh
    # per-bin sample offsets in bin units: bin i, sample j -> i + (j+0.5)/g
    offs_y = (jnp.arange(oh)[:, None]
              + (jnp.arange(g)[None, :] + 0.5) / g).reshape(-1)  # (oh*g,)
    offs_x = (jnp.arange(ow)[:, None]
              + (jnp.arange(g)[None, :] + 0.5) / g).reshape(-1)  # (ow*g,)
    ys = y1[..., None] + offs_y * bin_h[..., None]  # (M, P, oh*g)
    xs = x1[..., None] + offs_x * bin_w[..., None]  # (M, P, ow*g)

    def bilinear(f, ys_, xs_):
        # f: (H, W, C); ys_: (P, OH), xs_: (P, OW) -> (P, OH, OW, C)
        # border rule (torchvision/mmcv): y<-1 or y>H contributes 0; else
        # clamp into [0, H-1] and interpolate (edge samples get wy/wx = 0)
        vy = (ys_ >= -1.0) & (ys_ <= h)
        vx = (xs_ >= -1.0) & (xs_ <= w)
        ys_c = jnp.clip(ys_, 0.0, h - 1)
        xs_c = jnp.clip(xs_, 0.0, w - 1)
        y0 = jnp.floor(ys_c)
        x0 = jnp.floor(xs_c)
        wy = (ys_c - y0)[..., None, None]        # (P, OH, 1, 1)
        wx = (xs_c - x0)[:, None, :, None]       # (P, 1, OW, 1)
        y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y1_ = jnp.clip(y0 + 1, 0, h - 1)
        x1_ = jnp.clip(x0 + 1, 0, w - 1)

        def gat(yy, xx):
            # (P, OH) x (P, OW) -> (P, OH, OW, C)
            rows = f[yy]                         # (P, OH, W, C)
            return jnp.take_along_axis(
                rows, xx[:, None, :, None], axis=2)

        v00, v01 = gat(y0, x0), gat(y0, x1_)
        v10, v11 = gat(y1_, x0), gat(y1_, x1_)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        out = top * (1 - wy) + bot * wy
        mask = (vy[..., None] & vx[:, None, :])[..., None]
        return out * mask

    samples = jax.vmap(bilinear)(feat, ys, xs)   # (M, P, oh*g, ow*g, C)
    p = boxes.shape[1]
    return samples.reshape(m, p, oh, g, ow, g, c).mean(axis=(3, 5))


class BasicBlock(nn.Module):
    """mmdet ResNet BasicBlock (conv3x3-BN-relu-conv3x3-BN + residual)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn2")(h)
        return nn.relu(x + h)


class QueryRoIHead(nn.Module):
    """2D proposals -> 3D reference points (QueryRoIHeadv2, :37-233)."""

    embed_dims: int = 256
    geo_channels: int = 8
    num_branch_convs: int = 2
    num_branch_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    roi_feat_size: Tuple[int, int] = (7, 7)
    sampling_ratio: int = 2  # mmcv RoIAlign grid (2x2 samples/bin)
    depth_range: float = 51.2
    feat_stride: int = 16
    pc_range: Any = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    detach: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, boxes: jnp.ndarray,
                 valid: jnp.ndarray, data: Dict[str, Any]):
        """feat: (B, N, H, W, C) the stride-16 level; boxes: (B, N, P, 4)
        xyxy image pixels; valid: (B, N, P) {0,1}. Returns
        (ref (B, N*P, 3) normalized to pc_range, valid (B, N*P)) — invalid
        or out-of-z-range proposals zeroed (reference mask+pad, :216-230)."""
        b, n, h, w, c = feat.shape
        p = boxes.shape[2]
        if self.detach:
            feat = jax.lax.stop_gradient(feat)
        fm = feat.reshape(b * n, h, w, c)
        bx = boxes.reshape(b * n, p, 4)
        rois = roi_align(fm, bx, self.roi_feat_size,
                         1.0 / self.feat_stride,
                         sampling_ratio=self.sampling_ratio)  # (BN,P,7,7,C)
        x = rois.reshape(b * n * p, *self.roi_feat_size, c)
        for i in range(self.num_branch_convs):
            if i == 0 and c != self.conv_out_channels:
                x = nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                            use_bias=False, dtype=self.dtype,
                            name=f"branch_conv{i}")(x)
                x = FrozenBatchNorm(dtype=self.dtype,
                                    name=f"branch_bn{i}")(x)
                x = nn.relu(x)
            else:
                x = BasicBlock(x.shape[-1], dtype=self.dtype,
                               name=f"branch_block{i}")(x)

        # geo embedding of (roi coords / 1e3, fx fy cx cy / 1e3) (:176-182)
        intr = data["intrinsics"]                    # (B, N, 4, 4)
        k4 = jnp.abs(jnp.stack(
            [intr[..., 0, 0], intr[..., 1, 1],
             intr[..., 0, 2], intr[..., 1, 2]], -1)) / 1e3   # (B, N, 4)
        k4 = jnp.broadcast_to(k4[:, :, None], (b, n, p, 4))
        geo = jnp.concatenate([boxes / 1e3, k4], -1).reshape(b * n * p, 8)
        ge = nn.Dense(self.conv_out_channels, dtype=self.dtype,
                      name="geo_embed_0")(geo)
        ge = nn.Dense(self.conv_out_channels, dtype=self.dtype,
                      name="geo_embed_2")(nn.relu(ge))
        ge = jnp.broadcast_to(ge[:, None, None, :],
                              x.shape[:3] + (self.conv_out_channels,))
        x = jnp.concatenate([x, ge], -1)
        x = x.mean(axis=(1, 2))                      # AvgPool(roi_feat_size)
        for i in range(self.num_branch_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"branch_fc{i}")(x))
        center_off = nn.Dense(2, dtype=self.dtype, name="center_head")(x)
        depth = nn.Dense(1, dtype=self.dtype, name="depth_head")(x)

        # proposal boxes are already in image pixels (:145-147)
        centers = (bx[..., :2] + bx[..., 2:]) / 2
        centers = centers.reshape(b * n * p, 2) + center_off
        d = jax.nn.sigmoid(depth) * self.depth_range
        eps = 1e-5
        uvz1 = jnp.concatenate(
            [centers * jnp.maximum(d, eps), d, jnp.ones_like(d)], -1)
        img2lidar = jnp.linalg.inv(data["lidar2img"])        # (B, N, 4, 4)
        i2l = jnp.broadcast_to(img2lidar[:, :, None],
                               (b, n, p, 4, 4)).reshape(b * n * p, 4, 4)
        xyz = jnp.einsum("mij,mj->mi", i2l, uvz1)[..., :3]
        pc = jnp.asarray(self.pc_range)
        in_z = (xyz[..., 2] > pc[2]) & (xyz[..., 2] < pc[5])
        ref = (xyz - pc[0:3]) / (pc[3:6] - pc[0:3])
        ok = (valid.reshape(-1) > 0) & in_z
        ref = jnp.where(ok[:, None], ref, 0.0)
        return ref.reshape(b, n * p, 3), ok.reshape(b, n * p).astype(
            jnp.float32)


def _build_query_head(head) -> QueryRoIHead:
    """Shared JointStreamPETRHead/JointHead wiring: QueryRoIHead with the
    host head's dims/pc_range as defaults."""
    cfg = dict(head.query_head_cfg or {})
    cfg.setdefault("embed_dims", head.embed_dims)
    cfg.setdefault("pc_range", head.pc_range)
    return QueryRoIHead(dtype=head.dtype, name="query_head", **cfg)


def _lift_proposals(head, mlvl_feats, data):
    """Run the host's QueryRoIHead on the configured FPN level: 2D proposal
    boxes -> (normalized 3D reference points, validity)."""
    lvl = min(head.roi_feat_level, len(mlvl_feats) - 1)
    return head.query_head(
        mlvl_feats[lvl], data["proposal_boxes"],
        data.get("proposal_valid",
                 jnp.ones(data["proposal_boxes"].shape[:3])),
        data)


class JointStreamPETRHead(StreamPETRHead):
    """StreamPETRHead whose queries come from QueryRoIHead-lifted proposals
    (joint_streampetr_head.py:781-800: reference_points =
    self.query_head(data, img_metas)); without proposals it falls back to
    the learned table (with_query_head=False branch, :349-356)."""

    with_query_head: bool = True
    query_head_cfg: Any = None
    roi_feat_level: int = 1

    def setup(self):
        super().setup()
        if self.with_query_head:
            self.query_head = _build_query_head(self)

    def __call__(self, mlvl_feats, memory, data: Dict[str, Any],
                 pad_hw, dn=None, topk_indexes=None):
        if (self.with_query_head and "proposal_boxes" in data
                and "proposal_norm_ref" not in data):
            ref, ok = _lift_proposals(self, mlvl_feats, data)
            data = dict(data, proposal_norm_ref=ref, proposal_ref_valid=ok)
        return super().__call__(mlvl_feats, memory, data, pad_hw, dn=dn,
                                topk_indexes=topk_indexes)

    def make_queries(self, b, dn=None, data=None):
        data = data or {}
        ref = data.get("proposal_norm_ref")
        if ref is None:
            return super().make_queries(b, dn, data)
        if dn is not None:
            ref = jnp.concatenate([dn.ref, ref], axis=1)
        return ref, None


class JointHead(_SparseHeadProposal):
    """SparseHead decoder + QueryRoIHead proposal lifting — the JointHead
    family (joint_head.py:227, joint_headv2.py:176, joint_headv3.py:249 are
    channel-width variants of this same shape: a QueryRoIHead lifts 2D
    proposals to 3D reference points that seed the sparse deformable
    decoder's queries)."""

    with_query_head: bool = True
    query_head_cfg: Any = None
    roi_feat_level: int = 1
    mode: str = "seed"

    def setup(self):
        super().setup()
        if self.with_query_head:
            self.query_head = _build_query_head(self)

    def __call__(self, mlvl_feats, memory, data, pad_hw, dn=None):
        if (self.with_query_head and "proposal_boxes" in data
                and "proposal_positions" not in data):
            ref, ok = _lift_proposals(self, mlvl_feats, data)
            pc = jnp.asarray(self.pc_range)
            pos = ref * (pc[3:6] - pc[0:3]) + pc[0:3]
            data = dict(data, proposal_positions=pos, proposal_ref_valid=ok)
        return super().__call__(mlvl_feats, memory, data, pad_hw, dn=dn)


def joint_family_loss(outs: Dict[str, jnp.ndarray], gt_boxes_list,
                      gt_labels_list, dn_pack=None, pc_range=None,
                      dn_weight: float = 1.0, **kw):
    """Training loss for the joint family (joint_head.py:992-1101 `loss`,
    identical in joint_headv2/v3 and joint_streampetr_head): per-decoder-
    layer Hungarian focal+L1 via the shared vestigial_train implementation,
    plus the DN branch (dn_loss_single, :939-989) when the head ran with
    denoising queries. ``pc_range``/``dn_weight`` feed the DN branch only;
    remaining kwargs go to ``detr3d_family_loss`` (num_classes is shared
    between the two)."""
    from panacea_tpu.perception.vestigial_train import detr3d_family_loss

    losses = detr3d_family_loss(outs["all_cls_scores"],
                                outs["all_bbox_preds"],
                                gt_boxes_list, gt_labels_list, **kw)
    if dn_pack is not None and "dn_cls_scores" in outs:
        from panacea_tpu.perception.denoise import dn_loss

        losses["loss_dn"] = dn_loss(outs["dn_cls_scores"],
                                    outs["dn_bbox_preds"], dn_pack,
                                    pc_range,
                                    num_classes=kw.get("num_classes", 10),
                                    dn_weight=dn_weight)
        losses["loss"] = losses["loss"] + losses["loss_dn"]
    return losses
