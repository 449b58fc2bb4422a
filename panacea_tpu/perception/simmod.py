"""SimMOD — two-stage multi-view 3D detector (proposal + DETR refinement).

TPU-native rebuild of metrics/.../detectors/simmod.py:25-394 and
dense_heads/simmod_head.py:23-787: ResNet+FPN per-camera features, the
FCOSProposalHead first stage generates top-k lifted 3D proposals
(fcos_proposal.py here), and SimMODHead — a Deformable-DETR-style decoder
with per-layer box refinement — consumes proposal features/positions as
queries (simmod_head.py:253-386). Single-frame (no temporal memory).

The reference's deformable transformer samples features by projecting the
3D reference through every camera; that is exactly
DeformableFeatureAggregation (perception/deformable.py), reused here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.deformable import DeformableFeatureAggregation
from panacea_tpu.perception.fcos_proposal import FCOSProposalHead
from panacea_tpu.perception.fpn import FPN
from panacea_tpu.perception.head import FFN, MultiheadSelfAttention, \
    inverse_sigmoid
from panacea_tpu.perception.resnet import ResNet50

Dtype = Any


class SimMODHead(nn.Module):
    """Proposal-query Deformable-DETR decoder with box refinement
    (simmod_head.py:107-386)."""

    num_classes: int = 10
    embed_dims: int = 256
    num_decoder_layers: int = 6
    num_reg_fcs: int = 2
    code_size: int = 10
    num_levels: int = 4
    num_cams: int = 6
    num_input_proj: int = 2
    with_box_refine: bool = True
    proposal_cam_embeddings: bool = False
    proposal_level_embeddings: bool = False
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    # 'deformable' = DeformableFeatureAggregation (default); 'twostage' =
    # the TwoStageDetr3DCrossAtten single-point projective attention
    # (twostage_detr3d_transformer.py:264-628)
    cross_attn: str = "deformable"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mlvl_feats, proposal_features, proposal_positions,
                 data: Dict[str, Any], pad_hw: Tuple[int, int],
                 proposal_scores=None):
        """mlvl_feats: per-level (B, N, H, W, C); proposal_features
        (B, P, 2C); proposal_positions (B, P, >=3) lidar xyz (+view+level).
        Returns outs dict with all_cls_scores/all_bbox_preds (L, B, P, .)."""
        c = self.embed_dims
        pc = jnp.asarray(self.pc_range)
        x = proposal_features
        for i in range(self.num_input_proj):
            x = nn.Dense(c, dtype=self.dtype, name=f"input_proj_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_ln_{i}")(x)
            x = nn.relu(x)
        query = x

        ref = (proposal_positions[..., :3] - pc[0:3]) / (pc[3:6] - pc[0:3])
        ref = jnp.clip(ref, 0.0, 1.0)
        query_pos = nn.Dense(c, dtype=self.dtype, name="pos_proj")(ref)
        if self.proposal_cam_embeddings:
            cam_emb = self.param("proposal_cam_embeds",
                                 nn.initializers.normal(0.1),
                                 (self.num_cams, c))
            view = proposal_positions[..., 3].astype(jnp.int32)
            query_pos = query_pos + cam_emb[view]
        if self.proposal_level_embeddings:
            lvl_emb = self.param("proposal_level_embeds",
                                 nn.initializers.normal(0.1),
                                 (self.num_levels, c))
            lvl = proposal_positions[..., 4].astype(jnp.int32)
            query_pos = query_pos + lvl_emb[lvl]

        cls_list, reg_list = [], []
        for li in range(self.num_decoder_layers):
            query = MultiheadSelfAttention(
                c, dtype=self.dtype, name=f"self_attn_{li}")(
                query, query, query, query_pos, query_pos)
            query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm_{3 * li}")(query)
            ref_lidar = ref * (pc[3:6] - pc[0:3]) + pc[0:3]
            if self.cross_attn == "twostage":
                from panacea_tpu.perception.twostage_attn import (
                    TwoStageDetr3DCrossAtten,
                )

                query = TwoStageDetr3DCrossAtten(
                    embed_dims=c, num_levels=self.num_levels,
                    num_cams=self.num_cams, pc_range=tuple(self.pc_range),
                    dtype=self.dtype, name=f"cross_attn_{li}")(
                    query, mlvl_feats, ref, data["lidar2img"], pad_hw,
                    query_pos=query_pos)
            else:
                query = DeformableFeatureAggregation(
                    embed_dims=c, num_levels=self.num_levels,
                    num_cams=self.num_cams, dtype=self.dtype,
                    name=f"cross_attn_{li}")(
                    query, query_pos, mlvl_feats, ref_lidar,
                    data["lidar2img"], pad_hw)
            query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm_{3 * li + 1}")(query)
            query = FFN(c, dtype=self.dtype, name=f"ffn_{li}")(query)
            query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm_{3 * li + 2}")(query)

            # per-layer branches (with_box_refine -> unshared, :130-136)
            sfx = f"_{li}" if self.with_box_refine else ""
            h = query
            for fi in range(self.num_reg_fcs):
                h = nn.Dense(c, dtype=self.dtype,
                             name=f"cls_branch{sfx}_fc{fi}")(h)
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"cls_branch{sfx}_ln{fi}")(h)
                h = nn.relu(h)
            cls_out = nn.Dense(self.num_classes, dtype=self.dtype,
                               bias_init=nn.initializers.constant(-4.595),
                               name=f"cls_branch{sfx}_out")(h)
            r = query
            for fi in range(self.num_reg_fcs):
                r = nn.relu(nn.Dense(c, dtype=self.dtype,
                                     name=f"reg_branch{sfx}_fc{fi}")(r))
            reg_out = nn.Dense(self.code_size, dtype=self.dtype,
                               name=f"reg_branch{sfx}_out")(r)

            # box refinement (simmod_head.py:341-369): xyz offsets refine
            # the (sigmoid-space) reference; next layer samples at the
            # refined points
            new_ref = jax.nn.sigmoid(
                reg_out[..., 0:3] + inverse_sigmoid(ref))
            xyz = new_ref * (pc[3:6] - pc[0:3]) + pc[0:3]
            reg_out = jnp.concatenate([xyz, reg_out[..., 3:]], -1)
            cls_list.append(cls_out)
            reg_list.append(reg_out)
            if self.with_box_refine:
                ref = jax.lax.stop_gradient(new_ref)

        outs = {
            "all_cls_scores": jnp.stack(cls_list),
            "all_bbox_preds": jnp.stack(reg_list),
            "enc_cls_scores": None,
            "enc_bbox_preds": None,
        }
        if proposal_scores is not None:
            # combine_scores (:374-378)
            sig = jax.nn.sigmoid(outs["all_cls_scores"])
            comb = sig * jax.lax.stop_gradient(
                proposal_scores)[None, :, :, None]
            outs["all_cls_scores_combined"] = inverse_sigmoid(comb)
        return outs


class SimMOD(nn.Module):
    """Two-stage detector driver (detectors/simmod.py:25-394)."""

    num_classes: int = 10
    embed_dims: int = 256
    num_levels: int = 4
    num_cams: int = 6
    num_proposal: int = 600
    num_decoder_layers: int = 6
    fcos_cfg: Any = None
    head_cfg: Any = None
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet50(dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=self.embed_dims,
                        num_outs=self.num_levels, start_level=1,
                        dtype=self.dtype, name="neck")
        self.roi_head = FCOSProposalHead(
            num_classes=self.num_classes, in_channels=self.embed_dims,
            feat_channels=self.embed_dims, num_proposal=self.num_proposal,
            strides=tuple(8 * 2**i for i in range(self.num_levels)),
            dtype=self.dtype, **(dict(self.fcos_cfg or {})),
            name="img_roi_head")
        self.head = SimMODHead(
            num_classes=self.num_classes, embed_dims=self.embed_dims,
            num_levels=self.num_levels, num_cams=self.num_cams,
            num_decoder_layers=self.num_decoder_layers,
            pc_range=self.pc_range, dtype=self.dtype,
            **(dict(self.head_cfg or {})), name="pts_bbox_head")

    def __call__(self, imgs: jnp.ndarray, data: Dict[str, Any]):
        """imgs: (B, N, H, W, 3) normalized. Returns (outs, proposals)."""
        b, n, h, w, _ = imgs.shape
        feats = self.backbone(imgs.reshape(b * n, h, w, 3))
        feats = self.neck(feats)
        proposals = self.roi_head.get_proposals(
            self.roi_head(feats), data, num_cams=n)
        mlvl = [f.reshape(b, n, *f.shape[1:]) for f in feats]
        outs = self.head(
            mlvl, proposals["proposal_features"],
            proposals["proposal_positions"], data, (h, w),
            proposal_scores=proposals["proposal_scores"])
        return outs, proposals


def simmod_loss(outs, gt_boxes_list, gt_labels_list,
                pre_assigns_list=None, compute_loss_iou3d: bool = False,
                iou3d_weight: float = 1.0, **kw):
    """SimMODHead training loss (simmod_head.py:389-658): the shared DETR-3D
    Hungarian loss with the two SimMOD deltas — guided assignment (queries
    carrying a proposal's pre-matched GT index are pinned; the reference's
    `restricted_assign` is called but defined nowhere in the snapshot) and
    the IoU3D quality branch (BCE vs clamp(2*iou3d-0.5, 0, 1), :629-641).
    With ``compute_loss_iou3d`` the head is configured code_size=11 and the
    quality LOGIT is the last bbox channel (reference
    pred_ious = bbox_preds[..., -1], :637) — the box terms always slice
    [..., :10]."""
    from panacea_tpu.perception.vestigial_train import detr3d_family_loss

    preds = outs["all_bbox_preds"]
    iou_logits = None
    if compute_loss_iou3d:
        assert preds.shape[-1] > 10, (
            "compute_loss_iou3d needs code_size=11 (iou logit in the last "
            "bbox channel)")
        iou_logits = preds[..., -1]
    return detr3d_family_loss(
        outs["all_cls_scores"], preds, gt_boxes_list,
        gt_labels_list, pre_assigns_list=pre_assigns_list,
        iou3d_logits=iou_logits, iou3d_weight=iou3d_weight, **kw)
