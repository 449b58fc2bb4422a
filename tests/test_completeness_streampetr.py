"""Automated completeness sweep over the StreamPETR perception harness.

Companion to tests/test_completeness.py (which walks ``sgm/``): walks every
top-level ``class`` in the reference ``metrics/StreamPETR/`` tree (SURVEY.md
§2.2, ~26.9k LoC) and asserts each one is accounted for either by an explicit
EQUIVALENT — an importable ``module:attr`` in this repo implementing the same
capability — or by a WAIVER with a one-line justification (dead code in the
snapshot, or torch/mmcv runtime plumbing that JAX replaces wholesale).

Staleness is symmetric, as in the sgm sweep: an entry whose reference class no
longer exists fails, so the bookkeeping cannot rot in either direction.
"""

import ast
import importlib
import os

import pytest

REF = "/root/reference/metrics/StreamPETR"
P = "mmdet3d_plugin"  # all reference classes live under projects/mmdet3d_plugin

EQUIV = {
    # ------------------------------------------------------------- datasets -
    f"{P}.datasets.nuscenes_dataset.CustomNuScenesDataset":
        "panacea_tpu.perception.eval_dataset:GenNuScenesEvalDataset",
    # annotation loading/filtering is folded into the window-GT assembly
    f"{P}.datasets.pipelines.formating.PETRObjectNameFilter":
        "panacea_tpu.perception.train_dataset:PerceptionTrainDataset",
    f"{P}.datasets.pipelines.formating.PETRObjectRangeFilter":
        "panacea_tpu.perception.train_dataset:PerceptionTrainDataset",
    f"{P}.datasets.pipelines.formating.PETRLoadAnnotations3D":
        "panacea_tpu.perception.train_dataset:PerceptionTrainDataset",
    # IDA resize/crop/flip with intrinsics+lidar2img updates
    f"{P}.datasets.pipelines.transform_3d.ResizeCropFlipRotImage":
        "panacea_tpu.data.nuscenes.calib:update_intrinsics_resize_crop",
    f"{P}.datasets.pipelines.transform_3d.GlobalRotScaleTransImage":
        "panacea_tpu.data.nuscenes.augment:global_rot_scale_trans",
    # normalize + pad-to-final-dim happen inside the dataset's image load
    f"{P}.datasets.pipelines.transform_3d.NormalizeMultiviewImage":
        "panacea_tpu.perception.eval_dataset:GenNuScenesEvalDataset",
    f"{P}.datasets.pipelines.transform_3d.PadMultiViewImage":
        "panacea_tpu.perception.eval_dataset:GenNuScenesEvalDataset",
    # rank-sharded iteration (DistributedSampler role)
    f"{P}.datasets.samplers.distributed_sampler.DistributedSampler":
        "panacea_tpu.data.loader:make_dataloader",
    f"{P}.datasets.samplers.group_sampler.DistributedGroupSampler":
        "panacea_tpu.data.loader:make_dataloader",
    # temporally-coherent training-sample stream (random_length window jitter)
    f"{P}.datasets.samplers.group_sampler.InfiniteGroupEachSampleInBatchSampler":
        "panacea_tpu.perception.train_dataset:PerceptionTrainDataset",
    # ------------------------------------------------------------ backbones -
    f"{P}.models.backbones.blocks.PatchEmbed":
        "panacea_tpu.perception.eva:EVAViT",      # conv-s16 stem inlined
    f"{P}.models.backbones.blocks.VisionRotaryEmbedding":
        "panacea_tpu.perception.eva:rope_cos_sin",
    f"{P}.models.backbones.blocks.VisionRotaryEmbeddingFast":
        "panacea_tpu.perception.eva:rope_cos_sin",
    f"{P}.models.backbones.blocks.FrozenBatchNorm2d":
        "panacea_tpu.perception.resnet:FrozenBatchNorm",
    f"{P}.models.backbones.blocks.LayerNorm":
        "panacea_tpu.perception.eva:ChannelLN",   # channels-first LN
    f"{P}.models.backbones.eva.SwiGLU":
        "panacea_tpu.perception.eva:EVABlock",    # sub-LN SwiGLU MLP inlined
    f"{P}.models.backbones.eva.Attention":
        "panacea_tpu.perception.eva:EVAAttention",
    f"{P}.models.backbones.eva.ResBottleneckBlock":
        "panacea_tpu.perception.eva:ResBottleneckBlock",
    f"{P}.models.backbones.eva.Block":
        "panacea_tpu.perception.eva:EVABlock",
    f"{P}.models.backbones.eva.EVAViT":
        "panacea_tpu.perception.eva:EVAViT",
    f"{P}.models.backbones.eva.CBEVAViT":
        "panacea_tpu.perception.eva:EVAViT",      # CB(checkpoint) -> remat
    f"{P}.models.backbones.eva.SimpleFeaturePyramid":
        "panacea_tpu.perception.eva:SimpleFeaturePyramid",
    f"{P}.models.backbones.vovnet.Hsigmoid":
        "panacea_tpu.perception.vovnet:ESE",      # hsigmoid inlined
    f"{P}.models.backbones.vovnet.eSEModule":
        "panacea_tpu.perception.vovnet:ESE",
    f"{P}.models.backbones.vovnet._OSA_module":
        "panacea_tpu.perception.vovnet:OSABlock",
    f"{P}.models.backbones.vovnet._OSA_stage":
        "panacea_tpu.perception.vovnet:VoVNet",   # stage loop inlined
    f"{P}.models.backbones.vovnet.VoVNet":
        "panacea_tpu.perception.vovnet:VoVNet",
    f"{P}.models.backbones.vovnetcp.Hsigmoid":
        "panacea_tpu.perception.vovnet:ESE",
    f"{P}.models.backbones.vovnetcp.eSEModule":
        "panacea_tpu.perception.vovnet:ESE",
    f"{P}.models.backbones.vovnetcp._OSA_module":
        "panacea_tpu.perception.vovnet:OSABlock",
    f"{P}.models.backbones.vovnetcp._OSA_stage":
        "panacea_tpu.perception.vovnet:VoVNet",
    f"{P}.models.backbones.vovnetcp.VoVNetCP":
        "panacea_tpu.perception.vovnet:VoVNet",   # CP(checkpoint) -> remat
    # ---------------------------------------------------------- dense heads -
    f"{P}.models.dense_heads.atss_head.ATSSTaskHead":
        "panacea_tpu.perception.atss:ATSSHead",
    f"{P}.models.dense_heads.cascade_roi_head.CustomCascadeRoIHead":
        "panacea_tpu.perception.cascade_roi:CascadeRoIHead",
    f"{P}.models.dense_heads.fcos_proposal_head.FCOSMono3D_ProposalHead":
        "panacea_tpu.perception.fcos_proposal:FCOSProposalHead",
    f"{P}.models.dense_heads.focal_head.FocalHead":
        "panacea_tpu.perception.focal_head:FocalHead",
    f"{P}.models.dense_heads.joint_head.QueryRoIHead":
        "panacea_tpu.perception.joint_head:QueryRoIHead",
    f"{P}.models.dense_heads.joint_head.JointHead":
        "panacea_tpu.perception.joint_head:JointHead",
    f"{P}.models.dense_heads.joint_headv2.QueryRoIHead":
        "panacea_tpu.perception.joint_head:QueryRoIHead",
    f"{P}.models.dense_heads.joint_headv2.JointHead":
        "panacea_tpu.perception.joint_head:JointHead",
    f"{P}.models.dense_heads.joint_headv3.QueryRoIHeadv3":
        "panacea_tpu.perception.joint_head:QueryRoIHead",
    f"{P}.models.dense_heads.joint_headv3.JointHeadv3":
        "panacea_tpu.perception.joint_head:JointHead",
    f"{P}.models.dense_heads.joint_streampetr_head.QueryRoIHeadv2":
        "panacea_tpu.perception.joint_head:QueryRoIHead",
    f"{P}.models.dense_heads.joint_streampetr_head.JointStreamPETRHead":
        "panacea_tpu.perception.joint_head:JointStreamPETRHead",
    f"{P}.models.dense_heads.simmod_head.SimMODHead":
        "panacea_tpu.perception.simmod:SimMODHead",
    f"{P}.models.dense_heads.sparse_head.SparseHead":
        "panacea_tpu.perception.head:SparseHead",
    f"{P}.models.dense_heads.sparse_head_v3.SparseHeadv3":
        "panacea_tpu.perception.sparse_head_v3:SparseHeadProposal",
    f"{P}.models.dense_heads.sparse_head_v4.SparseHeadv4":
        "panacea_tpu.perception.sparse_head_v3:SparseHeadv4",
    f"{P}.models.dense_heads.streampetr_head.StreamPETRHead":
        "panacea_tpu.perception.petr_head:StreamPETRHead",
    f"{P}.models.dense_heads.yolox_head.YOLOXHeadCustom":
        "panacea_tpu.perception.yolox_head:YOLOXHead",
    # -------------------------------------------------------- losses/necks --
    f"{P}.models.losses.iou_loss.IOULoss":
        "panacea_tpu.perception.fcos_proposal:fcos_loss",  # giou mode inlined
    f"{P}.models.necks.cp_fpn.CPFPN":
        "panacea_tpu.perception.fpn:FPN",         # CP(checkpoint) -> remat
    # ------------------------------------------------------------ detectors -
    f"{P}.models.detectors.petr3d.Petr3D":
        "panacea_tpu.perception.detector:Petr3D",
    f"{P}.models.detectors.petrwindow3d.Petr3DWindow":
        "panacea_tpu.perception.detector:PetrWindow3D",
    f"{P}.models.detectors.simmod.SimMOD":
        "panacea_tpu.perception.simmod:SimMOD",
    f"{P}.models.detectors.sparse4d.Sparse4D":
        "panacea_tpu.perception.detector:Sparse4D",
    f"{P}.models.detectors.sparse4dv2.Sparse4Dv2":
        "panacea_tpu.perception.detector:Sparse4Dv2",
    f"{P}.models.detectors.sparse4dv3.Sparse4Dv3":
        "panacea_tpu.perception.detector:Sparse4Dv3",
    f"{P}.models.detectors.streampetr.StreamPETR":
        "panacea_tpu.perception.detector:StreamPETR",
    f"{P}.models.detectors.streampetrwindow.StreamPETRWindow":
        "panacea_tpu.perception.detector:StreamPETRWindow",
    # ---------------------------------------------------------------- utils -
    f"{P}.models.utils.detr3d_transformer.MLNv2":
        "panacea_tpu.perception.encoding:MLNv2",
    # the Detr3D decoder stack is inlined in SparseHead (6 layers, shared
    # deformable aggregation — head.py setup)
    f"{P}.models.utils.detr3d_transformer.Detr3DTransformer":
        "panacea_tpu.perception.head:SparseHead",
    f"{P}.models.utils.detr3d_transformer.Detr3DTransformerDecoder":
        "panacea_tpu.perception.head:SparseHead",
    f"{P}.models.utils.detr3d_transformer.Detr3DTemporalDecoderLayer":
        "panacea_tpu.perception.head:SparseHead",
    f"{P}.models.utils.detr3d_transformer.DeformableFeatureAggregationCuda":
        "panacea_tpu.perception.deformable:DeformableFeatureAggregation",
    f"{P}.models.utils.grid_mask.Grid":
        "panacea_tpu.perception.gridmask:grid_mask",
    f"{P}.models.utils.grid_mask.GridMask":
        "panacea_tpu.perception.gridmask:grid_mask",
    f"{P}.models.utils.layer_decay_optimizer_constructor."
    "LearningRateDecayOptimizerConstructor":
        "panacea_tpu.perception.train:scale_by_layer_decay",
    f"{P}.models.utils.misc.SELayer_Linear":
        "panacea_tpu.perception.petr_head:SELayerLinear",
    f"{P}.models.utils.misc.MLN":
        "panacea_tpu.perception.encoding:MLN",
    f"{P}.models.utils.petr_transformer.MultiheadAttentionWrapper":
        "panacea_tpu.perception.head:MultiheadSelfAttention",
    f"{P}.models.utils.petr_transformer.PETRMultiheadAttention":
        "panacea_tpu.perception.head:MultiheadSelfAttention",
    # the PETR decoder stack is inlined in StreamPETRHead (propagation +
    # cross-attn layers, petr_head.py)
    f"{P}.models.utils.petr_transformer.PETRTransformerDecoder":
        "panacea_tpu.perception.petr_head:StreamPETRHead",
    f"{P}.models.utils.petr_transformer.PETRTemporalTransformer":
        "panacea_tpu.perception.petr_head:StreamPETRHead",
    f"{P}.models.utils.petr_transformer.PETRTemporalDecoderLayer":
        "panacea_tpu.perception.petr_head:StreamPETRHead",
    f"{P}.models.utils.twostage_detr3d_transformer.TwoStageDetr3DTransformer":
        "panacea_tpu.perception.simmod:SimMODHead",  # decoder inlined
    f"{P}.models.utils.twostage_detr3d_transformer."
    "TwoStageDetr3DTransformerDecoder":
        "panacea_tpu.perception.simmod:SimMODHead",
    f"{P}.models.utils.twostage_detr3d_transformer.TwoStageDetr3DCrossAtten":
        "panacea_tpu.perception.twostage_attn:TwoStageDetr3DCrossAtten",
    # ----------------------------------------------------------------- core -
    f"{P}.core.evaluation.eval_hooks.CustomDistEvalHook":
        "train_perception:main",  # --eval_every in-training held-out eval
    f"{P}.core.bbox.match_costs.match_cost.BBox3DL1Cost":
        "panacea_tpu.perception.train_losses:bbox_l1_cost",
    f"{P}.core.bbox.coders.nms_free_coder.NMSFreeCoder":
        "panacea_tpu.perception.coder:NMSFreeCoder",
    f"{P}.core.bbox.coders.nms_free_coder.NMSFreeProposalCoder":
        "panacea_tpu.perception.fcos_proposal:FCOSProposalHead",  # get_proposals
    f"{P}.core.bbox.assigners.hungarian_assigner_2d.HungarianAssigner2D":
        "panacea_tpu.perception.focal_train:hungarian_assign_2d",
    f"{P}.core.bbox.assigners.hungarian_assigner_3d.HungarianAssigner3D":
        "panacea_tpu.perception.train_losses:hungarian_assign",
}

WAIVERS = {
    # the snapshot ships a stale draft next to joint_head.py; it is never
    # imported (dense_heads/__init__.py skips it) and COULD not be: its
    # @HEADS.register_module() lines re-register 'QueryRoIHead'/'JointHead',
    # which mmcv rejects as duplicates
    f"{P}.models.dense_heads.joint_head copy.QueryRoIHead":
        "dead: stale draft file 'joint_head copy.py', unimportable "
        "(duplicate mmcv registry names vs joint_head.py)",
    f"{P}.models.dense_heads.joint_head copy.JointHead":
        "dead: stale draft file 'joint_head copy.py', unimportable "
        "(duplicate mmcv registry names vs joint_head.py)",
    # transforms not used by any of the four diffusion recipe configs
    # (projects/configs/diffusion/*.py pipelines use ResizeCropFlipRotImage /
    # GlobalRotScaleTransImage / Normalize / Pad only)
    f"{P}.datasets.pipelines.transform_3d.PhotoMetricDistortionMultiViewImage":
        "unused: photometric aug absent from all four diffusion configs",
    f"{P}.datasets.pipelines.transform_3d.CustomRandomFlip3D":
        "unused: BEV flip absent from all four diffusion configs (image-level "
        "rand_flip is part of ResizeCropFlipRotImage, which IS covered)",
    f"{P}.datasets.pipelines.transform_3d.ResizeMultiview3D":
        "unused: plain multiview resize absent from all four diffusion "
        "configs (they use ResizeCropFlipRotImage)",
    f"{P}.datasets.pipelines.formating.PETRFormatBundle3D":
        "mmcv DataContainer tensor-bundling plumbing; the JAX pipeline "
        "returns plain numpy dicts (perception/eval_dataset.py)",
    # torch/detectron2 runtime plumbing with direct flax builtins
    f"{P}.models.backbones.blocks.Conv2d":
        "detectron2 conv+norm+activation wrapper -> flax nn.Conv composed "
        "explicitly (perception/eva.py, resnet.py)",
    f"{P}.models.backbones.blocks.CNNBlockBase":
        "detectron2 module-freeze plumbing base; flax modules are "
        "functionally frozen by not passing their params to the optimizer",
    f"{P}.models.backbones.blocks.NaiveSyncBatchNorm":
        "torch DDP cross-GPU BN sync; no shipped config trains BN "
        "cross-device (ResNet BN is frozen, EVA uses LN) — a JAX equivalent "
        "would be a psum in the BN stats",
    f"{P}.models.backbones.blocks.DropPath":
        "stochastic depth used only by EVA training; EVA is an eval-faithful "
        "backbone here (no diffusion config trains it) and drop_path is "
        "identity at inference",
    f"{P}.models.utils.petr_transformer.PETRTransformerEncoder":
        "dead: only self-referenced in its own forward; no config or module "
        "instantiates a PETR encoder (PETR heads are decoder-only)",
}


def _classes(root):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(dirpath, f)
            try:
                tree = ast.parse(
                    open(p, encoding="utf-8", errors="replace").read())
            except SyntaxError:
                continue
            for node in tree.body:
                if isinstance(node, ast.ClassDef):
                    out.append((p, node.name))
    return out


def _dotted(path, name):
    rel = os.path.relpath(path, os.path.join(REF, "projects"))
    mod = rel[:-3].replace(os.sep, ".")
    if mod.endswith(".__init__"):
        mod = mod[: -len(".__init__")]
    return f"{mod}.{name}"


def _import_target(target):
    mod, attr = target.split(":")
    return getattr(importlib.import_module(mod), attr)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_streampetr_class_sweep():
    found = {_dotted(p, n) for p, n in _classes(REF)}
    assert len(found) > 80, "sweep walked too little of the harness"

    unaccounted = []
    for dotted in sorted(found):
        if dotted in EQUIV:
            _import_target(EQUIV[dotted])  # must import
            continue
        if dotted in WAIVERS:
            continue
        unaccounted.append(dotted)
    assert not unaccounted, (
        "StreamPETR classes with no equivalent or waiver:\n"
        + "\n".join(unaccounted))

    # symmetric staleness
    stale = [k for k in list(EQUIV) + list(WAIVERS) if k not in found]
    assert not stale, f"stale completeness entries: {stale}"
    both = set(EQUIV) & set(WAIVERS)
    assert not both, f"classes both mapped and waived: {both}"
