"""StreamPETRWindow detector — sliding-window multi-view 3D detection.

Equivalent of metrics/.../detectors/streampetrwindow.py:312-389 at the eval
config: ResNet-50 + FPN(5 levels) backbone per frame, SparseHead with query
memory; for an 8-frame generated clip the backbone re-runs over the 7 history
frames to warm up the memory, then detects on the last frame
(forward_sliding_test). Memory is an explicit state, reset on scene change via
``prev_exists``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.fpn import FPN
from panacea_tpu.perception.head import MemoryState, SparseHead, init_memory
from panacea_tpu.perception.resnet import ResNet50

Dtype = Any

IMG_MEAN = (123.675, 116.28, 103.53)
IMG_STD = (58.395, 57.12, 57.375)


class StreamPETRWindow(nn.Module):
    num_classes: int = 10
    embed_dims: int = 256
    num_query: int = 644
    memory_len: int = 1024
    topk_proposals: int = 256
    num_propagated: int = 256
    num_decoder_layers: int = 6
    num_levels: int = 5
    num_cams: int = 6
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    with_atss: bool = False  # 2D auxiliary roi head (config img_roi_head)
    atss_stacked_convs: int = 4
    # alternate img_backbone choices, as in the reference configs
    # (ResNet/mmdet default; VoVNetCP e.g. test_speed_3key.py; EVA configs):
    # 'r50' | 'vovnet' | 'eva'. backbone_cfg: extra kwargs for the backbone
    # module; neck_start_level: first backbone stage the FPN consumes
    # (reference CPFPN in_channels — r50 uses (512,1024,2048) = start 1,
    # VoVNet-99 uses (768,1024) = start 2).
    backbone_type: str = "r50"
    backbone_cfg: Any = None
    neck_start_level: int = 1
    # 'sparse' = SparseHead (deformable aggregation, the eval-recipe head);
    # 'petr' = StreamPETRHead (dense PETR cross-attn + 3D frustum PE,
    # reference dense_heads/streampetr_head.py) — the petr3d/streampetr
    # detector family's head
    head_type: str = "sparse"
    head_cfg: Any = None
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = dict(self.backbone_cfg or {})
        if self.backbone_type == "r50":
            self.backbone = ResNet50(dtype=self.dtype, name="backbone", **cfg)
        elif self.backbone_type == "vovnet":
            from panacea_tpu.perception.vovnet import VoVNet

            self.backbone = VoVNet(dtype=self.dtype, name="backbone", **cfg)
        elif self.backbone_type == "eva":
            from panacea_tpu.perception.eva import EVAViT

            # EVA carries its own SimpleFeaturePyramid adapter (the reference
            # uses sim_fpn as the neck, eva.py:698-804) — no FPN on top
            self.backbone = EVAViT(dtype=self.dtype, name="backbone",
                                   out_channels=self.embed_dims, **cfg)
        else:
            raise ValueError(f"unknown backbone_type {self.backbone_type!r}")
        if self.backbone_type == "eva":
            self.neck = None
        else:
            self.neck = FPN(out_channels=self.embed_dims,
                            num_outs=self.num_levels,
                            start_level=self.neck_start_level,
                            dtype=self.dtype, name="neck")
        if self.with_atss:
            from panacea_tpu.perception.atss import ATSSHead

            self.roi_head = ATSSHead(
                num_classes=self.num_classes, in_channels=self.embed_dims,
                feat_channels=self.embed_dims,
                stacked_convs=self.atss_stacked_convs,
                num_levels=self.num_levels, dtype=self.dtype, name="roi_head",
            )
        if self.head_type == "petr":
            from panacea_tpu.perception.petr_head import StreamPETRHead

            head_cls = StreamPETRHead
        elif self.head_type == "motion":
            # PETRMotionHead — detection + multi-modal trajectory branch
            # (petr_motion_head.py; drivers Petr3DM/Petr3DP below)
            from panacea_tpu.perception.motion_head import PETRMotionHead

            head_cls = PETRMotionHead
        elif self.head_type == "petr_dn":
            # non-streaming PETRv2-DN head (petr_head_dn.py)
            from panacea_tpu.perception.petr_head_dn import PETRHeadDN

            head_cls = PETRHeadDN
        elif self.head_type == "sparse":
            head_cls = SparseHead
        elif self.head_type in ("sparse_v3", "sparse_v4"):
            # proposal-query Sparse4D decoder family (sparse_head_v3/v4.py)
            from panacea_tpu.perception.sparse_head_v3 import (
                SparseHeadProposal,
            )
            import functools

            head_cls = functools.partial(
                SparseHeadProposal,
                mode="context" if self.head_type == "sparse_v3" else "seed")
        else:
            raise ValueError(f"unknown head_type {self.head_type!r}")
        self.head = head_cls(
            num_classes=self.num_classes,
            embed_dims=self.embed_dims,
            num_query=self.num_query,
            memory_len=self.memory_len,
            topk_proposals=self.topk_proposals,
            num_propagated=self.num_propagated,
            num_decoder_layers=self.num_decoder_layers,
            num_levels=self.num_levels,
            num_cams=self.num_cams,
            pc_range=self.pc_range,
            dtype=self.dtype,
            name="head",
            **dict(self.head_cfg or {}),
        )

    def extract_feats(self, imgs: jnp.ndarray) -> List[jnp.ndarray]:
        """imgs: (B, N, H, W, 3) already normalized. Returns FPN levels as
        (B, N, h, w, C)."""
        b, n, h, w, c = imgs.shape
        x = imgs.reshape(b * n, h, w, c)
        stages = self.backbone(x)
        feats = stages if self.neck is None else self.neck(stages)
        assert len(feats) == self.num_levels, (len(feats), self.num_levels)
        return [f.reshape(b, n, *f.shape[1:]) for f in feats]

    def forward_frame(self, imgs, memory: MemoryState, data: Dict[str, Any],
                      dn=None):
        """One frame: features + head. Returns (outs, new_memory)."""
        feats = self.extract_feats(imgs)
        pad_hw = (imgs.shape[2], imgs.shape[3])
        return self.head(feats, memory, data, pad_hw, dn=dn)

    def __call__(self, imgs_seq: jnp.ndarray, data_seq: Dict[str, jnp.ndarray],
                 memory: Optional[MemoryState] = None):
        """Sliding-window inference (streampetrwindow.py:312-369):
        imgs_seq (B, T, N, H, W, 3); data_seq values with leading (B, T).
        Runs all T frames through backbone+head, returns the LAST frame's
        outputs plus the final memory."""
        b, t = imgs_seq.shape[:2]
        if memory is None:
            memory = init_memory(b, self.memory_len, self.embed_dims)
        outs = None
        for fi in range(t):
            data = {k: v[:, fi] for k, v in data_seq.items()}
            outs, memory = self.forward_frame(imgs_seq[:, fi], memory, data)
        return outs, memory

    def train_frame(self, imgs: jnp.ndarray, memory: MemoryState,
                    data: Dict[str, Any], dn=None):
        """Streaming training forward (streampetr.py:209-252 forward_train
        with seq_mode=True, nopretrain.py:231-233): ONE frame with the
        recurrent memory carried in from the previous optimizer step —
        prev_exists gates the scene/seq-split reset inside
        head.pre_update_memory. Returns (outs, atss_outs, new_memory);
        the caller threads new_memory into the next step (the reference
        equivalently detaches it in post_update_memory,
        sparse_head.py:424-427 — across a jit boundary no gradient can
        flow, so no explicit stop_gradient is needed)."""
        feats = self.extract_feats(imgs)
        pad_hw = (imgs.shape[2], imgs.shape[3])
        outs, memory = self.head(feats, memory, data, pad_hw, dn=dn)
        atss_outs = None
        if self.with_atss:
            bn_feats = [f.reshape((-1,) + f.shape[2:]) for f in feats]
            atss_outs = self.roi_head(bn_feats)
        return outs, atss_outs, memory

    def train_window(self, imgs_seq: jnp.ndarray,
                     data_seq: Dict[str, jnp.ndarray],
                     dn=None, num_frame_losses: int = 1):
        """Training forward over a window (streampetrwindow.py training path:
        obtain_history_memory runs the first T - num_frame_losses frames
        without gradients — num_frame_backbone_grads = num_frame_head_grads =
        num_frame_losses in the experiment configs, e.g.
        streampetr_r50_atss_512x256_window.py:42-45).

        Returns (outs, atss_outs, memory): ``outs`` for the last frame
        (with dn slices when ``dn`` is given), ``atss_outs`` the roi head's
        per-level 2D predictions on the last frame's FPN features
        (each (B*N, h, w, ...)), or None without with_atss.

        Only num_frame_losses == 1 is supported — the value every reference
        experiment config ships (num_frame_losses = 1, window.py:26)."""
        assert num_frame_losses == 1, "all reference recipes use 1"
        b, t = imgs_seq.shape[:2]
        memory = init_memory(b, self.memory_len, self.embed_dims)
        pad_hw = (imgs_seq.shape[3], imgs_seq.shape[4])
        outs, atss_outs = None, None
        for fi in range(t):
            data = {k: v[:, fi] for k, v in data_seq.items()}
            grad_frame = fi >= t - num_frame_losses
            feats = self.extract_feats(imgs_seq[:, fi])
            if not grad_frame:
                # history warms the memory only; cut every gradient path so
                # XLA drops the history backward entirely
                feats = [jax.lax.stop_gradient(f) for f in feats]
            outs, memory = self.head(feats, memory, data, pad_hw,
                                     dn=dn if grad_frame else None)
            if not grad_frame:
                memory = jax.lax.stop_gradient(memory)
            elif self.with_atss:
                bn_feats = [f.reshape((-1,) + f.shape[2:]) for f in feats]
                atss_outs = self.roi_head(bn_feats)
        return outs, atss_outs, memory


def normalize_images(imgs: jnp.ndarray) -> jnp.ndarray:
    """RGB uint8/float [0,255] -> ImageNet-normalized (config img_norm_cfg)."""
    mean = jnp.asarray(IMG_MEAN)
    std = jnp.asarray(IMG_STD)
    return (imgs - mean) / std


class PetrWindow3D(StreamPETRWindow):
    """Reference detectors/petrwindow3d.py: the sliding-window driver with
    the dense-attention StreamPETRHead — identical protocol to
    StreamPETRWindow; only the head family differs."""

    head_type: str = "petr"


class StreamPETR(StreamPETRWindow):
    """Streaming single-frame variant (reference detectors/streampetr.py:30):
    the recurrent memory persists ACROSS calls instead of being warmed up
    per window — drive it frame by frame with ``forward_frame`` and thread the
    returned MemoryState; ``prev_exists=0`` resets on scene change. The module
    is identical to the window variant; only the driving protocol differs."""

    def stream(self, imgs: jnp.ndarray, data: Dict[str, Any],
               memory: Optional[MemoryState] = None):
        if memory is None:
            memory = init_memory(imgs.shape[0], self.memory_len,
                                 self.embed_dims)
        return self.forward_frame(imgs, memory, data)


class Petr3D(StreamPETR):
    """Reference detectors/petr3d.py:21: the streaming driver with the
    dense-attention StreamPETRHead (obtain_history_memory + per-frame
    forward, petr3d.py:104-144 — same protocol as StreamPETR)."""

    head_type: str = "petr"


class Sparse4D(StreamPETR):
    """Reference detectors/sparse4d.py:22: streaming driver whose
    pts_bbox_head is the sparse (deformable-aggregation) head — i.e. this
    framework's default head_type='sparse' with the streaming protocol.
    Alias for config-surface parity."""


class Sparse4Dv2(StreamPETR):
    """Reference detectors/sparse4dv2.py:33: the streaming driver whose head
    carries the recurrent instance memory (pre/post_update_memory) — this
    framework's SparseHead memory protocol with the streaming forward."""

    head_type: str = "sparse"


class Sparse4Dv3(StreamPETR):
    """Reference detectors/sparse4dv3.py:33: Sparse4Dv2 with the
    proposal-query decoder (SparseHeadv3 — perception/sparse_head_v3.py);
    proposals enter through data['proposal_features'/'proposal_positions']
    (detectors/sparse4dv3.py:315 forwards **data into the head)."""

    head_type: str = "sparse_v3"


class Petr3DM(StreamPETR):
    """Generation-side plugin detectors/petr3dm.py:22: the streaming
    Petr3D driver (obtain_history_memory + per-frame forward — byte-level
    near-identical to detectors/streampetr.py). Dense PETR head."""

    head_type: str = "petr"


class Petr3DP(StreamPETR):
    """Generation-side plugin detectors/petr3dp.py:22: Petr3DM whose head is
    PETRMotionHead — GT future trajectories ride the loss inputs
    (petr3dp.py:112-135) and ``simple_test_pts`` surfaces ``traj`` /
    ``traj_scores`` per decoded box (petr3dp.py:309-316; use
    motion_head.decode_with_traj on this driver's outputs)."""

    head_type: str = "motion"
