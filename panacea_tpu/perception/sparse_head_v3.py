"""SparseHeadv3 / SparseHeadv4 — proposal-query variants of SparseHead.

TPU-native rebuild of metrics/.../dense_heads/sparse_head_v3.py:20-997 and
sparse_head_v4.py:20-1012. Both share SparseHead's decoder/memory machinery
(the reference files are ~95% identical to sparse_head.py); the delta is
where the queries come from:

- v3 (``mode='context'``, sparse_head_v3.py:252-269, :503-519): reference
  points from 2D-proposal positions (e.g. a FocalHead/FCOS proposal
  branch), query content = input_proj(proposal_features), with
  context_embedding(pos2posemb3d(ref)) filling the non-proposal tail.
- v4 (``mode='seed'``, sparse_head_v4.py:254-274, :512-523): proposal
  positions SEED the first rows of the learned reference-point table
  (padded up to num_query), query content stays zero.

One flax module covers both via ``mode``; with no proposals supplied it
degrades to the base SparseHead behavior (learned queries), matching the
references' ``using_queries=True`` branch.

Intentional divergence (DN training only): the reference overwrites
``tgt[:, :P]`` with projected proposal features AFTER prepare_for_dn
prepends ``pad_size`` denoising rows (sparse_head_v3.py:371, :543), so
with DN active the proposal content lands on the DN rows and the proposal
queries keep the plain context embedding. Here the projected features are
placed on the first P NON-DN rows (and DN rows get zeros, as in the base
head), which is what the eval-mode (pad_size=0) code path — the one the
reference actually validates — computes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from panacea_tpu.perception.encoding import pos2posemb3d
from panacea_tpu.perception.head import SparseHead


class SparseHeadProposal(SparseHead):
    mode: str = "context"          # 'context' (v3) | 'seed' (v4)
    num_input_proj: int = 2
    detach_proposal_positions: bool = False

    def setup(self):
        super().setup()
        c = self.embed_dims
        if self.mode == "context":
            layers = []
            for _ in range(self.num_input_proj):
                layers += [nn.Dense(c, dtype=self.dtype),
                           nn.LayerNorm(epsilon=1e-5, dtype=self.dtype),
                           nn.relu]
            self.input_proj = nn.Sequential(layers, name="input_proj")
            self.context_embedding = nn.Sequential(
                [nn.Dense(c, dtype=self.dtype), nn.relu,
                 nn.Dense(c, dtype=self.dtype)], name="context_embedding")

    def make_queries(self, b: int, dn=None, data=None):
        data = data or {}
        pos = data.get("proposal_positions")       # (B, P, >=3) lidar coords
        feats = data.get("proposal_features")      # (B, P, 2C)
        if pos is None:
            return super().make_queries(b, dn, data)
        import jax

        pc = jnp.asarray(self.pc_range)
        if self.detach_proposal_positions:
            pos = jax.lax.stop_gradient(pos)
        ref_p = (pos[..., :3] - pc[0:3]) / (pc[3:6] - pc[0:3])
        p = ref_p.shape[1]
        if self.mode == "seed":
            # v4: pad proposal refs with the learned table up to num_query
            init_ref = jnp.broadcast_to(
                self.reference_points[None], (b, self.num_query, 3))
            ref = jnp.concatenate(
                [ref_p, init_ref[:, : max(self.num_query - p, 0)]], axis=1)
            tgt = None                              # zeros (v4:527)
        else:
            # v3: proposal-count queries with projected content
            assert feats is not None, "mode='context' needs proposal_features"
            ref = ref_p
            tgt = self.context_embedding(pos2posemb3d(ref))
            tgt = tgt.at[:, : feats.shape[1]].set(self.input_proj(feats))
        if dn is not None:
            pad = dn.ref.shape[1]
            want = dn.attn_mask.shape[0] - pad - self.num_propagated
            if ref.shape[1] != want:
                raise ValueError(
                    f"DN attention mask sized for {want} queries but the "
                    f"proposal path produced {ref.shape[1]} "
                    f"(mode={self.mode}); build the DN pack with num_query "
                    f"matching the proposal-driven query count (the "
                    f"reference mutates num_query to the proposal count, "
                    f"sparse_head_v3.py:375)")
            ref = jnp.concatenate([dn.ref, ref], axis=1)
            if tgt is not None:
                tgt = jnp.concatenate(
                    [jnp.zeros((b, dn.ref.shape[1], tgt.shape[-1]),
                               tgt.dtype), tgt], axis=1)
        return ref, tgt


# reference registry names
SparseHeadv3 = SparseHeadProposal


class SparseHeadv4(SparseHeadProposal):
    mode: str = "seed"


def sparse_v4_loss(outs, gt_boxes_list, gt_labels_list, **kw):
    """SparseHeadv4 training loss (sparse_head_v4.py:740-966 loss_single +
    loss — byte-identical DETR-3D boilerplate to the joint family's)."""
    from panacea_tpu.perception.vestigial_train import detr3d_family_loss

    return detr3d_family_loss(outs["all_cls_scores"],
                              outs["all_bbox_preds"],
                              gt_boxes_list, gt_labels_list, **kw)
