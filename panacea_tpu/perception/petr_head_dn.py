"""PETRHeadDN — the non-streaming PETRv2-style dense head with denoising.

TPU-native rebuild of the generation-side plugin's
models/dense_heads/petr_head_dn.py:31-905: the SAME focal-PETR token
pipeline as StreamPETRHead (frustum 3D PE -> position_encoder MLP,
memory_embed, MLN spatial alignment on the 8-dim cone, SELayer featurized
PE — position_embeding at :287-330 is byte-identical to
streampetr_head.py's) and the same decoder layers, but with NO streaming
memory: no propagated queries, no temporal alignment, no ego-motion MLNs,
and a no-op reset_memory (:284-285). The transformer runs with ``tgt=None``
and no temp_memory (:456 — self-attention is over the current queries
only), so the head is a pure single-frame detector with DN training
support (prepare_for_dn, :330-406).

Implemented as a StreamPETRHead subclass overriding ``__call__``; the
parent's memory towers (time_embedding, ego MLNs, pseudo reference points)
are defined in setup but never called, so flax materializes no params for
them — the converted tree matches the reference's exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from panacea_tpu.perception.encoding import pos2posemb3d
from panacea_tpu.perception.head import MemoryState, inverse_sigmoid
from panacea_tpu.perception.petr_head import StreamPETRHead


class PETRHeadDN(StreamPETRHead):
    """Same config surface as StreamPETRHead; memory_len / num_propagated /
    topk_proposals are inert (kept so detector wiring is uniform)."""

    def _uses_memory(self) -> bool:
        return False

    def __call__(self, mlvl_feats, memory: MemoryState, data: Dict[str, Any],
                 pad_hw: Tuple[int, int], dn=None, topk_indexes=None):
        """Single-frame forward (petr_head_dn.py:437-512). ``memory`` is
        passed through untouched (reset_memory is a no-op in the
        reference)."""
        feat = mlvl_feats[self.feat_level]  # (B, N, H, W, C)
        b, n, fh, fw, fc = feat.shape
        pc = jnp.asarray(self.pc_range)
        pad = dn.pad_size if dn is not None else 0

        tokens = feat.reshape(b, n * fh * fw, fc)
        pts, cone = self.frustum_coords(data, (fh, fw), pad_hw)
        if topk_indexes is not None:
            def gather(t):
                idx = jnp.broadcast_to(
                    topk_indexes, topk_indexes.shape[:2] + (t.shape[-1],))
                return jnp.take_along_axis(t, idx, axis=1)

            tokens, pts, cone = gather(tokens), gather(pts), gather(cone)
        pos_embed = self.position_encoder(inverse_sigmoid(pts))
        tokens = self.memory_embed(tokens)
        tokens = self.spatial_alignment(tokens, cone)
        pos_embed = self.featurized_pe(pos_embed, tokens)

        ref, tgt0 = self.make_queries(b, dn, data)
        query_pos = self.query_embedding(pos2posemb3d(ref))
        query = tgt0 if tgt0 is not None else jnp.zeros_like(query_pos)

        cls_list, reg_list = [], []
        attn_bias = dn.attn_mask if dn is not None else None
        ni = 0
        for li in range(self.num_decoder_layers):
            # self-attn over the current queries only (tgt=None path of
            # PETRTemporalTransformer, petr_transformer.py: temp_memory None)
            query = self.self_attns[li](query, query, query, query_pos,
                                        query_pos, attn_bias=attn_bias)
            query = self.norms[ni](query); ni += 1
            query = self.cross_attns[li](query, tokens, query_pos, pos_embed)
            query = self.norms[ni](query); ni += 1
            query = self.ffns[li](query)
            query = self.norms[ni](query); ni += 1

            qn = self.post_norm(query)
            cls_out = self.cls_branch(qn)
            reg_out = self.reg_branch(qn)
            xyz = jax.nn.sigmoid(reg_out[..., 0:3] + inverse_sigmoid(ref))
            xyz = xyz * (pc[3:6] - pc[0:3]) + pc[0:3]
            reg_list.append(jnp.concatenate([xyz, reg_out[..., 3:]], axis=-1))
            cls_list.append(cls_out)

        all_cls = jnp.stack(cls_list)
        all_reg = jnp.stack(reg_list)
        outs = {}
        if pad > 0:
            outs["dn_cls_scores"] = all_cls[:, :, :pad]
            outs["dn_bbox_preds"] = all_reg[:, :, :pad]
            all_cls = all_cls[:, :, pad:]
            all_reg = all_reg[:, :, pad:]
        outs.update({"all_cls_scores": all_cls, "all_bbox_preds": all_reg})
        return outs, memory
