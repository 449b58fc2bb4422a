"""StreamPETR SparseHead — query-propagation detection head (flax).

TPU-native rebuild of metrics/.../dense_heads/sparse_head.py:20-997 at the
production eval config (streampetr_r50_atss_512x256_window.py:101-147):
644 queries, 1024-slot memory, top-256 propagated, 6 decoder layers of
[self-attn over queries+memory, deformable multi-cam cross-attn, FFN], shared
cls/reg branches across layers (the reference's ModuleList repeats ONE module
instance: sparse_head.py:218-221).

Key design change: the reference mutates memory as module attributes
(reset/pre_update/post_update); here memory is an explicit ``MemoryState``
pytree threaded through ``__call__`` — pure-functional, jit/scan-friendly.
Covers inference AND the denoising training branch (prepare_for_dn,
sparse_head.py:300-383): ``__call__`` takes a DN pack and emits the
dn_cls/dn_bbox slices consumed by perception/denoise.py's dn_loss.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.ops.attention import attention, merge_heads, split_heads
from panacea_tpu.perception.deformable import DeformableFeatureAggregation
from panacea_tpu.perception.encoding import (
    MLN,
    MLNv2,
    nerf_positional_encoding,
    pos2posemb1d,
    pos2posemb3d,
)

Dtype = Any


class MemoryState(NamedTuple):
    """Query memory bank (sparse_head.py:374-436), all (B, M, ...)."""

    embedding: jnp.ndarray        # (B, M, C)
    reference_point: jnp.ndarray  # (B, M, 3) in global/lidar coords
    timestamp: jnp.ndarray        # (B, M, 1)
    egopose: jnp.ndarray          # (B, M, 4, 4)
    velo: jnp.ndarray             # (B, M, 2)


def init_memory(batch: int, memory_len: int = 1024,
                embed_dims: int = 256) -> MemoryState:
    return MemoryState(
        embedding=jnp.zeros((batch, memory_len, embed_dims)),
        reference_point=jnp.zeros((batch, memory_len, 3)),
        timestamp=jnp.zeros((batch, memory_len, 1)),
        egopose=jnp.zeros((batch, memory_len, 4, 4)),
        velo=jnp.zeros((batch, memory_len, 2)),
    )


def transform_reference_points(ref: jnp.ndarray, pose: jnp.ndarray):
    """(misc.py:215-224): ref (B, M, 3), pose (B, 4, 4)."""
    pts = jnp.concatenate([ref, jnp.ones_like(ref[..., :1])], axis=-1)
    return jnp.einsum("bij,bmj->bmi", pose, pts)[..., :3]


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MultiheadSelfAttention(nn.Module):
    """mmcv MultiheadAttention semantics: q=query+qpos, k=key+kpos, v=value;
    residual add (detr3d_transformer.py:420-437)."""

    embed_dims: int = 256
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, query_pos, key_pos, attn_bias=None):
        d = self.embed_dims // self.num_heads
        q = nn.Dense(self.embed_dims, dtype=self.dtype, name="q_proj")(
            query + query_pos
        )
        k = nn.Dense(self.embed_dims, dtype=self.dtype, name="k_proj")(
            key + key_pos
        )
        v = nn.Dense(self.embed_dims, dtype=self.dtype, name="v_proj")(value)
        qh = split_heads(q, self.num_heads)
        kh = split_heads(k, self.num_heads)
        vh = split_heads(v, self.num_heads)
        if attn_bias is None:
            out = attention(qh, kh, vh)
        else:
            # DN training path: additive (-inf) mask, XLA einsum attention
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qh, kh,
                preferred_element_type=jnp.float32,
            ) * (d ** -0.5)
            logits = logits + attn_bias[None, None]
            probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="out_proj")(
            merge_heads(out)
        )
        return query + out


class FFN(nn.Module):
    """mmcv FFN: 2 fc with relu, residual."""

    embed_dims: int = 256
    feedforward_channels: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(h)
        return x + h


class SparseHead(nn.Module):
    num_classes: int = 10
    embed_dims: int = 256
    num_query: int = 644
    memory_len: int = 1024
    topk_proposals: int = 256
    num_propagated: int = 256
    num_decoder_layers: int = 6
    num_reg_fcs: int = 2
    code_size: int = 10
    num_levels: int = 5
    num_pts: int = 13
    num_groups: int = 8
    num_cams: int = 6
    with_ego_pos: bool = True
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.embed_dims
        self.reference_points = self.param(
            "reference_points", nn.initializers.uniform(scale=1.0),
            (self.num_query, 3),
        )
        self.pseudo_reference_points = self.param(
            "pseudo_reference_points", nn.initializers.uniform(scale=1.0),
            (self.num_propagated, 3),
        )
        self.query_embedding = nn.Sequential(
            [nn.Dense(c, dtype=self.dtype), nn.relu,
             nn.Dense(c, dtype=self.dtype)], name="query_embedding",
        )
        self.time_embedding = nn.Sequential(
            [nn.Dense(c, dtype=self.dtype), nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)],
            name="time_embedding",
        )
        self.ego_pose_pe = MLN(f_dim=c, name="ego_pose_pe")
        self.ego_pose_memory = MLN(f_dim=c, name="ego_pose_memory")
        # MLNv2: no LayerNorm (detr3d_transformer.py:24-56, :79) - the
        # sparse transformer modulates RAW features; only the dense
        # PETR head uses the LN-modulating MLN for its alignment
        self.spatial_alignment = MLNv2(f_dim=c, name="spatial_alignment")

        self.self_attns = [
            MultiheadSelfAttention(c, dtype=self.dtype, name=f"self_attn_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.cross_attns = [
            DeformableFeatureAggregation(
                embed_dims=c, num_groups=self.num_groups,
                num_levels=self.num_levels, num_cams=self.num_cams,
                num_pts=self.num_pts, dtype=self.dtype, name=f"cross_attn_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.ffns = [
            FFN(c, dtype=self.dtype, name=f"ffn_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}")
            for i in range(3 * self.num_decoder_layers)
        ]
        # shared across decoder layers (sparse_head.py:218-221)
        cls_layers = []
        for _ in range(self.num_reg_fcs):
            cls_layers += [nn.Dense(c, dtype=self.dtype),
                           nn.LayerNorm(epsilon=1e-5, dtype=self.dtype), nn.relu]
        cls_layers += [nn.Dense(self.num_classes, dtype=self.dtype,
                                bias_init=nn.initializers.constant(-4.595))]
        self.cls_branch = nn.Sequential(cls_layers, name="cls_branch")
        reg_layers = []
        for _ in range(self.num_reg_fcs):
            reg_layers += [nn.Dense(c, dtype=self.dtype), nn.relu]
        reg_layers += [nn.Dense(self.code_size, dtype=self.dtype)]
        self.reg_branch = nn.Sequential(reg_layers, name="reg_branch")

    # ------------------------------------------------------------------
    def pre_update_memory(self, memory: MemoryState, data) -> MemoryState:
        """Carry memory into the current frame (sparse_head.py:381-405):
        advance timestamps, re-express poses/points in the new ego frame,
        zero on scene change, seed pseudo points when fresh."""
        x = data["prev_exists"].reshape(-1)  # (B,) 1.0 = continue scene
        b = x.shape[0]
        keep = x.reshape(b, 1, 1)
        ts = (memory.timestamp + data["timestamp"].reshape(b, 1, 1)) * keep
        egopose = jnp.einsum(
            "bij,bmjk->bmik", data["ego_pose_inv"], memory.egopose
        ) * keep[..., None]
        ref = transform_reference_points(
            memory.reference_point, data["ego_pose_inv"]
        ) * keep
        emb = memory.embedding * keep
        velo = memory.velo * keep

        pc = jnp.asarray(self.pc_range)
        pseudo = self.pseudo_reference_points * (pc[3:6] - pc[0:3]) + pc[0:3]
        fresh = (1.0 - x).reshape(b, 1, 1)
        ref = ref.at[:, : self.num_propagated].add(fresh * pseudo[None])
        egopose = egopose.at[:, : self.num_propagated].add(
            fresh[..., None] * jnp.eye(4)[None, None]
        )
        return MemoryState(emb, ref, ts, egopose, velo)

    def temporal_alignment(self, query_pos, tgt, reference_points,
                           memory: MemoryState):
        """(sparse_head.py:244-273)"""
        b = query_pos.shape[0]
        pc = jnp.asarray(self.pc_range)
        temp_ref = (memory.reference_point - pc[:3]) / (pc[3:6] - pc[0:3])
        temp_pos = self.query_embedding(pos2posemb3d(temp_ref))
        temp_memory = memory.embedding
        rec_ego_pose = jnp.broadcast_to(
            jnp.eye(4), (b, query_pos.shape[1], 4, 4)
        )
        if self.with_ego_pos:
            rec_motion = jnp.concatenate(
                [jnp.zeros_like(reference_points[..., :3]),
                 rec_ego_pose[..., :3, :].reshape(*rec_ego_pose.shape[:-2], 12)],
                axis=-1,
            )
            rec_motion = nerf_positional_encoding(rec_motion)
            tgt = self.ego_pose_memory(tgt, rec_motion)
            query_pos = self.ego_pose_pe(query_pos, rec_motion)
            mem_motion = jnp.concatenate(
                [memory.velo, memory.timestamp,
                 memory.egopose[..., :3, :].reshape(
                     *memory.egopose.shape[:-2], 12)], axis=-1,
            )
            mem_motion = nerf_positional_encoding(mem_motion)
            temp_pos = self.ego_pose_pe(temp_pos, mem_motion)
            temp_memory = self.ego_pose_memory(temp_memory, mem_motion)

        query_pos = query_pos + self.time_embedding(
            pos2posemb1d(jnp.zeros_like(reference_points[..., :1]),
                         self.embed_dims)
        )
        temp_pos = temp_pos + self.time_embedding(
            pos2posemb1d(memory.timestamp, self.embed_dims)
        )

        np_ = self.num_propagated
        tgt = jnp.concatenate([tgt, temp_memory[:, :np_]], axis=1)
        query_pos = jnp.concatenate([query_pos, temp_pos[:, :np_]], axis=1)
        reference_points = jnp.concatenate(
            [reference_points, temp_ref[:, :np_]], axis=1
        )
        rec_ego_pose = jnp.broadcast_to(
            jnp.eye(4), (b, query_pos.shape[1], 4, 4)
        )
        temp_memory = temp_memory[:, np_:]
        temp_pos = temp_pos[:, np_:]
        return tgt, query_pos, reference_points, temp_memory, temp_pos, \
            rec_ego_pose

    # ------------------------------------------------------------------
    def make_queries(self, b: int, dn=None, data=None):
        """(ref (B, Q, 3) in [0,1], tgt or None->zeros). Learned reference
        points (sparse_head.py:216, :439); SparseHeadProposal overrides this
        with proposal-driven queries from data['proposal_*']
        (sparse_head_v3.py:503-519)."""
        ref = jnp.broadcast_to(
            self.reference_points[None], (b, self.num_query, 3)
        )
        if dn is not None:
            ref = jnp.concatenate([dn.ref, ref], axis=1)
        return ref, None

    def __call__(self, mlvl_feats, memory: MemoryState, data: Dict[str, Any],
                 pad_hw: Tuple[int, int], dn=None):
        """mlvl_feats: list of (B, N, H, W, C); data: prev_exists (B,),
        timestamp (B,), ego_pose/-inv (B,4,4), lidar2img (B,N,4,4),
        intrinsics (B,N,4,4), extrinsics (B,N,4,4). ``dn``: optional DNPack
        (training) — noised-gt queries prepended with the group attention mask
        (sparse_head.py:275-355).

        Returns (outs, new_memory); outs: all_cls_scores/all_bbox_preds of
        shape (L, B, Q, ...), plus dn slices when dn is given."""
        memory = self.pre_update_memory(memory, data)
        b = mlvl_feats[0].shape[0]
        pc = jnp.asarray(self.pc_range)
        pad = dn.pad_size if dn is not None else 0

        # spatial alignment of features with camera parameters
        # (detr3d_transformer.py:140-151)
        intr = data["intrinsics"] / 1e3
        extr = data["extrinsics"][..., :3, :]
        mln_in = jnp.concatenate(
            [intr[..., 0, 0:1], intr[..., 1, 1:2],
             extr.reshape(*extr.shape[:-2], 12)], axis=-1,
        )  # (B, N, 14)
        feats = [
            self.spatial_alignment(f, mln_in[:, :, None, None, :])
            for f in mlvl_feats
        ]

        ref, tgt0 = self.make_queries(b, dn, data)
        query_pos = self.query_embedding(pos2posemb3d(ref))
        tgt = tgt0 if tgt0 is not None else jnp.zeros_like(query_pos)
        tgt, query_pos, ref, temp_memory, temp_pos, rec_ego_pose = \
            self.temporal_alignment(query_pos, tgt, ref, memory)

        cls_list, reg_list, dec_list = [], [], []
        query = tgt
        ref_lidar = ref * (pc[3:6] - pc[0:3]) + pc[0:3]
        attn_bias = dn.attn_mask if dn is not None else None
        ni = 0
        for li in range(self.num_decoder_layers):
            key = jnp.concatenate([query, temp_memory], axis=1)
            key_pos = jnp.concatenate([query_pos, temp_pos], axis=1)
            query = self.self_attns[li](query, key, key, query_pos, key_pos,
                                        attn_bias=attn_bias)
            query = self.norms[ni](query); ni += 1
            query = self.cross_attns[li](
                query, query_pos, feats, ref_lidar, data["lidar2img"], pad_hw
            )
            query = self.norms[ni](query); ni += 1
            query = self.ffns[li](query)
            query = self.norms[ni](query); ni += 1

            cls_out = self.cls_branch(query)
            reg_out = self.reg_branch(query)
            xyz = jax.nn.sigmoid(reg_out[..., 0:3] + inverse_sigmoid(ref))
            xyz = xyz * (pc[3:6] - pc[0:3]) + pc[0:3]
            reg_out = jnp.concatenate([xyz, reg_out[..., 3:]], axis=-1)
            cls_list.append(cls_out)
            reg_list.append(reg_out)
            dec_list.append(query)

        all_cls = jnp.stack(cls_list)
        all_reg = jnp.stack(reg_list)
        outs_dec = jnp.stack(dec_list)

        outs = {}
        if pad > 0:
            outs["dn_cls_scores"] = all_cls[:, :, :pad]
            outs["dn_bbox_preds"] = all_reg[:, :, :pad]
            all_cls = all_cls[:, :, pad:]
            all_reg = all_reg[:, :, pad:]
            outs_dec = outs_dec[:, :, pad:]
            rec_ego_pose = rec_ego_pose[:, pad:]
        outs.update({"all_cls_scores": all_cls, "all_bbox_preds": all_reg})

        new_memory = self.post_update_memory(
            memory, data, rec_ego_pose, all_cls, all_reg, outs_dec
        )
        return outs, new_memory

    def post_update_memory(self, memory, data, rec_ego_pose, all_cls, all_reg,
                           outs_dec) -> MemoryState:
        """Top-k proposal propagation (sparse_head.py:407-436)."""
        rec_ref = all_reg[-1][..., :3]
        rec_velo = all_reg[-1][..., -2:]
        rec_mem = outs_dec[-1]
        rec_score = jax.nn.sigmoid(all_cls[-1]).max(axis=-1, keepdims=True)
        rec_ts = jnp.zeros_like(rec_score)

        k = self.topk_proposals
        _, top_idx = jax.lax.top_k(rec_score[..., 0], k)  # (B, k)

        def gather(x):
            return jnp.take_along_axis(
                x, top_idx.reshape(top_idx.shape + (1,) * (x.ndim - 2)), axis=1
            )

        new = MemoryState(
            embedding=jnp.concatenate([gather(rec_mem), memory.embedding],
                                      axis=1)[:, : self.memory_len],
            reference_point=jnp.concatenate(
                [gather(rec_ref), memory.reference_point], axis=1
            )[:, : self.memory_len],
            timestamp=jnp.concatenate([gather(rec_ts), memory.timestamp],
                                      axis=1)[:, : self.memory_len],
            egopose=jnp.concatenate([gather(rec_ego_pose), memory.egopose],
                                    axis=1)[:, : self.memory_len],
            velo=jnp.concatenate([gather(rec_velo), memory.velo],
                                 axis=1)[:, : self.memory_len],
        )
        # back to global frame; timestamps relative to now
        ref_g = transform_reference_points(new.reference_point,
                                           data["ego_pose"])
        ts = new.timestamp - data["timestamp"].reshape(-1, 1, 1)
        ego = jnp.einsum("bij,bmjk->bmik", data["ego_pose"], new.egopose)
        return MemoryState(new.embedding, ref_g, ts, ego, new.velo)
