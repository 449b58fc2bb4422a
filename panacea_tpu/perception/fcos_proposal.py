"""FCOSMono3D proposal head — SimMOD's first stage.

TPU-native rebuild of metrics/.../dense_heads/fcos_proposal_head.py:33-1590:
shared FCOS towers over FPN levels (stacked convs + GN), per-task regression
branches (offset, depth, size, rot, velo) with per-level learnable scales,
direction/attr classifiers, centerness on the regression tower, and the
proposal generator (:453-700): objectness = max-class sigmoid x centerness
with a 3x3 max-pool local-NMS, per-token 2.5D centers (grid - offset*stride)
unprojected through inv(K) and cam2lidar, features = concat(cls_tower,
reg_tower), global top-k.

TPU shape: FIXED num_proposal top-k via lax.top_k across all levels in one
jit (the reference's score-threshold filtering / random proposal drop are
training-time ragged ops; the fixed-k superset plus the returned scores
carries the same information — consumers mask on score)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _Tower(nn.Module):
    """stacked ConvModule(conv3x3 + GN32 + relu) (:300-346)."""

    channels: int
    num: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num):
            x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            g = 32 if self.channels % 32 == 0 else self.channels
            x = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=self.dtype,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


class FCOSProposalHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64)
    cls_branch: Sequence[int] = (128, 64)
    centerness_branch: Sequence[int] = (64,)
    reg_keys: Sequence[str] = ("offset", "depth", "size", "rot", "velo")
    reg_dims: Any = None          # defaults per key below
    num_proposal: int = 600
    objectness_with_centerness: bool = True
    objectness_max_pooling: bool = True
    use_direction_classifier: bool = True
    dtype: Dtype = jnp.float32

    def _reg_dims(self):
        base = {"offset": 2, "depth": 1, "size": 3, "rot": 1, "velo": 2,
                "bbox2d": 4}
        return dict(base, **(self.reg_dims or {}))

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[Dict[str, Any]]:
        """feats: per-level (M, H, W, C) with M = B*N cams. Returns the
        reference's per-level outs dicts (:465-540), channels-last."""
        cls_tower = _Tower(self.feat_channels, self.stacked_convs,
                           self.dtype, name="cls_convs")
        reg_tower = _Tower(self.feat_channels, self.stacked_convs,
                           self.dtype, name="reg_convs")
        cls_prev = _Tower(self.cls_branch[-1], len(self.cls_branch),
                          self.dtype, name="conv_cls_prev")
        ctr_prev = _Tower(self.centerness_branch[-1],
                          len(self.centerness_branch), self.dtype,
                          name="conv_centerness_prev")
        conv_cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(-4.595),
                           name="conv_cls")
        conv_ctr = nn.Conv(1, (1, 1), dtype=self.dtype,
                           name="conv_centerness")
        dims = self._reg_dims()
        reg_prevs = {k: _Tower(64, 1, self.dtype, name=f"conv_reg_prev_{k}")
                     for k in self.reg_keys}
        reg_convs = {k: nn.Conv(dims[k], (1, 1), dtype=self.dtype,
                                name=f"conv_reg_{k}")
                     for k in self.reg_keys}
        dir_prev = _Tower(64, 1, self.dtype, name="conv_dir_cls_prev")
        conv_dir = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_dir_cls")
        scales = self.param(
            "scales", nn.initializers.ones,
            (len(self.strides), 2))  # per level: offset, depth (:286-298)

        outs = []
        for li, x in enumerate(feats):
            cf = cls_tower(x)
            rf = reg_tower(x)
            res = {"cls_feat": cf, "reg_feat": rf,
                   "cls_score": conv_cls(cls_prev(cf)),
                   "centerness": conv_ctr(ctr_prev(rf))}
            for k in self.reg_keys:
                v = reg_convs[k](reg_prevs[k](rf))
                if k == "offset":
                    v = v * scales[li, 0]
                elif k == "depth":
                    v = jnp.exp(v * scales[li, 1])  # positive_reg_keys
                elif k == "size":
                    v = jnp.exp(v)
                res[k] = v
            if self.use_direction_classifier:
                res["dir_cls"] = conv_dir(dir_prev(rf))
            outs.append(res)
        return outs

    def get_proposals(self, outs, data: Dict[str, Any], num_cams: int):
        """(:453-700) -> dict(proposal_features (B, K, 2C),
        proposal_positions (B, K, 5) [xyz lidar, view, level],
        proposal_scores (B, K)). ``data``: intrinsics (B, N, 4, 4),
        extrinsics = lidar2cam (B, N, 4, 4)."""
        n = num_cams
        m = outs[0]["cls_score"].shape[0]
        b = m // n
        intr = data["intrinsics"].reshape(m, 4, 4)
        l2c = data["extrinsics"].reshape(m, 4, 4)
        inv_k = jnp.linalg.inv(intr)
        c2l = jnp.linalg.inv(l2c)

        scores_all, feats_all, pos_all, meta_all = [], [], [], []
        for li, res in enumerate(outs):
            _, h, w, _ = res["cls_score"].shape
            obj = jax.nn.sigmoid(res["cls_score"]).max(-1, keepdims=True)
            if self.objectness_with_centerness:
                obj = obj * jax.nn.sigmoid(res["centerness"])
            if self.objectness_max_pooling:
                mx = nn.max_pool(obj, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
                obj = obj * (obj >= mx)
            stride = self.strides[li]
            ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                  indexing="ij")
            pts = jnp.stack([xs, ys], -1).reshape(1, h * w, 2) * stride \
                + stride // 2
            off = res["offset"].reshape(m, h * w, 2) * stride
            c2d = pts - off
            d = res["depth"].reshape(m, h * w, 1)
            uvz1 = jnp.concatenate(
                [c2d * d, d, jnp.ones_like(d)], -1)
            cam = jnp.einsum("mij,mpj->mpi", inv_k, uvz1)
            lid = jnp.einsum("mij,mpj->mpi", c2l, cam)[..., :3]
            feat = jnp.concatenate(
                [res["cls_feat"], res["reg_feat"]], -1).reshape(m, h * w, -1)
            view = jnp.broadcast_to(
                (jnp.arange(m) % n)[:, None], (m, h * w))
            scores_all.append(obj.reshape(m, h * w))
            feats_all.append(feat)
            pos_all.append(lid)
            meta_all.append(jnp.stack(
                [view, jnp.full((m, h * w), li)], -1))
        scores = jnp.concatenate(scores_all, 1).reshape(b, -1)
        feats = jnp.concatenate(feats_all, 1)
        feats = feats.reshape(b, -1, feats.shape[-1])
        pos = jnp.concatenate(pos_all, 1).reshape(b, -1, 3)
        meta = jnp.concatenate(meta_all, 1).reshape(b, -1, 2)
        k = min(self.num_proposal, scores.shape[1])
        top_s, idx = jax.lax.top_k(scores, k)

        def take(t):
            return jnp.take_along_axis(
                t, idx[..., None].astype(jnp.int32), axis=1)

        return {
            "proposal_features": take(feats),
            "proposal_positions": jnp.concatenate(
                [take(pos), take(meta.astype(jnp.float32))], -1),
            "proposal_scores": top_s,
        }
