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


class _Branch(nn.Module):
    """_init_branch (:348-376): conv3x3+GN+relu stack with PER-ELEMENT
    widths, e.g. cls_branch (128, 64) -> 256->128 then 128->64."""

    widths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            g = 32 if w % 32 == 0 else w
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
    # per-key prev-branch widths (reference reg_branch defaults :111-117,
    # last element = output dim, held in reg_dims instead); velo has NO
    # prev branch (Identity, conv straight off the reg tower)
    reg_branch: Sequence[Sequence[int]] = (
        (128, 64), (128, 64), (64,), (64,), ())
    dir_branch: Sequence[int] = (64,)
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
        cls_tower = _Branch((self.feat_channels,) * self.stacked_convs,
                            self.dtype, name="cls_convs")
        reg_tower = _Branch((self.feat_channels,) * self.stacked_convs,
                            self.dtype, name="reg_convs")
        cls_prev = _Branch(self.cls_branch, self.dtype, name="conv_cls_prev")
        ctr_prev = _Branch(self.centerness_branch, self.dtype,
                           name="conv_centerness_prev")
        conv_cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(-4.595),
                           name="conv_cls")
        conv_ctr = nn.Conv(1, (1, 1), dtype=self.dtype,
                           name="conv_centerness")
        dims = self._reg_dims()
        reg_prevs = {k: (_Branch(br, self.dtype, name=f"conv_reg_prev_{k}")
                         if len(br) else None)
                     for k, br in zip(self.reg_keys, self.reg_branch)}
        reg_convs = {k: nn.Conv(dims[k], (1, 1), dtype=self.dtype,
                                name=f"conv_reg_{k}")
                     for k in self.reg_keys}
        dir_prev = _Branch(self.dir_branch, self.dtype,
                           name="conv_dir_cls_prev")
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
                p = reg_prevs[k]
                v = reg_convs[k](p(rf) if p is not None else rf)
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


# ---------------------------------------------------------------- training

def fcos_targets(
    featmap_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    gt2d_boxes: Sequence["np.ndarray"],
    gt2d_labels: Sequence["np.ndarray"],
    gt_depths: Sequence["np.ndarray"] = None,
    num_classes: int = 10,
    center_radius: float = 1.5,
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 48), (48, 96), (96, 192), (192, 1e4)),
    centerness_alpha: float = 2.5,
):
    """Host-side per-token FCOS targets (fcos_proposal_head.py
    _get_target_single :1326-1405: center sampling within radius*stride of
    the gt center, regress range gated on the max distance to the 2D box
    EDGES, nearest-center gt wins on conflict, centerness =
    exp(-alpha * |offset to center| / (1.414 * radius * stride))). Per
    image: gt2d_boxes (G, 4) xyxy image px, gt2d_labels (G,), gt_depths
    optional (G,). Centers are the 2D box centers (the reference's default
    uses projected 3D centers; the 2D-center variant is its
    using_2d_centers branch, :1328-1330, :1395-1397).

    Returns (labels (M, P) int32 with num_classes = bg, centerness (M, P),
    offset (M, P, 2) target in stride units, depth (M, P), num_pos) with
    P = sum over levels of H*W."""
    import numpy as np

    m = len(gt2d_boxes)
    per_level = [h * w for h, w in featmap_sizes]
    p = int(sum(per_level))
    labels = np.full((m, p), num_classes, np.int32)
    ctr = np.zeros((m, p), np.float32)
    off = np.zeros((m, p, 2), np.float32)
    dep = np.zeros((m, p), np.float32)
    total = 0.0
    for mi in range(m):
        boxes = np.asarray(gt2d_boxes[mi], np.float32).reshape(-1, 4)
        lbls = np.asarray(gt2d_labels[mi]).reshape(-1)
        if len(boxes) == 0:
            continue
        depths = (np.asarray(gt_depths[mi], np.float32).reshape(-1)
                  if gt_depths is not None else np.ones(len(boxes)))
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2
        start = 0
        for li, ((h, w), s) in enumerate(zip(featmap_sizes, strides)):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            pts = np.stack([xs.reshape(-1), ys.reshape(-1)],
                           -1).astype(np.float32) * s + s // 2   # (hw, 2)
            d = np.abs(pts[:, None] - centers[None])             # (hw, G, 2)
            # condition1: inside the radius*stride center box (:1350-1359)
            in_ctr = (d.max(-1) < center_radius * s)
            # condition2: max distance to the 2D box EDGES inside the
            # level's regress range (:1362-1365) — NOT center distance,
            # which could never reach the coarser levels' lower bounds
            edge = np.stack([
                pts[:, None, 0] - boxes[None, :, 0],
                pts[:, None, 1] - boxes[None, :, 1],
                boxes[None, :, 2] - pts[:, None, 0],
                boxes[None, :, 3] - pts[:, None, 1],
            ], -1).max(-1)                                       # (hw, G)
            rng_lo, rng_hi = regress_ranges[min(li,
                                                len(regress_ranges) - 1)]
            in_rng = (edge >= rng_lo) & (edge <= rng_hi)
            cand = in_ctr & in_rng
            if not cand.any():
                start += h * w
                continue
            # nearest-center gt wins on ambiguity (:1369-1372)
            cdist = np.sqrt((d ** 2).sum(-1))                    # (hw, G)
            gi = np.where(cand, cdist, np.inf).argmin(1)
            pos = cand.any(1)
            idx = np.where(pos)[0]
            g = gi[idx]
            labels[mi, start + idx] = lbls[g]
            # centerness: exponential decay with the center offset relative
            # to the sampling radius (:1395-1405)
            ctr[mi, start + idx] = np.exp(
                -centerness_alpha
                * cdist[idx, g] / (1.414 * center_radius * s))
            off[mi, start + idx] = (pts[idx] - centers[g]) / s
            dep[mi, start + idx] = depths[g]
            total += float(pos.sum())
            start += h * w
    return labels, ctr, off, dep, np.float32(total)


def fcos_loss(outs, targets, num_classes: int = 10) -> Dict[str, Any]:
    """Focal cls + centerness BCE + offset SmoothL1 + depth SmoothL1 on
    positives, /num_pos (fcos_proposal_head.py loss :604-700 at its core;
    size/rot/velo terms follow the same pattern and are omitted — SimMOD's
    second stage supervises the 3D box)."""
    import optax

    from panacea_tpu.perception.train_losses import sigmoid_focal_loss

    labels, ctr_t, off_t, dep_t, num_pos = [jnp.asarray(t) for t in targets]
    n = jnp.maximum(num_pos, 1.0)
    cls = jnp.concatenate(
        [o["cls_score"].reshape(o["cls_score"].shape[0], -1, num_classes)
         for o in outs], 1)
    ctr = jnp.concatenate(
        [o["centerness"].reshape(o["centerness"].shape[0], -1)
         for o in outs], 1)
    off = jnp.concatenate(
        [o["offset"].reshape(o["offset"].shape[0], -1, 2) for o in outs], 1)
    dep = jnp.concatenate(
        [o["depth"].reshape(o["depth"].shape[0], -1) for o in outs], 1)

    pos = (labels < num_classes).astype(jnp.float32)
    loss_cls = sigmoid_focal_loss(cls, labels, num_classes).sum() / n
    loss_ctr = (optax.sigmoid_binary_cross_entropy(ctr, ctr_t)
                * pos).sum() / n
    huber = optax.huber_loss(off, off_t, delta=1.0 / 9.0).sum(-1)
    loss_off = (huber * pos).sum() / n
    loss_dep = (optax.huber_loss(dep, dep_t, delta=1.0 / 9.0)
                * pos).sum() / n
    return {"fcos_loss_cls": loss_cls, "fcos_loss_centerness": loss_ctr,
            "fcos_loss_offset": loss_off, "fcos_loss_depth": loss_dep}
