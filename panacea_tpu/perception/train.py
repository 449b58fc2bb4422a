"""StreamPETR detector training step — full experiment-config recipe.

Reference recipe (streampetr_r50_atss_512x256_window.py:36-276 and the mmdet
runner around it): GridMask on the input images, history frames without
gradients (num_frame_losses=1), SparseHead with the DN (denoising) query
branch, HungarianAssigner3D matching run per decoder layer with the layer
losses summed (mmdet DETR-style loss), plus the ATSS 2D auxiliary head on
the last frame's FPN features.

TPU-native shape: ONE jitted forward+backward per step. The reference runs
the CPU ``linear_sum_assignment`` between forward and loss; here it rides
inside the jit as a ``jax.pure_callback`` on stop-gradient'ed predictions
(fixed output shapes: per-query targets padded to Q), so the backbone runs
once per step instead of twice. ATSS assignment depends only on anchors+GT,
so its targets are precomputed on host per batch (atss_targets) and passed
in as arrays.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from panacea_tpu.perception.train_losses import (
    CODE_WEIGHTS,
    sigmoid_focal_loss,
)


class DetTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


# --------------------------------------------------------------------------
# host-side batched Hungarian assignment (runs inside jit via pure_callback)
# --------------------------------------------------------------------------

def _focal_cost_np(logits: np.ndarray, gt_labels: np.ndarray,
                   gamma: float = 2.0, alpha: float = 0.25,
                   eps: float = 1e-12) -> np.ndarray:
    """mmdet FocalLossCost (numpy twin of train_losses.focal_cls_cost)."""
    p = 1.0 / (1.0 + np.exp(-logits))
    neg = (1 - alpha) * p**gamma * -np.log(1 - p + eps)
    pos = alpha * (1 - p) ** gamma * -np.log(p + eps)
    return (pos - neg)[:, gt_labels]


def _bbox_cost_np(bbox_preds: np.ndarray, gt_norm: np.ndarray,
                  match_costs: np.ndarray) -> np.ndarray:
    """mmdet BBox3DL1Cost under HungarianAssigner3D's code-weight scaling
    (hungarian_assigner_3d.py:59-67: both pred and normalized gt are
    multiplied by match_costs=code_weights before the L1; xyz stays in raw
    meters — normalize_bbox does NOT pc-normalize — and with_velo=False
    restricts to the first 8 dims, sparse_head.py:565)."""
    p = bbox_preds[..., :8] * match_costs[:8]
    g = gt_norm[..., :8] * match_costs[:8]
    return np.abs(p[:, None] - g[None, :]).sum(-1)


def make_batched_assigner(pc_range, num_classes: int,
                          cls_weight: float, bbox_weight: float):
    """Returns host fn: (cls (B,Q,C), bbox (B,Q,10), gt_norm (B,G,10),
    gt_labels (B,G) with -1 pad) -> per-query targets
    (labels_q (B,Q) i32, gt_norm_q (B,Q,10) f32, mask_q (B,Q) f32,
    asg_q (B,Q) i32 original-G index of the matched gt (0 where unmatched),
    num_pos () f32)."""
    mc = np.asarray(CODE_WEIGHTS, np.float32)  # match_costs default

    def assign(cls_logits, bbox_preds, gt_norm, gt_labels):
        from scipy.optimize import linear_sum_assignment

        cls_logits = np.asarray(cls_logits, np.float32)
        bbox_preds = np.asarray(bbox_preds, np.float32)
        gt_norm = np.asarray(gt_norm, np.float32)
        gt_labels = np.asarray(gt_labels)
        b, q = cls_logits.shape[:2]
        labels_q = np.full((b, q), num_classes, np.int32)
        gt_norm_q = np.zeros((b, q, gt_norm.shape[-1]), np.float32)
        mask_q = np.zeros((b, q), np.float32)
        asg_q = np.zeros((b, q), np.int32)
        total = 0.0
        for bi in range(b):
            valid = gt_labels[bi] >= 0
            g = int(valid.sum())
            if g == 0:
                continue
            orig_idx = np.nonzero(valid)[0]
            gl = gt_labels[bi][valid].astype(np.int64)
            gn = gt_norm[bi][valid]
            cost = (
                cls_weight * _focal_cost_np(cls_logits[bi], gl)
                + bbox_weight * _bbox_cost_np(bbox_preds[bi],
                                              np.nan_to_num(gn), mc)
            )
            rows, cols = linear_sum_assignment(np.nan_to_num(cost))
            labels_q[bi, rows] = gl[cols]
            gt_norm_q[bi, rows] = gn[cols]
            mask_q[bi, rows] = 1.0
            asg_q[bi, rows] = orig_idx[cols].astype(np.int32)
            total += g
        return labels_q, gt_norm_q, mask_q, asg_q, np.float32(total)

    return assign


# --------------------------------------------------------------------------
# ATSS 2D auxiliary targets (anchor-based: host precompute, no predictions)
# --------------------------------------------------------------------------

class ATSSTargets(NamedTuple):
    labels: jnp.ndarray       # (BN, A) int32, num_classes = background
    gt_xyxy: jnp.ndarray      # (BN, A, 4) matched gt box per anchor
    centerness: jnp.ndarray   # (BN, A)
    num_pos: jnp.ndarray      # () f32


def atss_targets(
    anchors_per_level: List[np.ndarray],
    gt2d_boxes: Sequence[np.ndarray],   # per image (Gi, 4) xyxy
    gt2d_labels: Sequence[np.ndarray],  # per image (Gi,)
    num_classes: int = 10,
    topk: int = 9,
) -> ATSSTargets:
    """Assignment + targets for a batch of images (anchors are static per
    input geometry). Reference: ATSSAssigner(topk=9) + get_targets
    (config window.py:92-95)."""
    from panacea_tpu.perception.atss import atss_assign, centerness_target

    anchors = np.concatenate(anchors_per_level, axis=0)
    a = len(anchors)
    bn = len(gt2d_boxes)
    labels = np.full((bn, a), num_classes, np.int32)
    gt_xyxy = np.zeros((bn, a, 4), np.float32)
    ctr = np.zeros((bn, a), np.float32)
    total = 0.0
    for i in range(bn):
        boxes, lbls = np.asarray(gt2d_boxes[i]), np.asarray(gt2d_labels[i])
        if len(boxes) == 0:
            continue
        assigned = atss_assign(anchors_per_level, boxes, topk=topk)
        pos = assigned >= 0
        labels[i, pos] = lbls[assigned[pos]].astype(np.int32)
        gt_xyxy[i, pos] = boxes[assigned[pos]]
        ctr[i, pos] = centerness_target(anchors[pos], boxes[assigned[pos]])
        total += float(pos.sum())
    return ATSSTargets(jnp.asarray(labels), jnp.asarray(gt_xyxy),
                       jnp.asarray(ctr), jnp.float32(total))


def atss_loss(
    atss_outs,                       # per-level (cls (BN,h,w,C), reg, ctr)
    anchors_per_level: List[np.ndarray],
    tgt: ATSSTargets,
    num_classes: int = 10,
    cls_weight: float = 1.0,
    bbox_weight: float = 2.0,
    ctr_weight: float = 1.0,
    reduce_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Focal cls + centerness-weighted GIoU + centerness BCE
    (ATSSTaskHead losses, config window.py:79-95).

    ``reduce_fn`` is the mmdet ``reduce_mean`` hook (atss_head.py:310-328):
    under data parallelism the avg factors (num_pos, total centerness) are
    pmean'd across ranks BEFORE normalizing, so pmean'd grads reproduce the
    reference's ratio-of-sums loss instead of a mean-of-ratios."""
    from panacea_tpu.perception.atss import delta_decode, giou_loss

    if reduce_fn is None:
        reduce_fn = lambda x: x  # noqa: E731

    cls = jnp.concatenate(
        [o[0].reshape(o[0].shape[0], -1, num_classes) for o in atss_outs], 1)
    reg = jnp.concatenate(
        [o[1].reshape(o[1].shape[0], -1, 4) for o in atss_outs], 1)
    ctr = jnp.concatenate(
        [o[2].reshape(o[2].shape[0], -1) for o in atss_outs], 1)
    anchors = jnp.asarray(np.concatenate(anchors_per_level, 0))  # (A, 4)

    n_pos = jnp.maximum(reduce_fn(tgt.num_pos), 1.0)
    cls_l = sigmoid_focal_loss(cls, tgt.labels, num_classes).sum() / n_pos

    pos = (tgt.labels < num_classes).astype(jnp.float32)
    bn, a = pos.shape
    decoded = delta_decode(
        jnp.broadcast_to(anchors, (bn, a, 4)).reshape(-1, 4),
        reg.reshape(-1, 4),
    ).reshape(bn, a, 4)
    giou = giou_loss(decoded.reshape(-1, 4),
                     tgt.gt_xyxy.reshape(-1, 4)).reshape(bn, a)
    # centerness-weighted GIoU, normalized by total centerness (mmdet ATSS)
    w = tgt.centerness * pos
    bbox_l = (giou * w).sum() / jnp.maximum(reduce_fn(w.sum()), 1e-6)

    ctr_bce = optax.sigmoid_binary_cross_entropy(ctr, tgt.centerness)
    ctr_l = (ctr_bce * pos).sum() / n_pos

    return {
        "loss_atss_cls": cls_weight * cls_l,
        "loss_atss_bbox": bbox_weight * bbox_l,
        "loss_atss_ctr": ctr_weight * ctr_l,
    }


# --------------------------------------------------------------------------
# the train step factory
# --------------------------------------------------------------------------

def make_detector_train(
    model,
    optimizer,
    pc_range,
    num_classes: int = 10,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
    use_grid_mask: bool = True,
    with_dn: bool = True,
    dn_scalar: int = 10,
    dn_noise_scale: float = 1.0,
    dn_split: float = 0.75,
    dn_weight: float = 1.0,
    anchors_per_level: Optional[List[np.ndarray]] = None,
    num_frame_losses: int = 1,
    streaming: bool = False,
    mesh=None,
    data_axis: str = "dp",
):
    """Returns (forward_fn, train_step).

    train_step(state, rng, imgs_seq, data_seq, gt_boxes (B,G,9) zero-pad,
    gt_labels (B,G) -1-pad, atss_tgt: Optional[ATSSTargets]) ->
    (state, metrics dict of float loss terms).

    ``mesh``: optional 1-axis data-parallel mesh (axis ``data_axis``) —
    the TPU-native equivalent of the reference's DDP gradient allreduce
    (tools/train.py -> MMDistributedDataParallel): the batch is sharded
    over the axis, the Hungarian/host callbacks run per shard on each
    shard's host (exactly like per-rank assigners under torch DDP), loss
    avg factors are pmean'd across the axis before normalizing (mmdet
    ``reduce_mean``, streampetr_head.py:824-834 / atss_head.py:310-328),
    and grads/metrics are ``lax.pmean``'d before the update — so every
    replica applies a gradient identical to the single-device global-batch
    one (ratio of sums, not mean of per-shard ratios). Params and
    optimizer state stay replicated.

    ``streaming=True`` (seq_mode recipes, nopretrain.py:231-233): the step
    consumes ONE frame plus the recurrent MemoryState and becomes
    train_step(state, rng, imgs (B,N,H,W,3), data, memory, gt_boxes,
    gt_labels, atss_tgt, ...) -> (state, new_memory, metrics) — thread
    new_memory into the next step; prev_exists in ``data`` gates the
    scene/seq-split memory reset."""
    assign_host = make_batched_assigner(pc_range, num_classes,
                                        cls_weight, bbox_weight)
    cw = jnp.asarray(CODE_WEIGHTS)

    @jax.jit
    def forward(params, imgs_seq, data_seq):
        outs, _ = model.apply({"params": params}, imgs_seq, data_seq)
        return outs

    def loss_fn(params, rng, imgs_seq, data_seq, gt_boxes, gt_labels,
                atss_tgt, gt_trajs=None, gt_traj_mask=None, memory=None,
                axis_name=None):
        from panacea_tpu.perception.coder import normalize_bbox

        # mmdet reduce_mean (streampetr_head.py:824-834, atss_head.py:
        # 310-328): avg factors are averaged across DDP ranks before the
        # division, so rank losses are local_sum / mean_count and pmean'd
        # grads equal the reference's global-sum / global-count gradient
        def _rmean(x):
            return jax.lax.pmean(x, axis_name) if axis_name else x

        k_gm, k_dn = jax.random.split(rng)
        if use_grid_mask:
            from panacea_tpu.perception.gridmask import grid_mask

            imgs_seq = grid_mask(k_gm, imgs_seq)

        dn = None
        if with_dn:
            from panacea_tpu.perception.denoise import prepare_dn

            # proposal-query heads size their query list by the proposal
            # count, not num_query (the reference mutates self.num_query =
            # reference_points.size(1), sparse_head_v3.py:375) — the DN
            # attention mask must match the ACTUAL query count
            nq = model.num_query
            pp = data_seq.get("proposal_positions")
            if pp is not None and model.head_type in ("sparse_v3",
                                                      "sparse_v4"):
                p = pp.shape[-2]
                nq = p if model.head_type == "sparse_v3" else max(p, nq)
            dn = prepare_dn(
                k_dn, gt_boxes, gt_labels,
                num_query=nq,
                num_propagated=model.num_propagated,
                memory_len=model.memory_len,
                pc_range=pc_range, num_classes=num_classes,
                scalar=dn_scalar, noise_scale=dn_noise_scale, split=dn_split,
            )

        if streaming:
            outs, atss_outs, new_memory = model.apply(
                {"params": params}, imgs_seq, memory, data_seq, dn=dn,
                method=model.train_frame,
            )
        else:
            outs, atss_outs, new_memory = model.apply(
                {"params": params}, imgs_seq, data_seq, dn=dn,
                num_frame_losses=num_frame_losses, method=model.train_window,
            )
        cls_all = outs["all_cls_scores"]   # (L, B, Q, C)
        bbox_all = outs["all_bbox_preds"]  # (L, B, Q, 10)
        n_layers, b, q = cls_all.shape[:3]

        gt_norm = normalize_bbox(gt_boxes)  # (B, G, 10)
        # per-layer Hungarian matching (mmdet DETR-style loss: the assigner
        # runs independently for every decoder layer, streampetr_head
        # loss()/loss_single over all_cls_scores) — the L layers are folded
        # into the callback's batch dim so one host call assigns all of them
        lb = n_layers * b
        g = gt_norm.shape[1]
        labels_q, gt_norm_q, mask_q, asg_q, _ = jax.pure_callback(
            assign_host,
            (
                jax.ShapeDtypeStruct((lb, q), jnp.int32),
                jax.ShapeDtypeStruct((lb, q, gt_norm.shape[-1]), jnp.float32),
                jax.ShapeDtypeStruct((lb, q), jnp.float32),
                jax.ShapeDtypeStruct((lb, q), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.float32),
            ),
            jax.lax.stop_gradient(cls_all).reshape(lb, q, -1),
            jax.lax.stop_gradient(bbox_all).reshape(lb, q, -1),
            jnp.broadcast_to(jax.lax.stop_gradient(gt_norm),
                             (n_layers, b, g, gt_norm.shape[-1])
                             ).reshape(lb, g, -1),
            jnp.broadcast_to(gt_labels, (n_layers, b, g)).reshape(lb, g),
        )
        labels_q = labels_q.reshape(n_layers, b, q)
        gt_norm_q = gt_norm_q.reshape(n_layers, b, q, -1)
        mask_q = mask_q.reshape(n_layers, b, q)
        asg_q = asg_q.reshape(n_layers, b, q)
        # per-layer avg factor (matched count, identical across layers when
        # every GT is matched — kept per-layer for exactness); rank-averaged
        # under DDP (mmdet reduce_mean on num_total_pos)
        n_pos = jnp.maximum(_rmean(mask_q.sum((1, 2))), 1.0)  # (L,)

        # per-layer match losses, vectorized over (L, B, Q); layer losses
        # are SUMMED over L (mmdet loss dict: loss_cls + d0..dL-2.loss_cls)
        cls_l = sigmoid_focal_loss(
            cls_all, labels_q, num_classes).sum((1, 2)) / n_pos
        diff = jnp.abs(bbox_all - gt_norm_q) * cw
        diff = jnp.where(jnp.isfinite(diff), diff, 0.0)
        bbox_l = (diff.sum(-1) * mask_q).sum((1, 2)) / n_pos
        metrics = {
            "loss_cls": cls_weight * cls_l.sum(),
            "loss_bbox": bbox_weight * bbox_l.sum(),
        }
        total = metrics["loss_cls"] + metrics["loss_bbox"]

        if "all_traj_preds" in outs and gt_trajs is not None:
            # trajectory supervision (PETRMotionHead): per-layer matched
            # targets broadcast over modes, TrajLossv1 summed over layers
            # (petr_motion_head.py loss: loss_traj + d{i}.loss_traj). Every
            # layer matches all G gts (Hungarian, Q >= G), so the per-layer
            # avg factors coincide and the layers fold into one batch.
            from panacea_tpu.perception.motion_head import (
                traj_loss_v1,
                traj_targets_from_assignment,
            )

            traj_all = outs["all_traj_preds"]    # (L, B, Q, M, S, 2)
            score_all = outs["all_traj_scores"]  # (L, B, Q, M)
            m, s = traj_all.shape[3], traj_all.shape[4]
            tgt_m, wts_m = jax.vmap(
                lambda pm, ag, gt, gm: traj_targets_from_assignment(
                    (q, m, s, 2), pm, ag, gt, gm))(
                mask_q.reshape(lb, q) > 0,
                asg_q.reshape(lb, q),
                jnp.broadcast_to(gt_trajs[None],
                                 (n_layers,) + gt_trajs.shape
                                 ).reshape((lb,) + gt_trajs.shape[1:]),
                jnp.broadcast_to(gt_traj_mask[None],
                                 (n_layers,) + gt_traj_mask.shape
                                 ).reshape((lb,) + gt_traj_mask.shape[1:]))
            l_traj = traj_loss_v1(
                score_all.reshape(lb, q, m),
                traj_all.reshape(lb, q, m, s, 2),
                tgt_m.reshape(lb * q, m, s, 2),
                wts_m.reshape(lb * q, m, s, 2), avg_factor=n_pos.mean())
            metrics["loss_traj"] = l_traj
            total = total + l_traj

        if with_dn:
            from panacea_tpu.perception.denoise import dn_loss

            l_dn = dn_loss(outs["dn_cls_scores"], outs["dn_bbox_preds"], dn,
                           pc_range, num_classes, dn_weight=dn_weight,
                           split=dn_split, reduce_fn=_rmean)
            metrics["loss_dn"] = l_dn
            total = total + l_dn

        if atss_tgt is not None and atss_outs is not None:
            al = atss_loss(atss_outs, anchors_per_level, atss_tgt,
                           num_classes, reduce_fn=_rmean)
            metrics.update(al)
            total = total + sum(al.values())

        metrics["loss"] = total
        return total, (metrics, new_memory)

    if mesh is None:
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                          static_argnames=())
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def _synced(params, rng, imgs_seq, data_seq, gt_boxes, gt_labels,
                    atss_tgt, gt_trajs, gt_traj_mask, memory):
            # per-shard RNG derived INSIDE the computation (fold_in on the
            # replicated key): on multi-host pods a host-side split would be
            # a process-local array fed to a global-mesh jit, which
            # multi-controller JAX rejects — the replicated key is the only
            # RNG input, like independent per-rank torch RNG streams
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
            if atss_tgt is not None:
                # num_pos is a whole-batch scalar computed host-side; each
                # shard recomputes ITS sub-batch's count from its labels
                # (atss_targets accumulates exactly sum(labels < C)), then
                # loss_fn pmean's the avg factors across the axis (mmdet
                # reduce_mean) so pmean'd grads = the global-batch gradient
                atss_tgt = atss_tgt._replace(num_pos=(
                    atss_tgt.labels < num_classes).sum().astype(jnp.float32))
            out, grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, rng, imgs_seq, data_seq, gt_boxes, gt_labels,
                atss_tgt, gt_trajs, gt_traj_mask, memory,
                axis_name=data_axis)
            loss, (metrics, new_memory) = out
            loss = jax.lax.pmean(loss, data_axis)
            metrics = jax.lax.pmean(metrics, data_axis)
            grads = jax.lax.pmean(grads, data_axis)
            return (loss, (metrics, new_memory)), grads

        dp, rep = P(data_axis), P()
        _sharded_cache = {}

        def grad_fn(params, rng, imgs_seq, data_seq, gt_boxes, gt_labels,
                    atss_tgt, gt_trajs, gt_traj_mask, memory):
            has_atss = atss_tgt is not None
            if has_atss not in _sharded_cache:
                # rng: ONE replicated key, folded per shard inside _synced
                # (per-shard GridMask/DN noise like independent per-rank
                # torch RNG, but multi-host safe — no process-local split
                # array crosses into the global-mesh jit); atss num_pos
                # rides replicated (recomputed per shard in _synced); a
                # leaf spec against the None args (trajs/memory) is a
                # no-op prefix, but the ATSSTargets spec TREE needs the
                # arg present, hence the two cached variants
                in_specs = (rep, rep, dp, dp, dp, dp,
                            ATSSTargets(dp, dp, dp, rep) if has_atss
                            else rep,
                            dp, dp, dp)
                _sharded_cache[has_atss] = jax.jit(shard_map(
                    _synced, mesh=mesh, in_specs=in_specs,
                    out_specs=((rep, (rep, dp)), rep),
                    check_vma=False))
            return _sharded_cache[has_atss](
                params, rng, imgs_seq, data_seq, gt_boxes, gt_labels,
                atss_tgt, gt_trajs, gt_traj_mask, memory)

    @jax.jit
    def apply_updates(state: DetTrainState, grads):
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return DetTrainState(params, opt_state, state.step + 1)

    def train_step(state: DetTrainState, rng, imgs_seq, data_seq,
                   gt_boxes, gt_labels, atss_tgt: Optional[ATSSTargets] = None,
                   gt_trajs=None, gt_traj_mask=None, memory=None):
        """``gt_trajs`` (B, G, S, 2) / ``gt_traj_mask`` (B, G, S, 2):
        optional GT futures (data/nuscenes/trajectory.py) — consumed when
        the head emits all_traj_preds (head_type='motion')."""
        if gt_trajs is not None:
            gt_trajs = jnp.asarray(gt_trajs, jnp.float32)
            gt_traj_mask = jnp.asarray(gt_traj_mask, jnp.float32)
        (loss, (metrics, new_memory)), grads = grad_fn(
            state.params, rng, jnp.asarray(imgs_seq), data_seq,
            jnp.asarray(gt_boxes, jnp.float32),
            jnp.asarray(gt_labels, jnp.int32), atss_tgt,
            gt_trajs, gt_traj_mask, memory,
        )
        state = apply_updates(state, grads)
        metrics = {k: float(v) for k, v in metrics.items()}
        if streaming:
            return state, new_memory, metrics
        return state, metrics

    return forward, train_step


def init_detector_train(model, optimizer, params) -> DetTrainState:
    return DetTrainState(params, optimizer.init(params),
                         jnp.zeros((), jnp.int32))


def make_detector_optimizer(
    lr: float = 4e-4,
    weight_decay: float = 0.01,
    backbone_lr_mult: float = 0.1,
    grad_clip_norm: float = 35.0,
    schedule: Optional[optax.Schedule] = None,
    backbone_frozen_stages: int = -1,
    backbone_bn_trainable: bool = True,
):
    """AdamW with the reference's paramwise backbone lr_mult and grad clip
    (window.py:253-266: lr 4e-4, img_backbone lr_mult 0.1, wd 0.01,
    grad_clip max_norm 35).

    ``backbone_frozen_stages`` mirrors mmdet ResNet._freeze_stages
    (window.py:51: frozen_stages=1 = stem + layer1 frozen);
    ``backbone_bn_trainable=False`` mirrors norm_cfg requires_grad=False
    (all backbone BN affines frozen). Freezing is a zero-update mask, so
    frozen params keep their (pretrained) values exactly."""
    def scale_backbone(mult):
        def init_fn(params):
            return optax.EmptyState()

        def frozen(sub):
            name = sub[0] if sub else ""
            if backbone_frozen_stages >= 0 and name in (
                    "conv1", "bn1", "stem1", "stem2", "stem3"):
                return True  # stem
            for s in range(1, backbone_frozen_stages + 1):
                # resnet layer{s}_{i}; vovnet stage{s+1}_block{i}
                if name.startswith((f"layer{s}_", f"stage{s + 1}_")):
                    return True
            if not backbone_bn_trainable and any(
                    p == "bn" or p.startswith(("bn", "ds_bn"))
                    for p in sub):
                return True
            return False

        def update_fn(updates, state, params=None):
            def scale(path, u):
                keys = [getattr(k, "key", str(k)) for k in path]
                # FrozenBatchNorm running stats are torch BUFFERS — never
                # optimizer-updated or weight-decayed, anywhere (backbone
                # or head towers), regardless of bn_trainable (which
                # governs only the scale/bias affines, mmdet norm_cfg
                # requires_grad). Flax has no buffer collection so they
                # live as params; this mask restores buffer semantics.
                if keys and keys[-1] in ("mean", "var"):
                    return u * 0.0
                if "backbone" not in keys:
                    return u
                sub = keys[keys.index("backbone") + 1:]
                return u * (0.0 if frozen(sub) else mult)

            return (jax.tree_util.tree_map_with_path(scale, updates), state)

        return optax.GradientTransformation(init_fn, update_fn)

    lr_term = (optax.scale_by_schedule(lambda c: -schedule(c)) if schedule
               else optax.scale(-lr))
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
        scale_backbone(backbone_lr_mult),
        lr_term,
    )


def layer_decay_scales(params, decay_rate: float = 0.9,
                       num_layers: int = 12):
    """Per-param layer-wise lr-decay multipliers for a ViT backbone
    (reference utils/layer_decay_optimizer_constructor.py:16-36, the BEiT/
    EVA fine-tuning recipe): scale = decay^(num_layers + 1 - layer_id),
    with patch/pos embeddings at layer 0, transformer block i at layer
    i + 1, and every non-backbone param (neck/head) at full lr."""
    import flax

    def layer_id(path):
        keys = [getattr(k, "key", str(k)) for k in path]
        if "backbone" not in keys:
            return num_layers + 1
        sub = keys[keys.index("backbone") + 1:]
        name = sub[0] if sub else ""
        if name in ("patch_embed", "pos_embed", "cls_token", "mask_token"):
            return 0
        if name.startswith("block_"):
            return int(name.split("_")[1]) + 1
        return num_layers + 1  # backbone adapter/sim_fpn at full lr

    return jax.tree_util.tree_map_with_path(
        lambda p, _: decay_rate ** (num_layers + 1 - layer_id(p)), params)


def scale_by_layer_decay(decay_rate: float = 0.9, num_layers: int = 12):
    """optax transform applying layer_decay_scales to updates (the
    LearningRateDecayOptimizerConstructor role, :82-140)."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scales = layer_decay_scales(updates, decay_rate, num_layers)
        return jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def cosine_schedule(base_lr: float = 4e-4, warmup_iters: int = 500,
                    warmup_ratio: float = 1.0 / 3, total_iters: int = 42192,
                    min_lr_ratio: float = 1e-3) -> optax.Schedule:
    """CosineAnnealing + linear warmup (window.py:268-274)."""
    warm = optax.linear_schedule(base_lr * warmup_ratio, base_lr,
                                 max(warmup_iters, 1))
    cos = optax.cosine_decay_schedule(
        base_lr, max(total_iters - warmup_iters, 1),
        alpha=min_lr_ratio,
    )
    return optax.join_schedules([warm, cos], [warmup_iters])
