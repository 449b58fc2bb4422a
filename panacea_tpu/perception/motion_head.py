"""PETRMotionHead — StreamPETR detection head + multi-modal trajectory
prediction, plus its MTP-style training loss.

TPU-native rebuild of the GENERATION-side vendored plugin's motion family
(sgm/data/nuscenes_video/projects/mmdet3d_plugin/):

- ``PETRMotionHead`` (models/dense_heads/petr_motion_head.py:45-1123): the
  StreamPETRHead decoder with an extra per-layer trajectory branch — a
  learned per-mode embedding added to each decoder intermediate, a shared
  MLP emitting ``pred_steps*2`` xy offsets plus one mode score per mode,
  offsets cumsum'd along time and anchored at the (detached) predicted box
  center (petr_motion_head.py:655-670). The reference replicates ONE branch
  module across layers (``nn.ModuleList([traj_branch]*num_pred)``,
  :287-289) — shared weights, matching the shared cls/reg branches.
- ``traj_loss_v1`` (losses/traj_loss.py:16-95, TrajLossv1): UniAD/MTP
  best-of-mode loss — L1 ADE to the min-L2 mode, L1 FDE to the min-FDE
  mode, NLL of the best mode's score; all normalized by the Hungarian
  positive count (and the reference's hardcoded /12 step factor).
- ``traj_targets_from_assignment`` (petr_motion_head.py:774-787): scatter
  the matched GT future trajectories / validity masks onto the query set.
- ``decode_with_traj`` (core/bbox/coders/nms_free_coder.py:147-205,
  NMSFreeCoderPred.decode_single): gather each selected box's trajectory,
  modes sorted by score with the top ``max_modes`` kept.

The reference file also defines a ``pos2posemb2d`` helper
(petr_motion_head.py:32-42) that nothing in the file calls — not ported.
The head is registered but referenced by no shipped config (vestigial in
the reference); it is wired here as detector ``head_type='motion'``
(Petr3DM/Petr3DP drivers in perception/detector.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from panacea_tpu.perception.petr_head import StreamPETRHead


class PETRMotionHead(StreamPETRHead):
    """Config surface: ``pred_steps`` future xy steps (12 = 6 s at 2 Hz),
    ``mode`` trajectory hypotheses per query (petr_motion_head.py:86-87)."""

    pred_steps: int = 12
    mode: int = 6

    def setup(self):
        super().setup()
        c = self.embed_dims
        # torch nn.Embedding default init: N(0, 1) (petr_motion_head.py:281)
        self.traj_embedding = self.param(
            "traj_embedding", nn.initializers.normal(stddev=1.0),
            (self.mode, c),
        )
        traj_layers = []
        for _ in range(self.num_reg_fcs):
            traj_layers += [nn.Dense(c, dtype=self.dtype), nn.relu]
        traj_layers += [nn.Dense(self.pred_steps * 2 + 1, dtype=self.dtype)]
        self.traj_branch = nn.Sequential(traj_layers, name="traj_branch")

    def head_extras(self, outs, outs_dec):
        """Trajectory branch on every decoder layer's (post-normed,
        dn-stripped) intermediates (petr_motion_head.py:655, 662-670)."""
        # (L, B, Q, M, C) -> shared MLP -> (L, B, Q, M, steps*2 + 1)
        tmp = self.traj_branch(outs_dec[..., None, :] + self.traj_embedding)
        scores = tmp[..., 0]                              # (L, B, Q, M)
        preds = tmp[..., 1:].reshape(tmp.shape[:-1] + (self.pred_steps, 2))
        preds = jnp.cumsum(preds, axis=-2)
        # anchor at the denormalized box center, gradient-detached
        anchor = jax.lax.stop_gradient(outs["all_bbox_preds"][..., 0:2])
        preds = preds + anchor[..., None, None, :]
        outs["all_traj_preds"] = preds                    # (L,B,Q,M,S,2)
        outs["all_traj_scores"] = scores
        return outs


def traj_targets_from_assignment(
    traj_shape: Tuple[int, ...],
    pos_mask: jnp.ndarray,
    assigned_gt: jnp.ndarray,
    gt_trajs: jnp.ndarray,
    gt_trajs_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sample's trajectory targets from the box Hungarian assignment
    (petr_motion_head.py:774-787): queries matched to a GT get that GT's
    future trajectory broadcast over all modes; unmatched rows stay zero.

    traj_shape: (Q, M, S, 2) of the per-sample ``traj_preds``;
    pos_mask: (Q,) bool — query is a positive match;
    assigned_gt: (Q,) int — matched GT index (any value where ~pos_mask);
    gt_trajs: (G, S, 2); gt_trajs_mask: (G, S, 2) validity.
    Returns (traj_targets, traj_weights), both (Q, M, S, 2)."""
    q, m = traj_shape[0], traj_shape[1]
    tgt = gt_trajs[assigned_gt][:, None]                  # (Q, 1, S, 2)
    msk = gt_trajs_mask[assigned_gt][:, None]
    sel = pos_mask[:, None, None, None]
    targets = jnp.where(sel, jnp.broadcast_to(tgt, (q, m) + tgt.shape[2:]), 0.0)
    weights = jnp.where(sel, jnp.broadcast_to(msk, (q, m) + msk.shape[2:]), 0.0)
    return targets, weights


def traj_loss_v1(
    traj_prob: jnp.ndarray,
    traj_preds: jnp.ndarray,
    gt_traj: jnp.ndarray,
    gt_traj_mask: jnp.ndarray,
    avg_factor,
    cls_loss_weight: float = 1.0,
    ade_loss_weight: float = 1.0,
    fde_loss_weight: float = 0.25,
) -> jnp.ndarray:
    """TrajLossv1 (losses/traj_loss.py:16-95) — faithful including the
    quirks: the FDE mode is picked by fde*valid_steps (the mask product,
    :63-66), the regression term divides by the hardcoded 12 (:89), and
    rows with zero valid steps still contribute their (zero-masked) terms.

    traj_prob (B, Q, M); traj_preds (B, Q, M, S, 2);
    gt_traj / gt_traj_mask (B*Q, M, S, 2); avg_factor = num positives."""
    preds = traj_preds.reshape((-1,) + traj_preds.shape[2:])   # (BQ,M,S,2)
    logp = jax.nn.log_softmax(
        traj_prob.reshape(-1, traj_prob.shape[-1]), axis=-1)   # (BQ, M)
    mask = gt_traj_mask[..., 0]                                # (BQ, M, S)
    valid_steps = mask.sum(axis=-1)                            # (BQ, M)
    fin = jnp.clip(valid_steps - 1, 0).astype(jnp.int32)
    fin_idx = jnp.broadcast_to(fin[..., None, None],
                               fin.shape + (1, 2)).astype(jnp.int32)
    pred_final = jnp.take_along_axis(preds, fin_idx, axis=2)   # (BQ,M,1,2)
    gt_final = jnp.take_along_axis(gt_traj, fin_idx, axis=2)

    def _norm(x):
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1))

    min_fde_norm = (_norm(pred_final - gt_final) * mask).sum(-1)  # (BQ, M)
    fde_mode = jnp.argmin(min_fde_norm, axis=1)
    l2_norm = (_norm(preds - gt_traj) * mask).sum(-1)
    best_mode = jnp.argmin(l2_norm, axis=1)

    def gather_mode(x, idx):
        ii = idx.reshape(idx.shape + (1,) * (x.ndim - 1))
        ii = jnp.broadcast_to(ii, idx.shape[:1] + (1,) + x.shape[2:])
        return jnp.take_along_axis(x, ii.astype(jnp.int32), axis=1)

    fde_best = gather_mode(pred_final, fde_mode)               # (BQ,1,1,2)
    pred_best = gather_mode(preds, best_mode)                  # (BQ,1,S,2)
    cls_best = gather_mode(logp, best_mode)                    # (BQ, 1)

    reg_mask = mask[:, :1, :, None]                            # (BQ,1,S,1)
    gt_reg = gt_traj[:, :1]
    l_reg = jnp.abs(gt_reg - pred_best) * reg_mask
    l_min_fde = jnp.abs(gt_final[:, 0:1] - fde_best) * reg_mask[:, :, 0:1]
    cls_mask = (valid_steps > 0).astype(logp.dtype)
    l_class = -cls_best * cls_mask[:, 0:1]

    avg = jnp.maximum(jnp.asarray(avg_factor, jnp.float32), 1e-5)
    l_reg = l_reg.sum() / (avg * 12)
    l_class = l_class.sum() / avg
    l_min_fde = l_min_fde.sum() / avg
    loss = (l_class * cls_loss_weight + l_reg * ade_loss_weight
            + l_min_fde * fde_loss_weight)
    return jnp.nan_to_num(loss)


def decode_with_traj(coder, preds, max_modes: int = 6):
    """NMSFreeCoderPred.decode (nms_free_coder.py:147-214 on the generation
    side): standard NMS-free box decoding, plus each selected box carries
    its trajectory hypotheses, modes sorted by score (top ``max_modes``).

    ``coder``: a perception.coder.NMSFreeCoder; ``preds``: head outputs with
    all_traj_preds/all_traj_scores. Returns the coder's per-sample dicts
    extended with 'trajs' (n_kept, max_modes, S, 2) and 'traj_scores' —
    'trajs' is the key perception/motion_metrics.py consumes; 'traj' is
    aliased to the same array for reference-name compatibility
    (petr3dp.py:315 bbox_results[0]['traj'])."""
    import numpy as np

    outs = coder.decode(preds)
    traj = preds["all_traj_preds"][-1]          # (B, Q, M, S, 2)
    traj_scores = preds["all_traj_scores"][-1]  # (B, Q, M)
    for i, o in enumerate(outs):
        # the coder reports each kept box's query index — gather, don't
        # replay the selection
        bbox_index = np.asarray(o["box_idx"])
        tr = np.asarray(traj[i])[bbox_index]            # (k, M, S, 2)
        ts = np.asarray(traj_scores[i])[bbox_index]     # (k, M)
        m = min(max_modes, ts.shape[-1])
        mode_idx = np.argsort(-ts, axis=-1)[:, :m]
        ts_top = np.take_along_axis(ts, mode_idx, axis=-1)
        tr = np.take_along_axis(tr, mode_idx[..., None, None], axis=1)
        o["trajs"] = tr
        o["traj"] = tr
        o["traj_scores"] = ts_top
    return outs
