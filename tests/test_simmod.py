"""SimMOD two-stage detector tests (perception/simmod.py, fcos_proposal.py
vs reference detectors/simmod.py + dense_heads/fcos_proposal_head.py /
simmod_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.fcos_proposal import FCOSProposalHead
from panacea_tpu.perception.simmod import SimMOD, SimMODHead

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _calib(b, n):
    eye = jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4))
    return {"lidar2img": eye, "intrinsics": eye, "extrinsics": eye}


def test_fcos_proposal_outputs_and_topk():
    b, n, c = 1, 2, 32
    head = FCOSProposalHead(num_classes=10, in_channels=c, feat_channels=c,
                            stacked_convs=1, strides=(8, 16),
                            cls_branch=(16,), num_proposal=20)
    feats = [jnp.ones((b * n, 8, 16, c)), jnp.ones((b * n, 4, 8, c))]
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    outs = head.apply({"params": params}, feats)
    assert len(outs) == 2
    assert outs[0]["cls_score"].shape == (2, 8, 16, 10)
    assert outs[0]["offset"].shape == (2, 8, 16, 2)
    assert float(outs[0]["depth"].min()) > 0  # exp-positive (:505)
    props = head.apply({"params": params}, outs, _calib(b, n), n,
                       method=head.get_proposals)
    assert props["proposal_features"].shape == (b, 20, 2 * c)
    assert props["proposal_positions"].shape == (b, 20, 5)
    assert props["proposal_scores"].shape == (b, 20)
    s = np.asarray(props["proposal_scores"][0])
    assert (np.diff(s) <= 1e-6).all()  # sorted top-k
    # view/level metadata within range
    meta = np.asarray(props["proposal_positions"][0, :, 3:])
    assert meta[:, 0].max() < n and meta[:, 1].max() < 2


def test_simmod_head_refines_boxes():
    b, n, p, c = 1, 2, 6, 32
    head = SimMODHead(num_classes=10, embed_dims=c, num_decoder_layers=2,
                      num_levels=2, num_cams=n, pc_range=PC)
    feats = [jnp.ones((b, n, 8, 16, c)), jnp.ones((b, n, 4, 8, c))]
    pf = jax.random.normal(jax.random.PRNGKey(1), (b, p, 2 * c))
    pp = jnp.concatenate(
        [jax.random.uniform(jax.random.PRNGKey(2), (b, p, 3),
                            minval=-40, maxval=40),
         jnp.zeros((b, p, 2))], -1)
    data = _calib(b, n)
    params = head.init(jax.random.PRNGKey(0), feats, pf, pp, data,
                       (64, 128))["params"]
    outs = head.apply({"params": params}, feats, pf, pp, data, (64, 128),
                      proposal_scores=jnp.full((b, p), 0.5))
    assert outs["all_cls_scores"].shape == (2, b, p, 10)
    assert outs["all_bbox_preds"].shape == (2, b, p, 10)
    assert "all_cls_scores_combined" in outs
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()
    # box-refined layers produce different xyz
    xyz = np.asarray(outs["all_bbox_preds"][..., :3])
    assert not np.allclose(xyz[0], xyz[1])


def test_simmod_head_twostage_cross_attn():
    """SimMODHead routed through TwoStageDetr3DCrossAtten
    (twostage_detr3d_transformer.py) instead of deformable aggregation."""
    b, n, p, c = 1, 2, 6, 32
    head = SimMODHead(num_classes=10, embed_dims=c, num_decoder_layers=2,
                      num_levels=2, num_cams=n, pc_range=PC,
                      cross_attn="twostage")
    feats = [jnp.ones((b, n, 8, 16, c)), jnp.ones((b, n, 4, 8, c))]
    pf = jax.random.normal(jax.random.PRNGKey(1), (b, p, 2 * c))
    pp = jnp.concatenate(
        [jax.random.uniform(jax.random.PRNGKey(2), (b, p, 3),
                            minval=-40, maxval=40),
         jnp.zeros((b, p, 2))], -1)
    data = _calib(b, n)
    params = head.init(jax.random.PRNGKey(0), feats, pf, pp, data,
                       (64, 128))["params"]
    assert "attention_weights" in params["cross_attn_0"]
    outs = head.apply({"params": params}, feats, pf, pp, data, (64, 128))
    assert outs["all_cls_scores"].shape == (2, b, p, 10)
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()


def test_simmod_end_to_end_tiny():
    b, n = 1, 2
    det = SimMOD(num_classes=10, embed_dims=32, num_levels=3, num_cams=n,
                 num_proposal=12, num_decoder_layers=2,
                 fcos_cfg={"stacked_convs": 1, "cls_branch": (16,)},
                 pc_range=PC)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (b, n, 64, 128, 3))
    data = _calib(b, n)
    params = det.init(jax.random.PRNGKey(1), imgs, data)["params"]
    outs, props = det.apply({"params": params}, imgs, data)
    assert outs["all_cls_scores"].shape == (2, b, 12, 10)
    assert props["proposal_scores"].shape == (b, 12)
    assert np.isfinite(np.asarray(outs["all_cls_scores"])).all()


def test_fcos_targets_and_loss():
    from panacea_tpu.perception.fcos_proposal import fcos_loss, fcos_targets

    sizes = [(8, 16), (4, 8)]
    strides = [8, 16]
    gt_b = [np.array([[30.0, 20.0, 60.0, 50.0]], np.float32),
            np.zeros((0, 4), np.float32)]
    gt_l = [np.array([2]), np.zeros((0,), np.int64)]
    gt_d = [np.array([12.0], np.float32), np.zeros((0,), np.float32)]
    tgt = fcos_targets(sizes, strides, gt_b, gt_l, gt_d)
    labels, ctr, off, dep, num_pos = tgt
    assert labels.shape == (2, 8 * 16 + 4 * 8)
    assert num_pos > 0
    pos = labels[0] < 10
    assert pos.any() and not (labels[1] < 10).any()
    assert (ctr[0][pos] > 0).all() and (dep[0][pos] == 12.0).all()

    # regress range gates on distance to the 2D box EDGES (fcos_proposal_
    # head.py:1363-1365): a large box must be assigned to the COARSER level
    # (max edge distance ~>48 from its center region), with nothing on the
    # fine level whose range tops out at 48
    big = [np.array([[4.0, 0.0, 124.0, 60.0]], np.float32),
           np.zeros((0, 4), np.float32)]
    big_l = [np.array([3]), np.zeros((0,), np.int64)]
    labels2 = fcos_targets(sizes, strides, big, big_l)[0]
    lvl0 = labels2[0, :8 * 16]
    lvl1 = labels2[0, 8 * 16:]
    assert (lvl1 < 10).any(), "large box must supervise the coarse level"
    assert not (lvl0 < 10).any(), "large box must skip the fine level"

    head = FCOSProposalHead(num_classes=10, in_channels=32, feat_channels=32,
                            stacked_convs=1, strides=tuple(strides),
                            cls_branch=(16,), num_proposal=10)
    feats = [jnp.ones((2, 8, 16, 32)), jnp.ones((2, 4, 8, 32))]
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    outs = head.apply({"params": params}, feats)
    losses = fcos_loss(outs, tgt)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    def total(p):
        return sum(fcos_loss(head.apply({"params": p}, feats), tgt).values())

    g = jax.grad(total)(params)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gn > 0
