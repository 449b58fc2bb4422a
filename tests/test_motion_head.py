"""PETRMotionHead torch-golden parity + TrajLossv1 parity + decode.

Loads the ACTUAL generation-side reference modules
(sgm/data/nuscenes_video/projects/mmdet3d_plugin/models/dense_heads/
petr_motion_head.py and losses/traj_loss.py) with the same mm-stack stubs
as the StreamPETRHead parity test, converts the randomized state dict
through ``convert_streampetr_checkpoint(head='motion')``, and matches the
detection outputs AND the trajectory branch (mode scores + cumsum'd,
box-anchored trajectories) on all decoder layers.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
from test_petr_head_parity import load_reference_petr_head  # noqa: E402

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
GEN_REF = ("/root/reference/sgm/data/nuscenes_video/projects/"
           "mmdet3d_plugin")


def load_reference_motion_head():
    """petr_motion_head.py on top of the petr parity harness's stubs (the
    generation-side misc.py is a strict subset of the metrics-side one
    already loaded there)."""
    import importlib.util

    mod, misc = load_reference_petr_head()
    spec = importlib.util.spec_from_file_location(
        "ref_petr_motion_head", f"{GEN_REF}/models/dense_heads/"
        "petr_motion_head.py")
    mh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mh)
    return mh, misc


def load_reference_traj_loss():
    import importlib.util

    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                return c

            return deco

    mm = sys.modules.get("mmdet.models") or types.ModuleType("mmdet.models")
    if not hasattr(mm, "LOSSES"):
        mm.LOSSES = _Reg()
    sys.modules["mmdet.models"] = mm
    if "projects.mmdet3d_plugin.models.utils.misc" not in sys.modules:
        load_reference_petr_head()
    spec = importlib.util.spec_from_file_location(
        "ref_traj_loss", f"{GEN_REF}/losses/traj_loss.py")
    tl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tl)
    return tl


def test_petr_motion_head_full_forward_matches_reference():
    from panacea_tpu.perception.head import init_memory
    from panacea_tpu.perception.motion_head import PETRMotionHead
    from panacea_tpu.utils.convert import convert_streampetr_checkpoint

    mod, misc = load_reference_motion_head()
    b, n, c, q = 1, 2, 256, 12
    h, w = 8, 16
    pad_h, pad_w = 8 * 16, 16 * 16
    steps, mode = 4, 3
    transformer = dict(
        type="PETRTemporalTransformer",
        decoder=dict(
            type="PETRTransformerDecoder", return_intermediate=True,
            num_layers=2,
            transformerlayers=dict(
                type="PETRTemporalDecoderLayer",
                attn_cfgs=[
                    dict(type="PETRMultiheadAttention", embed_dims=c,
                         num_heads=8, attn_drop=0.0, proj_drop=0.0),
                    dict(type="PETRMultiheadAttention", embed_dims=c,
                         num_heads=8, attn_drop=0.0, proj_drop=0.0),
                ],
                ffn_cfgs=dict(type="FFN", embed_dims=c,
                              feedforward_channels=2048, ffn_drop=0.0),
                with_cp=False,
                operation_order=("self_attn", "norm", "cross_attn", "norm",
                                 "ffn", "norm"))))
    ref = mod.PETRMotionHead(
        num_classes=10, in_channels=c, embed_dims=c, num_query=q,
        memory_len=24, topk_proposals=8, num_propagated=8,
        pred_steps=steps, mode=mode,
        with_dn=False, with_ego_pos=True, train_cfg=None,
        transformer=transformer, depth_num=64, LID=True, depth_start=1,
        position_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        bbox_coder=dict(type="NMSFreeCoder", pc_range=list(PC)),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=0.25),
    )
    ref.num_pred = 2
    ref._init_layers()
    ref.reset_memory()
    ref.eval()
    torch.manual_seed(3)
    for prm in ref.parameters():
        if prm.requires_grad:
            prm.data = torch.randn_like(prm) * 0.1

    rs = np.random.RandomState(9)
    feat = rs.randn(b, n, c, h, w).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = 50, 64, 50, 32
    R = np.eye(4, dtype=np.float32)
    R[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    l2i = np.broadcast_to(K @ R, (b, n, 4, 4)).copy()
    intr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr = np.broadcast_to(R, (b, n, 4, 4)).copy()
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()

    loc = misc.locations(torch.zeros(1, c, h, w), 16, pad_h, pad_w)
    memory_center = loc[None].repeat(b * n, 1, 1, 1).clone()
    data_t = {
        "img_feats": torch.from_numpy(feat),
        "prev_exists": torch.zeros(b),
        "timestamp": torch.zeros(b),
        "ego_pose": torch.from_numpy(eye4),
        "ego_pose_inv": torch.from_numpy(eye4),
        "lidar2img": torch.from_numpy(l2i),
        "intrinsics": torch.from_numpy(intr),
        "extrinsics": torch.from_numpy(extr),
    }
    img_metas = [{"pad_shape": [(pad_h, pad_w, 3)]}]
    with torch.no_grad():
        outs_ref = ref(memory_center, img_metas, **data_t)

    sd = {f"pts_bbox_head.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    converted, _rep = convert_streampetr_checkpoint(
        sd, num_layers=2, backbone="r50", head="motion")
    bad = [k for k in _rep["unexpected"]
           if not k.endswith(("code_weights", "match_costs", "pc_range",
                              "position_range", "coords_d"))
           and "branches." not in k]
    assert not bad, bad
    params = converted["head"]

    ours = PETRMotionHead(num_classes=10, embed_dims=c, num_query=q,
                          memory_len=24, topk_proposals=8, num_propagated=8,
                          num_decoder_layers=2, num_levels=1, num_cams=n,
                          pc_range=PC, depth_num=64, lid=True,
                          depth_start=1.0, pred_steps=steps, mode=mode,
                          position_range=(-61.2, -61.2, -10.0,
                                          61.2, 61.2, 10.0),
                          feat_level=0)
    mem = init_memory(b, 24, c)
    data_j = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.asarray(eye4),
        "ego_pose_inv": jnp.asarray(eye4),
        "lidar2img": jnp.asarray(l2i),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
    }
    mlvl = [jnp.asarray(feat.transpose(0, 1, 3, 4, 2))]
    outs, new_mem = ours.apply({"params": params}, mlvl, mem, data_j,
                               (pad_h, pad_w))

    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        outs_ref["all_cls_scores"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        outs_ref["all_bbox_preds"].numpy(), atol=5e-3)
    # query axis = num_query + num_propagated (temporal alignment concat)
    assert outs["all_traj_preds"].shape == (2, b, q + 8, mode, steps, 2)
    np.testing.assert_allclose(
        np.asarray(outs["all_traj_scores"]),
        outs_ref["all_traj_scores"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(outs["all_traj_preds"]),
        outs_ref["all_traj_preds"].numpy(), atol=5e-3)


def test_traj_loss_v1_matches_reference():
    from panacea_tpu.perception.motion_head import traj_loss_v1

    tl = load_reference_traj_loss()
    rs = np.random.RandomState(0)
    b, q, m, s = 2, 5, 3, 4
    prob = rs.randn(b, q, m).astype(np.float32)
    preds = rs.randn(b, q, m, s, 2).astype(np.float32)
    gt = rs.randn(b * q, 1, s, 2).astype(np.float32)
    gt = np.repeat(gt, m, axis=1)  # targets broadcast over modes
    # ragged validity: some rows fully invalid, others partial
    valid = np.zeros((b * q, m, s, 2), np.float32)
    for i in range(b * q):
        k = rs.randint(0, s + 1)
        valid[i, :, :k] = 1.0
    avg = 7.0

    ref_loss = tl.TrajLossv1()(
        torch.from_numpy(prob), torch.from_numpy(preds),
        torch.from_numpy(gt), torch.from_numpy(valid), avg)
    ours = traj_loss_v1(jnp.asarray(prob), jnp.asarray(preds),
                        jnp.asarray(gt), jnp.asarray(valid), avg)
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)


def test_petr3dp_driver_streams_with_traj_outputs():
    """Petr3DP (head_type='motion') runs the streaming protocol end-to-end
    through backbone+neck and emits the trajectory outputs per frame
    (petr3dp.py:288-316 simple_test_pts surfaces traj/traj_scores)."""
    from panacea_tpu.perception.detector import Petr3DP
    from panacea_tpu.perception.head import init_memory

    model = Petr3DP(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2,
        head_cfg={"depth_num": 32, "pred_steps": 4, "mode": 3},
    )
    b, n = 1, 2
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(b, n, 64, 128, 3), np.float32)
    eye = jnp.eye(4)
    l2i = jnp.asarray(np.diag([100.0, 100.0, 1.0, 1.0]), jnp.float32)
    data = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(eye, (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, 4, 4)),
        "lidar2img": jnp.broadcast_to(l2i, (b, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(l2i, (b, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(eye, (b, n, 4, 4)),
    }
    mem = init_memory(b, 24, 32)
    params = model.init(jax.random.PRNGKey(0), imgs, data,
                        method=model.stream)["params"]
    outs, mem2 = model.apply({"params": params}, imgs, data,
                             method=model.stream)
    assert outs["all_traj_preds"].shape == (2, b, 20, 3, 4, 2)
    assert outs["all_traj_scores"].shape == (2, b, 20, 3)
    assert np.isfinite(np.asarray(outs["all_traj_preds"])).all()
    # second frame with propagated memory still healthy
    data2 = dict(data, prev_exists=jnp.ones((b,)),
                 timestamp=jnp.full((b,), 0.5))
    outs2, _ = model.apply({"params": params}, imgs, data2, memory=mem2,
                           method=model.stream)
    assert np.isfinite(np.asarray(outs2["all_traj_preds"])).all()


def test_motion_train_step_with_traj_loss():
    """Full training step on a tiny motion-head window detector: the traj
    loss term appears, is finite, and its gradient reaches the traj branch
    (make_detector_train + window_with_gt(pred_steps=...) wiring)."""
    import optax

    from panacea_tpu.perception.detector import StreamPETRWindow
    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    b, n, s_steps, modes = 1, 2, 4, 3
    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=n,
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        head_type="motion",
        head_cfg={"depth_num": 16, "pred_steps": s_steps, "mode": modes},
    )
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 2, n, 64, 128, 3))
    eye = jnp.eye(4)
    l2i = jnp.asarray(np.diag([100.0, 100.0, 1.0, 1.0]), jnp.float32)
    ones = jnp.ones((b, 2))
    data_seq = {
        "prev_exists": ones * jnp.asarray([0.0, 1.0]),
        "timestamp": ones * jnp.asarray([0.0, 0.5]),
        "ego_pose": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "lidar2img": jnp.broadcast_to(l2i, (b, 2, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(l2i, (b, 2, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(eye, (b, 2, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]

    rs = np.random.RandomState(0)
    g = 3
    gt_boxes = np.zeros((b, g, 9), np.float32)
    gt_boxes[..., :2] = rs.uniform(-20, 20, (b, g, 2))
    gt_boxes[..., 3:6] = rs.uniform(1, 3, (b, g, 3))
    gt_labels = rs.randint(0, 10, (b, g))
    gt_trajs = rs.randn(b, g, s_steps, 2).astype(np.float32) * 3
    gt_mask = np.ones((b, g, s_steps, 2), np.float32)
    gt_mask[:, :, 3:] = 0.0  # ragged futures

    opt = optax.adam(1e-3)
    _, train_step = make_detector_train(
        model, opt, (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        use_grid_mask=False, with_dn=False)
    state = init_detector_train(model, opt, params)
    p0 = np.asarray(jax.tree_util.tree_leaves(
        state.params["head"]["traj_branch"])[0]).copy()
    state, m = train_step(state, jax.random.PRNGKey(7), imgs, data_seq,
                          gt_boxes, gt_labels, None, gt_trajs, gt_mask)
    assert "loss_traj" in m and np.isfinite(m["loss_traj"])
    p1 = np.asarray(jax.tree_util.tree_leaves(
        state.params["head"]["traj_branch"])[0])
    assert not np.allclose(p0, p1)  # traj branch actually received grads

    # without traj GT the term is absent and the step still runs
    _, m2 = train_step(state, jax.random.PRNGKey(8), imgs, data_seq,
                       gt_boxes, gt_labels)
    assert "loss_traj" not in m2 and np.isfinite(m2["loss"])


@pytest.mark.slow
def test_motion_traj_loss_overfits():
    """Convergence evidence for the trajectory branch: ~40 steps on one
    fixed batch must drive loss_traj well below its start (the analogue of
    the detection overfit test, scoped to the motion supervision)."""
    import optax

    from panacea_tpu.perception.detector import StreamPETRWindow
    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    b, n, s_steps, modes = 1, 2, 4, 3
    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=n,
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        head_type="motion",
        head_cfg={"depth_num": 16, "pred_steps": s_steps, "mode": modes},
    )
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 2, n, 64, 128, 3))
    eye = jnp.eye(4)
    l2i = jnp.asarray(np.diag([100.0, 100.0, 1.0, 1.0]), jnp.float32)
    ones = jnp.ones((b, 2))
    data_seq = {
        "prev_exists": ones * jnp.asarray([0.0, 1.0]),
        "timestamp": ones * jnp.asarray([0.0, 0.5]),
        "ego_pose": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "lidar2img": jnp.broadcast_to(l2i, (b, 2, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(l2i, (b, 2, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(eye, (b, 2, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    rs = np.random.RandomState(0)
    g = 3
    gt_boxes = np.zeros((b, g, 9), np.float32)
    gt_boxes[..., :2] = rs.uniform(-20, 20, (b, g, 2))
    gt_boxes[..., 3:6] = rs.uniform(1, 3, (b, g, 3))
    gt_labels = rs.randint(0, 10, (b, g))
    # straight-line futures from each box center
    gt_trajs = (gt_boxes[..., None, :2]
                + np.arange(1, s_steps + 1)[None, None, :, None]
                * np.array([1.0, 0.5])).astype(np.float32)
    gt_mask = np.ones((b, g, s_steps, 2), np.float32)

    opt = optax.chain(optax.clip_by_global_norm(35.0), optax.adam(2e-3))
    _, train_step = make_detector_train(
        model, opt, (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        use_grid_mask=False, with_dn=False)
    state = init_detector_train(model, opt, params)
    losses = []
    for i in range(40):
        state, m = train_step(state, jax.random.PRNGKey(100 + i), imgs,
                              data_seq, gt_boxes, gt_labels, None,
                              gt_trajs, gt_mask)
        losses.append(m["loss_traj"])
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), (
        losses[:5], losses[-5:])


def test_window_with_gt_returns_trajectories():
    """PerceptionTrainDataset threads GT futures through window_with_gt,
    aligned with the filtered gt rows."""
    from panacea_tpu.data.nuscenes.synthetic import (
        make_synthetic_infos,
        synthetic_image_loader,
    )
    from panacea_tpu.perception.train_dataset import PerceptionTrainDataset

    infos = make_synthetic_infos(num_frames=8, num_boxes=4, seed=0)
    ds = PerceptionTrainDataset(
        infos=infos, image_loader=synthetic_image_loader,
        final_dim=(64, 176), queue_length=2)
    out = ds.window_with_gt(3, max_gt=8, pred_steps=4)
    assert out is not None and len(out) == 7
    window, gt_boxes, gt_labels, _, _, gt_trajs, gt_mask = out
    assert gt_trajs.shape == (1, 8, 4, 2)
    g = int((gt_labels[0] >= 0).sum())
    if g:
        # valid futures exist for the kept boxes (4 future frames in-scene)
        assert gt_mask[0, :g].sum() > 0


def test_traj_targets_and_decode():
    from panacea_tpu.perception.coder import NMSFreeCoder, normalize_bbox
    from panacea_tpu.perception.motion_head import (
        decode_with_traj,
        traj_targets_from_assignment,
    )

    rs = np.random.RandomState(1)
    q, m, s, g = 6, 3, 4, 2
    pos_mask = np.array([True, False, True, False, False, False])
    assigned = np.array([1, 0, 0, 0, 0, 0])
    gt_trajs = rs.randn(g, s, 2).astype(np.float32)
    gt_mask = np.ones((g, s, 2), np.float32)
    tgt, wts = traj_targets_from_assignment(
        (q, m, s, 2), jnp.asarray(pos_mask), jnp.asarray(assigned),
        jnp.asarray(gt_trajs), jnp.asarray(gt_mask))
    np.testing.assert_allclose(np.asarray(tgt)[0, 1], gt_trajs[1])
    np.testing.assert_allclose(np.asarray(tgt)[2, 0], gt_trajs[0])
    assert np.asarray(wts)[1].sum() == 0  # unmatched query: zero weight

    # decode: traj rows must stay aligned with the coder's masked boxes
    nc, b = 10, 1
    cls = rs.randn(1, b, q, nc).astype(np.float32)
    boxes = rs.randn(b, q, 9).astype(np.float32) * 2
    boxes[..., 0:2] = rs.uniform(-40, 40, (b, q, 2))
    boxes[..., 2] = rs.uniform(-3, 3, (b, q))  # z inside post_center_range
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 0.5
    # push one query's center out of the post-center range
    boxes[0, 3, 0:3] = 500.0
    reg = np.asarray(normalize_bbox(jnp.asarray(boxes)))
    preds = {
        "all_cls_scores": jnp.asarray(cls),
        "all_bbox_preds": jnp.asarray(reg)[None],
        "all_traj_preds": jnp.asarray(
            rs.randn(1, b, q, m, s, 2).astype(np.float32)),
        "all_traj_scores": jnp.asarray(
            rs.randn(1, b, q, m).astype(np.float32)),
    }
    coder = NMSFreeCoder(pc_range=PC, max_num=8, num_classes=nc)
    outs = decode_with_traj(coder, preds, max_modes=2)
    assert outs[0]["trajs"].shape == (len(outs[0]["bboxes"]), 2, s, 2)
    assert outs[0]["traj"] is outs[0]["trajs"]  # reference-name alias
    assert outs[0]["traj_scores"].shape == (len(outs[0]["bboxes"]), 2)
    # modes sorted by score
    assert (np.diff(outs[0]["traj_scores"], axis=-1) <= 1e-6).all()

    # decode output composes directly with the motion metrics (the
    # detection-metrics key convention: bboxes -> boxes)
    from panacea_tpu.perception.motion_metrics import evaluate_motion

    d = outs[0]
    mpreds = [{"boxes": d["bboxes"], "labels": d["labels"],
               "scores": d["scores"], "trajs": d["trajs"]}]
    mgts = [{"boxes": d["bboxes"][:2], "labels": d["labels"][:2],
             "trajs": [t[0] for t in d["trajs"][:2]]}]
    res = evaluate_motion(mpreds, mgts)
    assert np.isfinite(res["EPA"])
