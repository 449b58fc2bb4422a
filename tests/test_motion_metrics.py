"""Motion metrics: torch-golden parity for minADE/minFDE/miss-rate against
the reference metric_utils.py, and behavioral tests for the trajectory-gated
accumulation + EPA (nuscenes_eval_motion.py protocols)."""

import importlib.util

import numpy as np
import pytest

from panacea_tpu.perception.motion_metrics import (
    accumulate_class_motion,
    evaluate_motion,
    min_ade,
    min_fde,
    miss_rate,
    prediction_metrics,
    traj_fde,
)

REF = ("/root/reference/sgm/data/nuscenes_video/projects/mmdet3d_plugin/"
       "datasets/eval_utils/metric_utils.py")


def _ref_metric_utils():
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location("ref_metric_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_min_ade_fde_missrate_match_reference():
    torch = pytest.importorskip("torch")
    mu = _ref_metric_utils()
    rs = np.random.RandomState(0)
    b, m, s = 7, 4, 6
    traj = rs.randn(b, m, s, 2).astype(np.float64)
    gt = rs.randn(b, s, 2).astype(np.float64)
    # ragged invalidity masks (1 = invalid), incl. a fully-valid row
    masks = (rs.rand(b, s) > 0.6).astype(np.float64)
    masks[0] = 0

    r_ade, r_ai = mu.min_ade(torch.tensor(traj), torch.tensor(gt),
                             torch.tensor(masks))
    r_fde, r_fi = mu.min_fde(torch.tensor(traj), torch.tensor(gt),
                             torch.tensor(masks))
    r_mr = mu.miss_rate(torch.tensor(traj), torch.tensor(gt),
                        torch.tensor(masks), dist_thresh=2)

    o_ade, o_ai = min_ade(traj, gt, masks)
    o_fde, o_fi = min_fde(traj, gt, masks)
    o_mr = miss_rate(traj, gt, masks, dist_thresh=2)

    np.testing.assert_allclose(o_ade, r_ade.numpy(), rtol=1e-9)
    np.testing.assert_array_equal(o_ai, r_ai.numpy())
    np.testing.assert_allclose(o_fde, r_fde.numpy(), rtol=1e-9)
    np.testing.assert_array_equal(o_fi, r_fi.numpy())
    np.testing.assert_allclose(o_mr, float(r_mr), rtol=1e-6)


def test_traj_fde_matches_reference_formula():
    mu = _ref_metric_utils()

    class Box:
        pass

    rs = np.random.RandomState(3)
    gt = Box()
    gt.traj = rs.randn(5, 2)
    pred = Box()
    pred.traj = rs.randn(3, 12, 2)
    ref = mu.traj_fde(gt, pred, 12)
    ours = traj_fde(gt.traj, np.asarray(pred.traj), 12)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)
    # empty GT future -> inf (metric_utils.py:96-97)
    gt.traj = np.zeros((0, 2))
    assert traj_fde(gt.traj, np.asarray(pred.traj), 12) == np.inf


def _make_scene(rs, n_boxes=4, m=3, s=6, traj_offset=0.0):
    boxes = np.zeros((n_boxes, 9))
    boxes[:, 0] = np.arange(n_boxes) * 10.0
    boxes[:, 1] = 5.0
    boxes[:, 3:6] = 2.0
    labels = np.zeros((n_boxes,), np.int64)  # all 'car'
    gt_trajs = [boxes[i, :2] + np.cumsum(rs.rand(s, 2), axis=0)
                for i in range(n_boxes)]
    pred_trajs = np.stack([
        np.stack([gt_trajs[i] + traj_offset for _ in range(m)])
        for i in range(n_boxes)])
    gt = {"boxes": boxes, "labels": labels, "trajs": gt_trajs}
    pred = {"boxes": boxes.copy(), "labels": labels.copy(),
            "scores": np.linspace(0.9, 0.5, n_boxes),
            "trajs": pred_trajs}
    return pred, gt


def test_accumulate_motion_gate_and_epa():
    rs = np.random.RandomState(1)
    pred, gt = _make_scene(rs)

    ap, tps, n_tp, n_fp, npos = accumulate_class_motion(
        [pred], [gt], "car", dist_th=2.0)
    assert n_tp == 4 and n_fp == 0 and npos == 4
    assert ap > 0.85
    assert tps["min_ade_err"] < 1e-9 and tps["min_fde_err"] < 1e-9
    assert tps["miss_rate_err"] == 0.0

    # trajectories displaced beyond the 2 m FDE gate: perfect boxes now FAIL
    # the motion-gated matching (accumulate_motion semantics)...
    pred_bad, _ = _make_scene(rs, traj_offset=5.0)
    ap_b, _, tp_b, fp_b, _ = accumulate_class_motion(
        [pred_bad], [gt], "car", dist_th=2.0)
    assert tp_b == 0 and fp_b == 4 and ap_b == 0.0
    # ...but still pass the plain detection matching
    _, _, tp_p, fp_p, _ = accumulate_class_motion(
        [pred_bad], [gt], "car", dist_th=2.0, gate_on_traj=False)
    assert tp_p == 4 and fp_p == 0

    out = evaluate_motion([pred], [gt], class_names=("car",))
    assert out["EPA_car"] == pytest.approx(4 / (4 + 1e-5), rel=1e-6)
    assert out["minADE"] < 1e-9 and out["miss_rate"] == 0.0
    # displaced trajs: traj_tp=0, det_fp=0 -> EPA 0
    out_b = evaluate_motion([pred_bad], [gt], class_names=("car",))
    assert out_b["EPA_car"] == pytest.approx(0.0, abs=1e-9)


def test_prediction_metrics_zero_on_empty_future():
    assert prediction_metrics(np.zeros((0, 2)),
                              np.zeros((3, 12, 2))) == (0.0, 0.0, 0.0)
