"""Vector-map AP: goldens vs the reference AP.py/distance.py (loaded
directly — they only need numpy+scipy) and behavioral end-to-end AP."""

import importlib.util
import sys
import types

import numpy as np

from panacea_tpu.perception.vector_metrics import (
    average_precision,
    chamfer_distance,
    evaluate_vectors,
    instance_match,
    interp_fixed_num,
)

EV = ("/root/reference/sgm/data/nuscenes_video/projects/mmdet3d_plugin/"
      "datasets/eval_utils")


def _load_reference_ap():
    spec = importlib.util.spec_from_file_location("ref_distance",
                                                  f"{EV}/distance.py")
    dist = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dist)
    src = open(f"{EV}/AP.py").read().replace(
        "from .distance import", "from ref_distance import")
    sys.modules["ref_distance"] = dist
    mod = types.ModuleType("ref_ap")
    exec(compile(src, f"{EV}/AP.py", "exec"), mod.__dict__)
    return dist, mod


def test_chamfer_and_instance_match_match_reference():
    dist, ap = _load_reference_ap()
    rs = np.random.RandomState(0)
    l1 = rs.randn(100, 2)
    l2 = rs.randn(100, 2) + 0.5
    np.testing.assert_allclose(chamfer_distance(l1, l2),
                               dist.chamfer_distance(l1, l2), rtol=1e-12)

    preds = rs.randn(5, 100, 2) * 2
    gts = preds[:3] + rs.randn(3, 100, 2) * 0.05  # 3 close matches
    scores = rs.rand(5)
    ref = ap.instance_match(preds, scores, gts, [0.5, 1.0, 1.5])
    ours = instance_match(preds, scores, gts, [0.5, 1.0, 1.5])
    for (rtp, rfp), (otp, ofp) in zip(ref, ours):
        np.testing.assert_array_equal(otp, rtp)
        np.testing.assert_array_equal(ofp, rfp)

    # zero-gt / zero-pred edge cases
    ref0 = ap.instance_match(preds, scores, np.zeros((0, 100, 2)), [1.0])
    ours0 = instance_match(preds, scores, np.zeros((0, 100, 2)), [1.0])
    np.testing.assert_array_equal(ours0[0][1], ref0[0][1])


def test_average_precision_matches_reference():
    _, ap = _load_reference_ap()
    rs = np.random.RandomState(1)
    rec = np.sort(rs.rand(20))
    prec = rs.rand(20)
    np.testing.assert_allclose(average_precision(rec, prec),
                               ap.average_precision(rec, prec), rtol=1e-12)


def test_interp_fixed_num_arclength():
    v = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    out = interp_fixed_num(v, 5)
    assert out.shape == (5, 2)
    np.testing.assert_allclose(out[0], [0, 0])
    np.testing.assert_allclose(out[-1], [1, 1])
    np.testing.assert_allclose(out[2], [1.0, 0.0], atol=1e-12)  # midpoint


def test_evaluate_vectors_end_to_end():
    rs = np.random.RandomState(2)
    gt_lines = [rs.randn(8, 2) * 10 for _ in range(3)]
    gts = [{0: gt_lines[:2], 1: [gt_lines[2]], 2: []}]
    # perfect predictions
    preds = [{
        "vectors": gt_lines,
        "scores": [0.9, 0.8, 0.7],
        "labels": [0, 0, 1],
    }]
    out = evaluate_vectors(preds, gts)
    assert out["AP_0"] > 0.99 and out["AP_1"] > 0.99
    # class 2 has no GT and no preds -> AP 0 by convention; mAP averages
    assert out["AP_2"] == 0.0
    # displaced predictions beyond every threshold -> zero AP
    preds_bad = [{
        "vectors": [v + 50.0 for v in gt_lines],
        "scores": [0.9, 0.8, 0.7],
        "labels": [0, 0, 1],
    }]
    out_bad = evaluate_vectors(preds_bad, gts)
    assert out_bad["AP_0"] == 0.0 and out_bad["AP_1"] == 0.0
