"""Behavioral tests for the nuScenes metric reimplementation."""

import numpy as np

from panacea_tpu.perception.metrics import (
    CLASS_NAMES,
    accumulate_class,
    evaluate_detections,
    yaw_diff,
)


def make_scene(rs, n=6, cls=0):
    boxes = np.zeros((n, 9))
    boxes[:, 0:2] = rs.uniform(-40, 40, (n, 2))
    boxes[:, 2] = 0.0
    boxes[:, 3:6] = rs.uniform(1, 4, (n, 3))
    boxes[:, 6] = rs.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rs.uniform(-2, 2, (n, 2))
    labels = np.full(n, cls)
    return {"boxes": boxes, "labels": labels}


def test_perfect_predictions_score_one():
    rs = np.random.RandomState(0)
    gts = [make_scene(rs) for _ in range(3)]
    preds = []
    for g in gts:
        preds.append({
            "boxes": g["boxes"].copy(),
            "labels": g["labels"].copy(),
            "scores": np.linspace(0.9, 0.5, len(g["labels"])),
        })
    out = evaluate_detections(preds, gts, class_names=("car",))
    assert out["mAP"] > 0.98
    assert out["mATE"] < 0.01
    assert out["mASE"] < 0.01
    assert out["mAOE"] < 0.01
    assert out["mAVE"] < 0.01
    assert out["NDS"] > 0.98


def test_empty_predictions_score_zero():
    rs = np.random.RandomState(1)
    gts = [make_scene(rs)]
    preds = [{
        "boxes": np.zeros((0, 9)), "labels": np.zeros((0,), dtype=int),
        "scores": np.zeros((0,)),
    }]
    out = evaluate_detections(preds, gts, class_names=("car",))
    assert out["mAP"] == 0.0
    assert out["NDS"] <= 0.1


def test_far_predictions_are_false_positives():
    rs = np.random.RandomState(2)
    gts = [make_scene(rs, n=4)]
    preds = [{
        "boxes": gts[0]["boxes"] + np.array([50, 50, 0, 0, 0, 0, 0, 0, 0]),
        "labels": gts[0]["labels"],
        "scores": np.full(4, 0.9),
    }]
    ap, _ = accumulate_class(preds, gts, "car", 2.0)
    assert ap == 0.0


def test_noisy_predictions_intermediate():
    rs = np.random.RandomState(3)
    gts = [make_scene(rs, n=10) for _ in range(4)]
    preds = []
    for g in gts:
        keep = rs.rand(10) > 0.3  # drop ~30%
        boxes = g["boxes"][keep] + rs.normal(0, 0.3, (keep.sum(), 9))
        preds.append({
            "boxes": boxes,
            "labels": g["labels"][keep],
            "scores": rs.uniform(0.3, 1.0, keep.sum()),
        })
    out = evaluate_detections(preds, gts, class_names=("car",))
    assert 0.05 < out["mAP"] < 0.95
    assert 0.05 < out["NDS"] < 0.95


def test_yaw_diff_period():
    assert abs(yaw_diff(0.1, 2 * np.pi - 0.1) - 0.2) < 1e-9
    assert abs(yaw_diff(0.0, np.pi, period=np.pi)) < 1e-9  # barrier period


def test_class_confusion_hurts():
    rs = np.random.RandomState(4)
    gts = [make_scene(rs, n=6, cls=0)]
    preds = [{
        "boxes": gts[0]["boxes"].copy(),
        "labels": np.full(6, 1),  # wrong class
        "scores": np.full(6, 0.9),
    }]
    out = evaluate_detections(preds, gts, class_names=CLASS_NAMES[:2])
    assert out["AP_car"] == 0.0 or np.isnan(out["AP_car"]) is False
    assert out["mAP"] < 0.1
