"""Behavioral tests for the nuScenes metric reimplementation."""

import numpy as np

from panacea_tpu.perception.metrics import (
    CLASS_NAMES,
    accumulate_class,
    assign_attributes,
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
    return {"boxes": boxes, "labels": labels,
            "attrs": assign_attributes(boxes, labels)}


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


def test_wrong_attributes_raise_maae():
    """Perfect boxes with systematically wrong attributes: mAAE -> 1, NDS
    drops by exactly 0.1 vs the all-correct case."""
    rs = np.random.RandomState(5)
    gts = [make_scene(rs) for _ in range(2)]
    preds_ok, preds_bad = [], []
    for g in gts:
        base = {
            "boxes": g["boxes"].copy(),
            "labels": g["labels"].copy(),
            "scores": np.linspace(0.9, 0.5, len(g["labels"])),
        }
        preds_ok.append(dict(base, attrs=list(g["attrs"])))
        wrong = ["vehicle.moving" if a != "vehicle.moving" else
                 "vehicle.parked" for a in g["attrs"]]
        preds_bad.append(dict(base, attrs=wrong))
    out_ok = evaluate_detections(preds_ok, gts, class_names=("car",))
    out_bad = evaluate_detections(preds_bad, gts, class_names=("car",))
    assert out_ok["mAAE"] < 0.01
    assert out_bad["mAAE"] > 0.99
    assert abs((out_ok["NDS"] - out_bad["NDS"]) - 0.1) < 0.01


def test_devkit_hand_example():
    """Hand-computed devkit example: 1 sample, 2 GT cars, 2 matching preds.
    pred1 (score .9) -> gt1 at 0.5 m, correct attr; pred2 (score .5) -> gt2 at
    1.5 m, wrong attr. Derivation: rec=[.5,1], prec=[1,1] -> AP=1; conf grid
    is 0.9 below recall .5 then linear to 0.5; trans cummean [0.5, 1.0] and
    attr cummean [0, .5] interpolated on the conf grid give means over recall
    indices 11..100 of 0.641667 and 0.141667."""
    gt_boxes = np.zeros((2, 9))
    gt_boxes[1, 0] = 20.0
    gts = [{"boxes": gt_boxes, "labels": np.zeros(2, int),
            "attrs": ["vehicle.parked", "vehicle.parked"]}]
    pred_boxes = gt_boxes.copy()
    pred_boxes[0, 1] = 0.5   # 0.5 m offset from gt1
    pred_boxes[1, 1] = 1.5   # 1.5 m offset from gt2
    preds = [{"boxes": pred_boxes, "labels": np.zeros(2, int),
              "scores": np.array([0.9, 0.5]),
              "attrs": ["vehicle.parked", "vehicle.moving"]}]
    ap, tps = accumulate_class(preds, gts, "car", 2.0)
    assert abs(ap - 1.0) < 1e-9
    assert abs(tps["trans_err"] - 0.6416667) < 1e-4
    assert abs(tps["attr_err"] - 0.1416667) < 1e-4


def test_missing_gt_attrs_follow_devkit_nan_convention():
    """GT without attribute annotations: attr_err is all-nan -> cummean gives
    ones -> mAAE 1.0 (devkit behavior), never silently 0."""
    rs = np.random.RandomState(6)
    g = make_scene(rs, n=4)
    del g["attrs"]
    preds = [{"boxes": g["boxes"].copy(), "labels": g["labels"].copy(),
              "scores": np.linspace(0.9, 0.6, 4)}]
    out = evaluate_detections(preds, [g], class_names=("car",))
    assert out["mAAE"] == 1.0


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


def test_devkit_golden_fixture():
    """Golden against the hand-ported devkit oracle (scripts/
    make_devkit_golden.py — a line-by-line transcription of
    nuscenes/eval/detection/algo.py + evaluate.py, the code the reference
    delegates its headline NDS/mAP to). Three committed scenarios: basic
    single-class, multiclass with barrier/cone leave-outs + no_predictions
    corners, and a dense pseudo-random field. Asserts per-class per-threshold
    APs, per-class TP errors, mAP, mATE..mAAE, and NDS to 1e-9."""
    import json
    import os

    from panacea_tpu.perception.metrics import accumulate_class

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "devkit_golden.json")
    with open(path) as f:
        golden = json.load(f)

    def to_arrays(boxes_by_tok, with_scores):
        toks = sorted(boxes_by_tok)
        out = []
        for tok in toks:
            boxes, labels, attrs, scores = [], [], [], []
            for b in boxes_by_tok[tok]:
                vel = [np.nan if v is None else v for v in b["vel"]]
                boxes.append([*b["xy"], 0.0, *b["size"], b["yaw"], *vel])
                labels.append(CLASS_NAMES.index(b["name"]))
                attrs.append(b["attr"])
                if with_scores:
                    scores.append(b["score"])
            d = {"boxes": np.asarray(boxes, np.float64),
                 "labels": np.asarray(labels), "attrs": attrs}
            if with_scores:
                d["scores"] = np.asarray(scores, np.float64)
            out.append(d)
        return out

    name_map = {"trans_err": "mATE", "scale_err": "mASE",
                "orient_err": "mAOE", "vel_err": "mAVE", "attr_err": "mAAE"}
    for scen, entry in golden.items():
        gts = to_arrays(entry["gt"], with_scores=False)
        preds = to_arrays(entry["pred"], with_scores=True)
        exp = entry["expected"]
        res = evaluate_detections(preds, gts, class_names=entry["classes"])
        np.testing.assert_allclose(res["mAP"], exp["mean_ap"], atol=1e-9,
                                   err_msg=scen)
        np.testing.assert_allclose(res["NDS"], exp["nd_score"], atol=1e-9,
                                   err_msg=scen)
        for m, col in name_map.items():
            np.testing.assert_allclose(res[col], exp["tp_errors"][m],
                                       atol=1e-9, err_msg=f"{scen}:{col}")
        for c in entry["classes"]:
            np.testing.assert_allclose(
                res[f"AP_{c}"], exp["mean_dist_aps"][c], atol=1e-9,
                err_msg=f"{scen}:AP_{c}")
            for th in (0.5, 1.0, 2.0, 4.0):
                ap, tps = accumulate_class(preds, gts, c, th)
                np.testing.assert_allclose(
                    ap, exp["label_aps"][f"{c}|{th}"], atol=1e-9,
                    err_msg=f"{scen}:{c}@{th}")
            for m in name_map:
                want = exp["label_tps"][f"{c}|{m}"]
                if want is None:  # devkit leave-out (barrier/cone)
                    continue
                _, tps = accumulate_class(preds, gts, c, 2.0)
                np.testing.assert_allclose(
                    tps[m], want, atol=1e-9, err_msg=f"{scen}:{c}:{m}")
