"""Raw nuScenes v1.0 tables -> nuscenes2d temporal infos pkl.

The reference consumes `nuscenes2d_(ego_)temporal_infos_{split}.pkl` files
produced by mmdet3d/StreamPETR converter tooling that is NOT part of the
reference repo. This standalone generator builds equivalent infos straight
from the raw annotation JSONs (v1.0-{mini,trainval}/*.json) with no
devkit/mmdet3d dependency, emitting every field this framework's data path
reads (data/nuscenes/dataset.py, perception/eval_dataset.py,
perception/train_dataset.py):

  token, scene_token, location, timestamp,
  cams{CAM: data_path, timestamp, sensor2ego_rotation/translation,
       cam_intrinsic},
  ego2global_rotation/translation,
  gt_boxes (G, 7) [x, y, z, w, l, h, yaw] in the LIDAR_TOP frame,
  gt_names, gt_velocity (G, 2), valid_flag,
  bboxes2d / labels2d (per camera, projected from the 3D boxes).

Conventions follow the mmdet3d converter: boxes move global -> ego ->
lidar via the key-frame LIDAR_TOP calibration; yaw is the box heading in
the lidar frame; velocities are finite-difference global velocities
rotated into the lidar frame.

Usage:
  python scripts/make_infos.py --root data/nuscenes \
      --version v1.0-trainval --out data/nuscenes/nuscenes2d_ego_temporal_infos
  # writes <out>_train.pkl and <out>_val.pkl
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAMS = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
        "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")

# official train/val scene split is distributed with the devkit; without it
# we fall back to the deterministic tail split used by the mini set
MINI_VAL = {"scene-0103", "scene-0916"}


def quat_to_rot(q) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def load_tables(root: str, version: str) -> Dict[str, List[dict]]:
    d = os.path.join(root, version)
    tables = {}
    for name in ("scene", "sample", "sample_data", "calibrated_sensor",
                 "sensor", "ego_pose", "sample_annotation", "instance",
                 "category", "attribute", "log"):
        with open(os.path.join(d, f"{name}.json")) as f:
            tables[name] = json.load(f)
    return tables


def index(rows, key="token"):
    return {r[key]: r for r in rows}


def category_to_name(cat: str) -> str:
    """nuScenes category -> detection class (devkit detection mapping)."""
    m = {
        "vehicle.car": "car", "vehicle.truck": "truck", "vehicle.bus": "bus",
        "vehicle.bus.bendy": "bus", "vehicle.bus.rigid": "bus",
        "vehicle.construction": "construction_vehicle",
        "vehicle.trailer": "trailer", "vehicle.motorcycle": "motorcycle",
        "vehicle.bicycle": "bicycle",
        "human.pedestrian.adult": "pedestrian",
        "human.pedestrian.child": "pedestrian",
        "human.pedestrian.construction_worker": "pedestrian",
        "human.pedestrian.police_officer": "pedestrian",
        "movable_object.barrier": "barrier",
        "movable_object.trafficcone": "traffic_cone",
    }
    for k, v in m.items():
        if cat.startswith(k):
            return v
    return cat


def project_2d(boxes7, labels, l2i, hw=(900, 1600), min_size=4.0):
    """3D lidar boxes -> per-camera 2D xyxy + CLASS labels (same corner-hull
    method as perception/train_dataset.project_boxes_2d, at raw resolution).
    labels2d are consumed as focal-loss class ids by the 2D aux heads
    (train_dataset.py window_with_gt), so they must be detection-class
    indices, not box indices."""
    from panacea_tpu.perception.train_dataset import project_boxes_2d

    return project_boxes_2d(boxes7, labels, l2i, hw, min_size=min_size)


def build_infos(root: str, version: str):
    t = load_tables(root, version)
    samples = index(t["sample"])
    sdata = t["sample_data"]
    calib = index(t["calibrated_sensor"])
    sensors = index(t["sensor"])
    poses = index(t["ego_pose"])
    scenes = index(t["scene"])
    logs = index(t["log"])
    cats = index(t["category"])
    instances = index(t["instance"])

    # key-frame sample_data per (sample, channel)
    key_sd: Dict[tuple, dict] = {}
    for sd in sdata:
        if not sd["is_key_frame"]:
            continue
        ch = sensors[calib[sd["calibrated_sensor_token"]]["sensor_token"]][
            "channel"]
        key_sd[(sd["sample_token"], ch)] = sd

    anns_by_sample: Dict[str, List[dict]] = {}
    for a in t["sample_annotation"]:
        anns_by_sample.setdefault(a["sample_token"], []).append(a)
    ann_by_token = index(t["sample_annotation"])

    def global_velocity(a, dt_max=1.5):
        """Finite difference over prev/next annotations (devkit
        box_velocity): the time window is dt_max per available side — 2x
        only when BOTH neighbors exist — and NaN when no neighbor exists
        or the gap is too wide (the dataset zeroes NaN at load, matching
        mmdet3d get_ann_info)."""
        prev = ann_by_token.get(a["prev"]) if a["prev"] else None
        nxt = ann_by_token.get(a["next"]) if a["next"] else None
        if prev is None and nxt is None:
            return np.full(3, np.nan)
        first, last = prev or a, nxt or a
        t0 = samples[first["sample_token"]]["timestamp"] / 1e6
        t1 = samples[last["sample_token"]]["timestamp"] / 1e6
        cap = 2 * dt_max if (prev is not None and nxt is not None) else dt_max
        if t1 - t0 > cap or t1 == t0:
            return np.full(3, np.nan)
        p0 = np.asarray(first["translation"])
        p1 = np.asarray(last["translation"])
        return (p1 - p0) / (t1 - t0)

    infos = []
    instance_ids: Dict[str, int] = {}
    for sample in t["sample"]:
        tok = sample["token"]
        lidar = key_sd.get((tok, "LIDAR_TOP"))
        if lidar is None:
            continue
        lcal = calib[lidar["calibrated_sensor_token"]]
        lpose = poses[lidar["ego_pose_token"]]
        r_e2g = quat_to_rot(lpose["rotation"])
        t_e2g = np.asarray(lpose["translation"])
        r_l2e = quat_to_rot(lcal["rotation"])
        t_l2e = np.asarray(lcal["translation"])

        cams = {}
        l2is = []
        for ch in CAMS:
            sd = key_sd.get((tok, ch))
            if sd is None:
                continue
            ccal = calib[sd["calibrated_sensor_token"]]
            cams[ch] = {
                "data_path": sd["filename"],
                "timestamp": sd["timestamp"],
                "sensor2ego_rotation": ccal["rotation"],
                "sensor2ego_translation": ccal["translation"],
                "cam_intrinsic": np.asarray(ccal["camera_intrinsic"]),
            }
            # lidar2img for the 2D projections: lidar->ego->cam->img
            r_c2e = quat_to_rot(ccal["rotation"])
            t_c2e = np.asarray(ccal["translation"])
            e2c = np.eye(4)
            e2c[:3, :3] = r_c2e.T
            e2c[:3, 3] = -r_c2e.T @ t_c2e
            l2e = np.eye(4)
            l2e[:3, :3] = r_l2e
            l2e[:3, 3] = t_l2e
            K = np.eye(4)
            K[:3, :3] = np.asarray(ccal["camera_intrinsic"])
            l2is.append(K @ e2c @ l2e)
        if len(cams) != len(CAMS):
            continue

        boxes, names, vels, valid, inst_inds = [], [], [], [], []
        for a in anns_by_sample.get(tok, []):
            name = category_to_name(
                cats[instances[a["instance_token"]]["category_token"]][
                    "name"])
            # global -> ego -> lidar
            c = np.asarray(a["translation"])
            c = r_e2g.T @ (c - t_e2g)
            c = r_l2e.T @ (c - t_l2e)
            # full rotation composition (devkit Box.rotate chain), yaw
            # extracted from the composed box x-axis — exact even with
            # non-planar ego roll/pitch
            r_box = quat_to_rot(a["rotation"])
            r_l = r_l2e.T @ (r_e2g.T @ r_box)
            vx = r_l @ np.array([1.0, 0.0, 0.0])
            yaw = float(np.arctan2(vx[1], vx[0]))
            w, l, h = a["size"]
            boxes.append([*c, w, l, h, yaw])
            names.append(name)
            v = global_velocity(a)[:2]
            v3 = np.array([*v, 0.0])
            v3 = r_l2e.T @ (r_e2g.T @ v3)
            vels.append(v3[:2])
            valid.append(a["num_lidar_pts"] + a["num_radar_pts"] > 0)
            inst_inds.append(instance_ids.setdefault(
                a["instance_token"], len(instance_ids)))

        gt_boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
        info = {
            "token": tok,
            "scene_token": sample["scene_token"],
            "location": logs[scenes[sample["scene_token"]]["log_token"]][
                "location"],
            "timestamp": sample["timestamp"],
            "cams": cams,
            "ego2global_rotation": lpose["rotation"],
            "ego2global_translation": lpose["translation"],
            "lidar2ego_rotation": lcal["rotation"],
            "lidar2ego_translation": lcal["translation"],
            "gt_boxes": gt_boxes,
            "gt_names": np.asarray(names),
            "gt_velocity": np.asarray(vels, np.float64).reshape(-1, 2),
            "valid_flag": np.asarray(valid, bool),
            # stable int per instance_token, for tracking/trajectory labels
            # (StreamPETR converter 'instance_inds' convention;
            # data/nuscenes/trajectory.py consumes them)
            "instance_inds": np.asarray(inst_inds, np.int64),
        }
        # 2D aux annotations: only the 10 detection classes (the reference
        # nuscenes2d converter annotates exactly these), labels as class ids
        from panacea_tpu.perception.metrics import CLASS_NAMES

        cls_labels = np.array(
            [CLASS_NAMES.index(n) if n in CLASS_NAMES else -1
             for n in info["gt_names"]], np.int64)
        det_mask = cls_labels >= 0
        det_boxes = gt_boxes[det_mask]
        det_labels = cls_labels[det_mask]
        b2d, l2d = [], []
        for l2i in l2is:
            bb, ll = project_2d(det_boxes, det_labels, [l2i])
            b2d.append(bb[0])
            l2d.append(ll[0])
        info["bboxes2d"] = b2d
        info["labels2d"] = l2d
        infos.append(info)

    infos.sort(key=lambda e: e["timestamp"])
    return infos, scenes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/nuscenes")
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--out", default=None,
                    help="output prefix; default <root>/nuscenes2d_ego_"
                         "temporal_infos")
    ap.add_argument("--splits_json", default=None,
                    help="json {'train': [scene names], 'val': [...]}; "
                         "default: devkit mini split for v1.0-mini, "
                         "all-train otherwise")
    args = ap.parse_args()

    infos, scenes = build_infos(args.root, args.version)
    out = args.out or os.path.join(args.root,
                                   "nuscenes2d_ego_temporal_infos")
    if args.splits_json:
        with open(args.splits_json) as f:
            sp = json.load(f)
        val_names = set(sp.get("val", []))
    elif args.version == "v1.0-mini":
        val_names = MINI_VAL
    else:
        val_names = set()
    name_of = {s["token"]: s["name"] for s in scenes.values()}
    splits = {"train": [], "val": []}
    for info in infos:
        split = "val" if name_of[info["scene_token"]] in val_names else \
            "train"
        splits[split].append(info)
    for split, items in splits.items():
        path = f"{out}_{split}.pkl"
        with open(path, "wb") as f:
            pickle.dump({"infos": items,
                         "metadata": {"version": args.version}}, f)
        print(f"{len(items)} samples -> {path}")


if __name__ == "__main__":
    main()
