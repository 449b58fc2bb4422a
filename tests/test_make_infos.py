"""Raw-nuScenes infos generator (scripts/make_infos.py) on a constructed
mini table set: transform chain global->ego->lidar, velocities, 2D
projections, and downstream dataset compatibility."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

CAMS = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
        "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")


def _write_mini_nuscenes(root, num_samples=3):
    v = os.path.join(root, "v1.0-mini")
    os.makedirs(v, exist_ok=True)
    ident = [1.0, 0.0, 0.0, 0.0]
    t = {k: [] for k in ("scene", "sample", "sample_data",
                         "calibrated_sensor", "sensor", "ego_pose",
                         "sample_annotation", "instance", "category",
                         "attribute", "log")}
    t["log"].append({"token": "log0", "location": "singapore-onenorth"})
    t["scene"].append({"token": "sc0", "name": "scene-0001",
                       "log_token": "log0"})
    t["category"].append({"token": "cat_car", "name": "vehicle.car"})
    t["instance"].append({"token": "inst0", "category_token": "cat_car"})
    t["sensor"].append({"token": "sens_lidar", "channel": "LIDAR_TOP",
                        "modality": "lidar"})
    t["calibrated_sensor"].append({
        "token": "cal_lidar", "sensor_token": "sens_lidar",
        "rotation": ident, "translation": [0.0, 0.0, 1.8],
        "camera_intrinsic": []})
    # front camera: lidar/ego x-forward -> camera z-forward
    # quaternion for R = [[0,-1,0],[0,0,-1],[1,0,0]] (w,x,y,z)
    cam_q = [0.5, -0.5, 0.5, -0.5]
    K = [[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]]
    for ci, ch in enumerate(CAMS):
        t["sensor"].append({"token": f"sens_{ch}", "channel": ch,
                            "modality": "camera"})
        t["calibrated_sensor"].append({
            "token": f"cal_{ch}", "sensor_token": f"sens_{ch}",
            "rotation": cam_q, "translation": [1.5, 0.0, 1.6],
            "camera_intrinsic": K})
    prev_s = ""
    for i in range(num_samples):
        stok = f"s{i}"
        ts = 1_000_000 * (i + 1)
        t["sample"].append({"token": stok, "timestamp": ts,
                            "scene_token": "sc0",
                            "prev": prev_s, "next": ""})
        if prev_s:
            t["sample"][-2]["next"] = stok
        prev_s = stok
        t["ego_pose"].append({"token": f"ep{i}",
                              "rotation": ident,
                              "translation": [2.0 * i, 0.0, 0.0],
                              "timestamp": ts})
        for ch in ("LIDAR_TOP",) + CAMS:
            t["sample_data"].append({
                "token": f"sd_{i}_{ch}", "sample_token": stok,
                "ego_pose_token": f"ep{i}",
                "calibrated_sensor_token": ("cal_lidar" if ch == "LIDAR_TOP"
                                            else f"cal_{ch}"),
                "filename": f"samples/{ch}/scene0__{ch}__{ts}.jpg",
                "fileformat": "jpg", "is_key_frame": True,
                "timestamp": ts})
        # one car at global (12, 1, 0.8), moving +x at 1 m/s
        t["sample_annotation"].append({
            "token": f"ann{i}", "sample_token": stok,
            "instance_token": "inst0",
            "translation": [12.0 + 1.0 * i, 1.0, 0.8],
            "size": [1.9, 4.5, 1.6], "rotation": ident,
            "prev": f"ann{i-1}" if i else "", "next": "",
            "num_lidar_pts": 10, "num_radar_pts": 2,
            "attribute_tokens": []})
        if i:
            t["sample_annotation"][-2]["next"] = f"ann{i}"
    for k, rows in t.items():
        with open(os.path.join(v, f"{k}.json"), "w") as f:
            json.dump(rows, f)
    return root


def test_build_infos_geometry(tmp_path):
    from make_infos import build_infos

    root = _write_mini_nuscenes(str(tmp_path))
    infos, scenes = build_infos(root, "v1.0-mini")
    assert len(infos) == 3
    info = infos[1]  # ego at x=2
    assert set(info["cams"]) == set(CAMS)
    # global car (13, 1, 0.8); ego at (2,0,0) identity; lidar z-offset 1.8
    np.testing.assert_allclose(info["gt_boxes"][0, :3],
                               [11.0, 1.0, -1.0], atol=1e-6)
    assert info["gt_names"][0] == "car"
    # velocity: +1 m/s global x (samples 1 s apart), identity frames
    np.testing.assert_allclose(info["gt_velocity"][0], [1.0, 0.0],
                               atol=1e-6)
    assert info["valid_flag"][0]
    # 2D projection exists in the front camera and brackets the projected
    # center u = fx * y_cam / z_cam + cx
    b2d = info["bboxes2d"][0]
    assert len(b2d) == 1
    # lidar -> ego -> cam: p_cam = R^T (p_ego - t_cam)
    p_ego = np.array([11.0, 1.0, 0.8])
    Rc = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    p_cam = Rc @ (p_ego - np.array([1.5, 0.0, 1.6]))
    u = 800 * p_cam[0] / p_cam[2] + 800
    vv = 800 * p_cam[1] / p_cam[2] + 450
    x0, y0, x1, y1 = b2d[0]
    assert x0 < u < x1 and y0 < vv < y1
    # labels2d are detection CLASS ids (focal-loss targets for the 2D aux
    # heads), not box indices
    from panacea_tpu.perception.metrics import CLASS_NAMES

    assert info["labels2d"][0][0] == CLASS_NAMES.index("car")


def test_cli_writes_pkls_dataset_loads(tmp_path):
    root = _write_mini_nuscenes(str(tmp_path))
    out = os.path.join(str(tmp_path), "infos")
    r = subprocess.run(
        [sys.executable, "scripts/make_infos.py", "--root", root,
         "--version", "v1.0-mini", "--out", out],
        capture_output=True, text=True, timeout=600, cwd=".")
    assert r.returncode == 0, r.stderr[-1500:]
    with open(out + "_train.pkl", "rb") as f:
        data = pickle.load(f)
    assert len(data["infos"]) == 3

    # downstream: the eval dataset consumes the pkl directly
    from panacea_tpu.perception.eval_dataset import GenNuScenesEvalDataset

    ds = GenNuScenesEvalDataset(
        ann_file=out + "_train.pkl", queue_length=2, final_dim=(32, 64),
        image_loader=lambda p: np.zeros((32, 64, 3), np.float32))
    w = ds.sliding_window(1)
    assert w is not None and w["imgs"].shape == (1, 2, 6, 32, 64, 3)
    gt = ds.gt_for(1, ["car"])
    assert gt["boxes"].shape[0] == 1 and gt["boxes"].shape[1] == 9
