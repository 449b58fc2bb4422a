"""Generate the checked-in real-data-format fixtures under tests/fixtures/:

  * tiny_infos.pkl — 3-frame {"infos": [...], "metadata": ...} pkl in the
    mmdet3d nuscenes2d_ego_temporal layout (reference plugin
    nuscenes_dataset.py:173-274 key contract): per-cam data_path /
    sensor2ego / cam_intrinsic, ego2global pose, gt boxes, scene/timestamp,
    map location — but NO precomputed map_vectors, so the raw-map-JSON
    extraction path runs.
  * samples/CAM_*/*.jpg — tiny on-disk camera JPGs at source resolution
    (gradient content; exercises the real decode + IDA path).
  * maps/singapore-onenorth.json — micro map-expansion JSON (nodes / lines /
    polygons / layer records) around the ego trajectory.

Deterministic — re-running reproduces identical infos (JPEG bytes may vary
across cv2 builds, which is fine: tests assert format contracts, not pixels).
"""

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.data.nuscenes.synthetic import make_synthetic_infos

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")


def make_map_json():
    """Straight road along global x near y=0: two road polygons, one lane
    divider, one ped crossing — within the 60x30 m roi of every ego pose."""
    nodes, recs = [], {}

    def node(tok, x, y):
        nodes.append({"token": tok, "x": float(x), "y": float(y)})

    for i, x in enumerate(range(-40, 61, 10)):
        node(f"d{i}", x, 0.0)
    quads = {
        "A": [(-40, -8), (10, -8), (10, 8), (-40, 8)],
        "B": [(10, -8), (60, -8), (60, 8), (10, 8)],
        "P": [(4, -8), (8, -8), (8, 8), (4, 8)],
    }
    for name, pts in quads.items():
        for j, (x, y) in enumerate(pts):
            node(f"{name}{j}", x, y)
    recs["line"] = [{"token": "L1",
                     "node_tokens": [f"d{i}" for i in range(11)]}]
    recs["polygon"] = [
        {"token": f"P{name}",
         "exterior_node_tokens": [f"{name}{j}" for j in range(4)],
         "holes": []}
        for name in quads
    ]
    recs["lane_divider"] = [{"token": "ld1", "line_token": "L1"}]
    recs["road_divider"] = []
    recs["ped_crossing"] = [{"token": "pc1", "polygon_token": "PP"}]
    recs["road_segment"] = [
        {"token": "rsA", "polygon_token": "PA"},
        {"token": "rsB", "polygon_token": "PB"},
    ]
    recs["lane"] = []
    recs["node"] = nodes
    return recs


def main():
    import cv2

    os.makedirs(FIX, exist_ok=True)
    infos = make_synthetic_infos(num_frames=3, num_boxes=4, seed=7,
                                 scene_token="fixture-scene")
    rs = np.random.RandomState(0)
    for t, info in enumerate(infos):
        # real-layout extras the synthetic generator doesn't need
        info["location"] = "singapore-onenorth"
        info["ego2global_rotation"] = [1.0, 0.0, 0.0, 0.0]
        info["ego2global_translation"] = [2.0 * t, 0.0, 0.0]
        info["lidar2ego_rotation"] = [1.0, 0.0, 0.0, 0.0]
        info["lidar2ego_translation"] = [0.0, 0.0, 0.0]
        info["gt_velocity"] = np.zeros((len(info["gt_boxes"]), 2))
        info["num_lidar_pts"] = np.ones(len(info["gt_boxes"]), np.int32) * 5
        info["sweeps"] = []
        del info["map_vectors"]  # force the raw map-JSON extraction path
        for cam, cinfo in info["cams"].items():
            rel = os.path.join("samples", cam, f"{t:05d}.jpg")
            cinfo["data_path"] = rel
            path = os.path.join(FIX, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # small gradient + noise; stored at source resolution (900x1600)
            yy, xx = np.mgrid[0:900, 0:1600]
            img = np.stack([
                (xx / 1600 * 255), (yy / 900 * 255),
                rs.uniform(0, 64, (900, 1600)),
            ], -1).astype(np.uint8)
            cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 30])

    with open(os.path.join(FIX, "tiny_infos.pkl"), "wb") as f:
        pickle.dump({"infos": infos,
                     "metadata": {"version": "v1.0-fixture"}}, f)

    os.makedirs(os.path.join(FIX, "maps"), exist_ok=True)
    with open(os.path.join(FIX, "maps", "singapore-onenorth.json"), "w") as f:
        json.dump(make_map_json(), f)
    print(f"fixtures written to {FIX}")


if __name__ == "__main__":
    main()


def regen_cond_img_golden():
    """Regenerate tests/fixtures/cond_img_golden.npz after INTENDED
    rendering changes (consumed by tests/test_data_fixture.py::
    test_cond_img_19ch_golden)."""
    from panacea_tpu.data.nuscenes.dataset import NuScenesVideoDataset

    ds = NuScenesVideoDataset(
        ann_file=os.path.join(FIX, "tiny_infos.pkl"), data_root=FIX,
        map_root=os.path.join(FIX, "maps"), queue_length=2,
        final_dim=(64, 128))
    item = ds[len(ds) - 1]
    np.savez_compressed(
        os.path.join(FIX, "cond_img_golden.npz"),
        cond_img=item["cond_img"].astype(np.float16),
        jpg=item["jpg"].astype(np.float16))
    print("cond_img_golden.npz regenerated")
