"""GT future-trajectory labels from temporal infos.

Rebuild of the generation-side plugin's ``NuScenesTraj``
(sgm/data/nuscenes_video/projects/mmdet3d_plugin/datasets/data_utils/
trajectory_api.py:12-54) without the nuscenes devkit: the reference asks
``PredictHelper.get_future_for_agent`` for up to ``pred_steps`` keyframes
(6 s at 2 Hz) of each annotation's GLOBAL positions, then maps them into
the CURRENT frame's ego frame via ``ego_pose_inv`` (:34-40), zero-padding
to fixed length with a validity mask.

Here the same future positions come straight from the temporal infos the
framework already builds (scripts/make_infos.py): each frame's
``gt_boxes`` are in the lidar frame, so global = ego2global @ lidar2ego @
center, matched across frames by ``instance_inds``. The future stops at a
scene boundary or the first frame the instance disappears from (the
devkit helper truncates identically on a broken annotation chain).

Frame convention — reference-faithful quirk: the targets land in the EGO
frame via a 2x2 xy rotation (``ego_pose_inv[:2, :2]``, trajectory_api.py:39
exactly), while the motion head anchors its cumsum trajectory predictions
at box centers in the LIDAR/pc_range frame
(petr_motion_head.py:669-671). On real nuScenes (lidar2ego is a ~90° yaw)
the two frames differ; the reference trains and evaluates with this
inconsistency, so we reproduce it rather than "fix" it — changing either
side would diverge from the recipe and from converted checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from panacea_tpu.data.nuscenes.calib import quat_to_rotmat


def _lidar_to_global(info: Dict[str, Any]) -> np.ndarray:
    """4x4 lidar->global (identity pieces when the info lacks the field —
    the synthetic scenes express everything in one frame)."""
    l2e = np.eye(4)
    if "lidar2ego_rotation" in info:
        l2e[:3, :3] = quat_to_rotmat(info["lidar2ego_rotation"])
        l2e[:3, 3] = np.asarray(info["lidar2ego_translation"])
    e2g = np.eye(4)
    if "ego2global_rotation" in info:
        e2g[:3, :3] = quat_to_rotmat(info["ego2global_rotation"])
        e2g[:3, 3] = np.asarray(info["ego2global_translation"])
    return e2g @ l2e


def _ego_to_global(info: Dict[str, Any]) -> np.ndarray:
    e2g = np.eye(4)
    if "ego2global_rotation" in info:
        e2g[:3, :3] = quat_to_rotmat(info["ego2global_rotation"])
        e2g[:3, 3] = np.asarray(info["ego2global_translation"])
    return e2g


def future_trajectories(
    infos: List[Dict[str, Any]],
    idx: int,
    pred_steps: int = 12,
) -> Tuple[np.ndarray, np.ndarray]:
    """GT future xy for every box of ``infos[idx]``, in that frame's EGO
    frame (trajectory_api.py:21-54 semantics).

    Returns (fut_traj (G, pred_steps, 2), valid_mask (G, pred_steps, 2)).
    Requires ``instance_inds`` in the infos (make_infos.py emits them;
    synthetic scenes number their boxes)."""
    info = infos[idx]
    inds = np.asarray(info["instance_inds"])
    g = len(inds)
    fut = np.zeros((g, pred_steps, 2))
    valid = np.zeros((g, pred_steps, 2))
    ego_pose_inv = np.linalg.inv(_ego_to_global(info))

    # instance -> global center per future frame (same scene, contiguous)
    future_maps = []
    for s in range(1, pred_steps + 1):
        j = idx + s
        if j >= len(infos) or infos[j].get("scene_token") != info.get(
                "scene_token"):
            break
        fi = infos[j]
        l2g = _lidar_to_global(fi)
        centers = np.asarray(fi["gt_boxes"])[:, :3]
        gl = centers @ l2g[:3, :3].T + l2g[:3, 3]
        future_maps.append(dict(zip(
            np.asarray(fi["instance_inds"]).tolist(), gl)))

    for bi, ind in enumerate(inds.tolist()):
        for s, fmap in enumerate(future_maps):
            if ind not in fmap:
                break  # broken chain truncates, like PredictHelper
            p = fmap[ind]
            xy = p[:2] @ ego_pose_inv[:2, :2].T + ego_pose_inv[:2, 3]
            fut[bi, s] = xy
            valid[bi, s] = 1.0
    return fut, valid
