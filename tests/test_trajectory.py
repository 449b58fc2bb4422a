"""GT future-trajectory extraction (trajectory_api.py equivalent):
geometric correctness with real ego poses, truncation at broken chains and
scene boundaries, and synthetic-infos integration."""

import numpy as np

from panacea_tpu.data.nuscenes.trajectory import future_trajectories


def _info(t, scene="s0", inds=(0, 1), box_global_x=(10.0, -5.0),
          speed=(1.0, 0.0)):
    """Ego at (2t, 0); boxes move speed[i]/frame along global x. gt_boxes
    stored in the lidar(=ego) frame."""
    ego = np.array([2.0 * t, 0.0, 0.0])
    boxes = np.zeros((len(inds), 7))
    for i in range(len(inds)):
        gx = box_global_x[i] + speed[i] * t
        boxes[i, :3] = np.array([gx, 3.0 * i, 0.0]) - ego
        boxes[i, 3:6] = 1.0
    return {
        "token": f"tok-{t}",
        "scene_token": scene,
        "timestamp": t * 500000,
        "ego2global_rotation": [1.0, 0.0, 0.0, 0.0],  # wxyz identity
        "ego2global_translation": ego.tolist(),
        "lidar2ego_rotation": [1.0, 0.0, 0.0, 0.0],
        "lidar2ego_translation": [0.0, 0.0, 0.0],
        "gt_boxes": boxes,
        "gt_names": ["car"] * len(inds),
        "instance_inds": np.asarray(inds, np.int64),
    }


def test_future_trajectory_geometry():
    infos = [_info(t) for t in range(6)]
    fut, valid = future_trajectories(infos, 0, pred_steps=4)
    assert fut.shape == (2, 4, 2) and valid.shape == (2, 4, 2)
    assert valid.all()
    # box 0: global x = 10 + t, frame-0 ego at origin -> future ego-frame
    # positions (11,0), (12,0), ...
    np.testing.assert_allclose(fut[0, :, 0], [11, 12, 13, 14])
    np.testing.assert_allclose(fut[0, :, 1], 0.0)
    # box 1 static at global (-5, 3): constant in frame-0 ego frame
    np.testing.assert_allclose(fut[1, :, 0], -5.0)
    np.testing.assert_allclose(fut[1, :, 1], 3.0)

    # from frame 2: same motion, but relative to ego at (4, 0)
    fut2, _ = future_trajectories(infos, 2, pred_steps=3)
    np.testing.assert_allclose(fut2[0, :, 0], [13 - 4, 14 - 4, 15 - 4])


def test_future_trajectory_truncation():
    infos = [_info(t) for t in range(3)]
    # instance 1 disappears at frame 2 -> its chain truncates after 1 step
    infos[2]["instance_inds"] = np.asarray([0], np.int64)
    infos[2]["gt_boxes"] = infos[2]["gt_boxes"][:1]
    fut, valid = future_trajectories(infos, 0, pred_steps=4)
    assert valid[0].sum() == 2 * 2  # frames 1, 2 exist for instance 0
    assert valid[1].sum() == 1 * 2  # instance 1 only at frame 1
    assert (fut[1, 1:] == 0).all()

    # scene boundary stops the future entirely
    infos[1]["scene_token"] = "other-scene"
    fut, valid = future_trajectories(infos, 0, pred_steps=4)
    assert valid.sum() == 0


def test_future_trajectory_on_synthetic_infos():
    from panacea_tpu.data.nuscenes.synthetic import make_synthetic_infos

    infos = make_synthetic_infos(num_frames=6, num_boxes=3, seed=0)
    fut, valid = future_trajectories(infos, 1, pred_steps=12)
    assert fut.shape == (3, 12, 2)
    # 4 future frames exist in-scene
    assert valid[:, :4].all() and not valid[:, 4:].any()
    # synthetic world: boxes drift -2 m/frame in the shared frame
    step_dx = np.diff(fut[0, :4, 0])
    np.testing.assert_allclose(step_dx, -2.0, atol=1e-6)
