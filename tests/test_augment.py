"""Augmentation consistency: projections of augmented boxes through augmented
matrices match projections of original boxes through original matrices."""

import numpy as np

from panacea_tpu.data.nuscenes.augment import (
    global_rot_scale_trans,
    horizontal_flip_image,
)
from panacea_tpu.data.nuscenes.calib import build_lidar2img
from panacea_tpu.data.nuscenes.synthetic import _cam_quat


def _project(l2i, pts3d):
    p = np.concatenate([pts3d, np.ones((len(pts3d), 1))], axis=1)
    uvd = (l2i @ p.T).T
    return uvd[:, :2] / uvd[:, 2:3], uvd[:, 2]


def test_rot_scale_projection_consistent():
    intr = np.array([[800.0, 0, 800], [0, 800, 450], [0, 0, 1]])
    l2i, _, _ = build_lidar2img(_cam_quat(0.3), [1.0, 0.5, 1.6], intr)
    rs = np.random.RandomState(0)
    boxes = np.zeros((4, 9))
    boxes[:, 0] = rs.uniform(8, 20, 4)
    boxes[:, 1] = rs.uniform(-5, 5, 4)
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = 2.0
    new_boxes, new_l2i, inv = global_rot_scale_trans(
        boxes, np.asarray([l2i]), np.random.RandomState(7)
    )
    uv_old, d_old = _project(l2i, boxes[:, :3])
    uv_new, d_new = _project(new_l2i[0], new_boxes[:, :3])
    np.testing.assert_allclose(uv_new, uv_old, atol=1e-6)
    # depth scales with the scene
    assert np.all(d_new > 0)
    # the returned inverse is exactly what was folded into lidar2img, so
    # callers can fold the SAME transform into extrinsics/ego_pose
    np.testing.assert_allclose(new_l2i[0], l2i @ inv, atol=1e-9)
    # augmented-frame pose round trip: ego_pose @ inv composed with
    # inv(inv) @ ego_pose_inv is still the identity
    ego = np.eye(4)
    ego[:3, 3] = [3.0, -2.0, 0.5]
    ego_inv = np.linalg.inv(ego)
    np.testing.assert_allclose(
        (ego @ inv) @ (np.linalg.inv(inv) @ ego_inv), np.eye(4), atol=1e-9)

    # yaw must rotate WITH the centers: a point on the heading axis,
    # re-derived from the augmented (center, yaw), projects to the same
    # pixel as the original heading point through the original matrix
    # (catches the reverse_angle sign trap, transform_3d.py:583-588)
    boxes[:, 6] = np.random.RandomState(3).uniform(-np.pi, np.pi, 4)
    new_boxes, new_l2i, _ = global_rot_scale_trans(
        boxes, np.asarray([l2i]), np.random.RandomState(7))
    head_old = boxes[:, :3] + 2.0 * np.stack(
        [np.cos(boxes[:, 6]), np.sin(boxes[:, 6]), np.zeros(4)], -1)
    head_new = new_boxes[:, :3] + 2.0 * (
        new_boxes[:, 3:4] / boxes[:, 3:4]) * np.stack(
        [np.cos(new_boxes[:, 6]), np.sin(new_boxes[:, 6]), np.zeros(4)], -1)
    uv_old, _ = _project(l2i, head_old)
    uv_new, _ = _project(new_l2i[0], head_new)
    np.testing.assert_allclose(uv_new, uv_old, atol=1e-6)


def test_hflip_projection():
    intr = np.array([[800.0, 0, 800], [0, 800, 450], [0, 0, 1]])
    l2i, _, _ = build_lidar2img(_cam_quat(0.0), [0.0, 0.0, 1.6], intr)
    img = np.arange(10 * 1600 * 3, dtype=np.uint8).reshape(10, 1600, 3)
    pt = np.array([[10.0, 2.0, 1.6]])
    uv_old, _ = _project(l2i, pt)
    flipped, l2i_f = horizontal_flip_image(img, l2i)
    uv_new, _ = _project(l2i_f, pt)
    np.testing.assert_allclose(uv_new[0, 0], 1600 - 1 - uv_old[0, 0], atol=1e-9)
    np.testing.assert_allclose(uv_new[0, 1], uv_old[0, 1], atol=1e-9)
