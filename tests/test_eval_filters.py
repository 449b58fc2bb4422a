"""Camera-visibility eval filters (nuscenes_eval.py portable half)."""

import numpy as np

from panacea_tpu.perception.eval_filters import (
    center_in_image,
    corners_cam,
    exist_corners_in_image_but_not_all,
    filter_boxes_by_overlap,
    filter_boxes_by_visibility,
    visible_camera_count,
)


def _intrinsic(f=100.0, cx=160.0, cy=96.0):
    K = np.eye(4)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = f, cx, f, cy
    return K


def test_center_in_image_levels():
    K = _intrinsic()
    imsize = (320, 192)
    # 10 m straight ahead -> visible
    assert center_in_image([0.0, 0.0, 10.0], K, imsize)
    # behind the camera
    assert not center_in_image([0.0, 0.0, -5.0], K, imsize)
    # closer than the 1 m depth gate
    assert not center_in_image([0.0, 0.0, 0.5], K, imsize)
    # far off to the side (projects out of the canvas)
    assert not center_in_image([100.0, 0.0, 5.0], K, imsize)
    # NONE level always passes
    assert center_in_image([0.0, 0.0, -5.0], K, imsize, vis_level="none")


def test_partial_corner_visibility():
    K = _intrinsic()
    imsize = (320, 192)
    # a large box centered ahead: near corners spill out of frame
    box = np.array([[0.0, 0.0, 0.0, 4.0, 40.0, 2.0, 0.0]])
    # camera looks along +y of lidar: x_cam = -x_l? use a simple frame where
    # cam z = lidar y (forward), cam x = -lidar x? keep identity-ish:
    l2c = np.array([[1, 0, 0, 0], [0, 0, -1, 1.0], [0, 1, 0, 10.0],
                    [0, 0, 0, 1.0]], np.float64)
    cc = corners_cam(box, l2c)[0]
    assert cc.shape == (3, 8)
    # fully-visible small box -> not "partial"
    small = np.array([[0.0, 5.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    cs = corners_cam(small, l2c)[0]
    assert not exist_corners_in_image_but_not_all(cs, K, imsize)


def test_visibility_token_filter():
    mask = filter_boxes_by_visibility(
        np.zeros((3, 7)), ["1", "4", "1"], visibility="1")
    np.testing.assert_array_equal(mask, [True, False, True])


def test_overlap_filter_counts_cameras():
    K = _intrinsic()
    imsize = (320, 192)
    # two cameras looking forward (+x lidar), slightly rotated apart
    def cam(yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        r_l2c = np.array([[-s, c, 0], [0, 0, -1], [c, s, 0]], np.float64)
        m = np.eye(4)
        m[:3, :3] = r_l2c
        return m

    extr = np.stack([cam(0.0), cam(np.pi / 2)])
    intr = np.stack([K, K])
    # box straight ahead of cam0 only; box at 45 deg seen by both
    boxes = np.array([[20.0, 0.0, 0.0, 2, 2, 2, 0],
                      [14.0, 14.0, 0.0, 2, 2, 2, 0]], np.float64)
    counts = visible_camera_count(boxes, extr, intr, imsize)
    assert counts[0] == 1 and counts[1] == 2
    keep = filter_boxes_by_overlap(boxes, extr, intr, imsize)
    np.testing.assert_array_equal(keep, [False, True])
    assert filter_boxes_by_overlap(np.zeros((0, 7)), extr, intr,
                                   imsize).shape == (0,)
