"""Data pipeline tests: calib math, box corners/projection, rasterization, and
a full synthetic clip through NuScenesVideoDataset."""

import numpy as np
import pytest

from panacea_tpu.data.nuscenes.calib import (
    build_lidar2img,
    invert_pose,
    pose_to_matrix,
    quat_to_rotmat,
)
from panacea_tpu.data.nuscenes.dataset import (
    NuScenesVideoDataset,
    PANORAMA_VIEWS,
    collate,
)
from panacea_tpu.data.nuscenes.geometry import (
    box3d_corners,
    post_process_coords,
    project_boxes_to_views,
    resample_polyline,
)
from panacea_tpu.data.nuscenes.synthetic import (
    make_synthetic_infos,
    synthetic_image_loader,
)


def test_quat_to_rotmat_identity_and_yaw():
    np.testing.assert_allclose(quat_to_rotmat([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    yaw = 0.7
    q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
    r = quat_to_rotmat(q)
    expected = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    )
    np.testing.assert_allclose(r, expected, atol=1e-12)


def test_invert_pose():
    r = quat_to_rotmat([np.cos(0.3), 0, 0, np.sin(0.3)])
    m = pose_to_matrix(r, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(invert_pose(m) @ m, np.eye(4), atol=1e-12)


def test_lidar2img_projects_forward_point():
    """A point straight ahead of a forward camera lands at the image center."""
    from panacea_tpu.data.nuscenes.synthetic import _cam_quat

    intr = np.array([[800.0, 0, 800.0], [0, 800.0, 450.0], [0, 0, 1]])
    l2i, _, _ = build_lidar2img(_cam_quat(0.0), [1.5, 0.0, 1.6], intr)
    p = np.array([11.5, 0.0, 1.6, 1.0])  # 10 m ahead of the camera
    uv = l2i @ p
    assert uv[2] == pytest.approx(10.0)
    assert uv[0] / uv[2] == pytest.approx(800.0)
    assert uv[1] / uv[2] == pytest.approx(450.0)


def test_box_corners_axis_aligned():
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, 0.0]])
    c = box3d_corners(boxes)
    assert c.shape == (1, 8, 3)
    # bottom-center origin: z spans [0, 1]
    assert c[0, :, 2].min() == pytest.approx(0.0)
    assert c[0, :, 2].max() == pytest.approx(1.0)
    # x spans +-2, y spans +-1
    assert c[0, :, 0].min() == pytest.approx(-2.0)
    assert c[0, :, 0].max() == pytest.approx(2.0)
    # first four corners on the -x face (mmdet3d order)
    np.testing.assert_allclose(c[0, :4, 0], -2.0)
    np.testing.assert_allclose(c[0, 4:, 0], 2.0)


def test_resample_polyline_uniform():
    line = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    pts = resample_polyline(line, 5)
    assert pts.shape == (5, 2)
    np.testing.assert_allclose(pts[0], [0, 0])
    np.testing.assert_allclose(pts[-1], [1, 1])
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    np.testing.assert_allclose(seg, seg[0], atol=1e-9)


def test_post_process_coords_clipping():
    # box partially outside the canvas clips to the boundary
    corners = np.array([[-10, -10], [50, -10], [50, 50], [-10, 50]])
    out = post_process_coords(corners, imsize=(100, 100))
    assert out == (0.0, 0.0, 50.0, 50.0)
    # fully outside -> None
    corners = corners - 200
    assert post_process_coords(corners, imsize=(100, 100)) is None


def test_project_boxes_produces_views():
    infos = make_synthetic_infos(num_frames=1, num_boxes=6, seed=1)
    ds = NuScenesVideoDataset(
        infos=infos, queue_length=1, image_loader=synthetic_image_loader
    )
    fr = ds._frame_tensors(infos[0])
    corners = box3d_corners(fr["boxes"])
    annos = project_boxes_to_views(corners, fr["labels"], fr["lidar2img"],
                                   (256, 512))
    total = sum(len(b) for b in annos["bbox2d"])
    assert total > 0  # some box visible in some view
    for bb in annos["bbox2d"]:
        if len(bb):
            bb = np.asarray(bb)
            assert (bb[:, 0] <= bb[:, 2]).all() and (bb[:, 1] <= bb[:, 3]).all()
            assert bb.min() >= 0 and bb[:, 2].max() <= 512 and bb[:, 3].max() <= 256


def test_full_synthetic_clip():
    T = 4
    infos = make_synthetic_infos(num_frames=T, num_boxes=5, seed=0)
    ds = NuScenesVideoDataset(
        infos=infos, queue_length=T, image_loader=synthetic_image_loader, seed=0
    )
    item = ds[T - 1]
    H, W = 256, 512 * 6
    assert item["jpg"].shape == (T, H, W, 3)
    assert item["cond_img"].shape == (T, H, W, 19)
    assert item["final_cond_zero"].shape == (T, H, W, 3)
    assert item["jpg"].min() >= -1.0 and item["jpg"].max() <= 1.0
    assert item["cond_img"].min() >= 0.0 and item["cond_img"].max() <= 1.0
    # conditioning frame: last frame equals jpg's last, others zero
    np.testing.assert_allclose(item["final_cond_zero"][-1], item["jpg"][-1])
    assert np.abs(item["final_cond_zero"][:-1]).max() == 0.0
    # prompt mentions the object count
    assert "targets" in item["txt"] or "objects" in item["txt"] or \
        "subjects" in item["txt"] or "objectives" in item["txt"] or \
        "landmarks" in item["txt"] or "features" in item["txt"] or \
        "goals" in item["txt"] or "subject matters" in item["txt"]
    # condition channels carry structure (not all white)
    cond = item["cond_img"]
    assert cond[..., :3].min() < 0.99      # corners drawn
    assert cond[..., 13:16].min() < 0.99   # map lines drawn
    assert cond[..., 16:19].std() > 0.01   # pose rays vary
    # filenames in panorama order
    assert len(item["filenames"]) == T and len(item["filenames"][0]) == 6
    assert "CAM_BACK_RIGHT" in item["filenames"][0][2]
    assert "CAM_FRONT_LEFT" in item["filenames"][0][5]


def test_collate_batches():
    infos = make_synthetic_infos(num_frames=2, num_boxes=3)
    ds = NuScenesVideoDataset(
        infos=infos, queue_length=2, image_loader=synthetic_image_loader
    )
    batch = collate([ds[1], ds[1]])
    assert batch["jpg"].shape[0] == 2
    assert len(batch["txt"]) == 2


def test_queue_rejects_scene_change():
    a = make_synthetic_infos(num_frames=2, scene_token="s1")
    b = make_synthetic_infos(num_frames=2, scene_token="s2")
    for i, info in enumerate(b):
        info["timestamp"] = 1_000_000 * (10 + i)
        info["token"] = f"s2-{i}"
    ds = NuScenesVideoDataset(
        infos=a + b, queue_length=2, image_loader=synthetic_image_loader, seed=3
    )
    # index 2 is the first frame of scene 2 -> straddles the boundary
    assert ds._frame_indices(2) is None
    assert ds._frame_indices(1) is not None
    assert ds._frame_indices(3) is not None


def test_resize_crop_projection_consistency():
    """Projecting through the ida-updated matrix must equal projecting through
    the original then applying resize+crop in pixel space."""
    from panacea_tpu.data.nuscenes.calib import (
        standard_ida_resize_crop,
        update_intrinsics_resize_crop,
    )
    from panacea_tpu.data.nuscenes.synthetic import _cam_quat

    intr = np.array([[800.0, 0, 800], [0, 800, 450], [0, 0, 1]])
    l2i, viewpad, _ = build_lidar2img(_cam_quat(0.0), [1.5, 0.0, 1.6], intr)
    resize, crop = standard_ida_resize_crop((900, 1600), 0.32, (256, 512))
    l2i_new, _ = update_intrinsics_resize_crop(l2i, viewpad, resize, crop)

    pts = np.array([[12.0, 1.0, 1.0], [20.0, -3.0, 0.5]])
    p4 = np.concatenate([pts, np.ones((2, 1))], axis=1)
    uvd_old = (l2i @ p4.T).T
    uv_old = uvd_old[:, :2] / uvd_old[:, 2:3]
    uvd_new = (l2i_new @ p4.T).T
    uv_new = uvd_new[:, :2] / uvd_new[:, 2:3]
    expected = uv_old * resize - np.array([crop[0], crop[1]])
    np.testing.assert_allclose(uv_new, expected, atol=1e-9)
    # depth unchanged by the 2D transform
    np.testing.assert_allclose(uvd_new[:, 2], uvd_old[:, 2], atol=1e-9)
