"""Native rasterizer vs NumPy reference."""

import numpy as np
import pytest

from panacea_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no C++ toolchain")
    return l


def test_fill_depth_boxes_matches_numpy(lib):
    rs = np.random.RandomState(0)
    h, w, c = 32, 48, 10
    boxes = np.stack([
        rs.uniform(0, w - 5, 7), rs.uniform(0, h - 5, 7),
        rs.uniform(5, w, 7), rs.uniform(5, h, 7),
    ], axis=1).astype(np.float32)
    boxes[:, 2] = np.maximum(boxes[:, 0] + 1, boxes[:, 2])
    boxes[:, 3] = np.maximum(boxes[:, 1] + 1, boxes[:, 3])
    labels = rs.randint(0, c, 7)
    depths = rs.uniform(0, 60, 7).astype(np.float32)

    ref = np.full((h, w, c), 255, dtype=np.uint8)
    for j in range(7):
        x0, y0, x1, y1 = boxes[j]
        d = depths[j] * 3
        i = labels[j]
        region = ref[int(y0):int(y1), int(x0):int(x1), i]
        ref[int(y0):int(y1), int(x0):int(x1), i] = np.where(
            region > d, np.uint8(np.clip(d, 0, 255)), region
        )

    out = np.full((h, w, c), 255, dtype=np.uint8)
    assert native.fill_depth_boxes(out, boxes, labels, depths)
    np.testing.assert_array_equal(out, ref)


def test_draw_polyline_basic(lib):
    img = np.full((20, 40, 3), 255, dtype=np.uint8)
    pts = np.array([[5, 10], [35, 10]], dtype=np.int32)
    assert native.draw_polyline(img, pts, (0, 0, 255), 1)
    # horizontal line drawn
    assert (img[10, 5:36] == [0, 0, 255]).all()
    assert (img[0] == 255).all()


def test_fill_convex_poly(lib):
    img = np.zeros((20, 20, 3), dtype=np.uint8)
    pts = np.array([[2, 2], [17, 2], [17, 17], [2, 17]], dtype=np.int32)
    assert native.fill_convex_poly(img, pts, (9, 8, 7))
    assert (img[10, 10] == [9, 8, 7]).all()
    assert (img[0, 0] == 0).all()
    assert (img[19, 19] == 0).all()


def test_draw_bboxes_uses_native_consistently():
    """draw_bboxes output identical whether native is available or not."""
    from panacea_tpu.data.nuscenes import draw

    rs = np.random.RandomState(1)
    boxes = np.array([[3.0, 4.0, 30.0, 25.0], [10.0, 2.0, 50.0, 30.0]])
    labels = np.array([1, 3])
    depths = np.array([12.0, 40.0])
    out_native = draw.draw_bboxes((32, 64), boxes, labels, depths)

    # force the numpy path
    import panacea_tpu.native as nat

    saved = nat.fill_depth_boxes
    nat.fill_depth_boxes = lambda *a, **k: False
    try:
        out_np = draw.draw_bboxes((32, 64), boxes, labels, depths)
    finally:
        nat.fill_depth_boxes = saved
    np.testing.assert_array_equal(out_native, out_np)
