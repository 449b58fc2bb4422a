"""Map extractor: synthetic map JSON -> ego-frame vectors."""

import numpy as np

from panacea_tpu.data.nuscenes.map_extractor import (
    NuscMapData,
    _clip_polyline_to_roi,
    extract_map_vectors,
)


def make_map():
    """Two adjacent road polygons, one divider line, one ped crossing."""
    nodes = {}
    def node(tok, x, y):
        nodes[tok] = {"token": tok, "x": x, "y": y}
    # divider line along x at y=100
    for i, x in enumerate(range(80, 130, 10)):
        node(f"d{i}", float(x), 100.0)
    # road polygon A and B sharing an edge
    for tok, (x, y) in {
        "a0": (80, 90), "a1": (110, 90), "a2": (110, 100), "a3": (80, 100),
        "b0": (110, 90), "b1": (130, 90), "b2": (130, 100), "b3": (110, 100),
        "p0": (95, 92), "p1": (100, 92), "p2": (100, 98), "p3": (95, 98),
    }.items():
        node(tok, float(x), float(y))
    data = {
        "node": list(nodes.values()),
        "line": [{"token": "L1", "node_tokens": [f"d{i}" for i in range(5)]}],
        "polygon": [
            {"token": "PA", "exterior_node_tokens": ["a0", "a1", "a2", "a3"]},
            {"token": "PB", "exterior_node_tokens": ["b0", "b1", "b2", "b3"]},
            {"token": "PC", "exterior_node_tokens": ["p0", "p1", "p2", "p3"]},
        ],
        "lane_divider": [{"token": "ld", "line_token": "L1"}],
        "road_divider": [],
        "ped_crossing": [{"token": "pc", "polygon_token": "PC"}],
        "road_segment": [
            {"token": "ra", "polygon_token": "PA"},
            {"token": "rb", "polygon_token": "PB"},
        ],
        "lane": [],
    }
    return NuscMapData(data)


def test_clip_polyline():
    line = np.array([[-50.0, 0.0], [50.0, 0.0]])
    segs = _clip_polyline_to_roi(line)
    assert len(segs) == 1
    np.testing.assert_allclose(segs[0][0], [-30, 0])
    np.testing.assert_allclose(segs[0][-1], [30, 0])


def test_extract_vectors_ego_frame():
    m = make_map()
    # ego at (100, 95) facing +x (identity rotation)
    vec = extract_map_vectors(m, [100.0, 95.0, 0.0], [1.0, 0, 0, 0])
    assert len(vec[1]) >= 1  # divider present
    div = vec[1][0]
    np.testing.assert_allclose(div[:, 1], 5.0, atol=1e-6)  # y=100 -> ego y=5
    assert len(vec[0]) >= 1  # ped crossing
    assert len(vec[2]) >= 1  # boundary contours from the union
    # the union boundary should be ONE merged outline (A+B share an edge), so
    # its x extent spans both polygons
    ring = max(vec[2], key=len)
    assert ring[:, 0].max() - ring[:, 0].min() > 40
