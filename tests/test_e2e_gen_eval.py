"""Generation -> perception round trip (slow tier).

One command drives `inference.py --synthetic --tiny` into
`eval_perception.py --gen_root` and asserts the Gen-nuScenes layout
contract holds on both sides (reference
metrics/.../nuscenes_dataset.py:222, 316-345) — see scripts/e2e_gen_eval.py.
"""

import math
import sys

import pytest


@pytest.mark.slow
def test_round_trip(tmp_path):
    sys.path.insert(0, "scripts")
    from e2e_gen_eval import run

    metrics = run(str(tmp_path / "rt"))
    assert math.isfinite(metrics["NDS"])
    assert math.isfinite(metrics["mAP"])
    assert metrics["gen_frames_missing"] == 0
    assert metrics["gen_frames_loaded"] > 0
