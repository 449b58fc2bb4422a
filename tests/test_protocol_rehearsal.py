"""The full Panacea experiment protocol, rehearsed in one bounded run.

The reference's headline deliverable is the train-on-generated-data table
(metrics/StreamPETR/README.md:56-60): StreamPETR trained real-only /
gen-only / gen-pretrain+real-finetune and compared on the same val split.
``scripts/protocol_rehearsal.py`` runs that protocol at miniature synthetic
scale (tiny generation training -> Gen-nuScenes tree -> three recipe
trainings -> three evals); this test asserts the joint integration holds:
every row finite, the generated tree fully consumed (zero zero-filled
frames on both the train and eval side), and the row-3 finetune actually
initialized from row 2's checkpoint.

~10 min warm (subprocess pipelines reuse .jax_cache); slow tier.
"""

import json
import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.mark.slow
def test_protocol_rehearsal(tmp_path):
    import protocol_rehearsal

    res = protocol_rehearsal.run(
        str(tmp_path), seed=0, gen_steps=6, det_steps=4, eval_samples=4)
    rows = res["rows"]
    assert set(rows) == {"real_only", "gen_only",
                         "gen_pretrain_real_finetune"}
    for name, row in rows.items():
        for k in ("NDS", "mAP", "mATE", "mAOE", "mAVE"):
            assert math.isfinite(row[k]), (name, row)
        assert 0.0 <= row["NDS"] <= 1.0, (name, row)
    # the gen-only recipe consumed the generated tree with no zero-filled
    # frames (asserted inside run(); re-check the committed log here)
    with open(tmp_path / "work_dirs"
              / "streampetr_r50_atss_512x256_window_pseudo_pretrain"
              / "train_log.json") as f:
        tlog = json.load(f)
    assert tlog["gen_frames_loaded"] > 0
    assert tlog["gen_frames_missing"] == 0
    # row-3 finetune initialized from row 2's final (the e2e recipe's
    # load_from, StreamPETRWindow -> streaming StreamPETR strict=False)
    with open(tmp_path / "work_dirs"
              / "streampetr_r50_atss_512x256_withpretrain_real_finetune"
              / "train_log.json") as f:
        flog = json.load(f)
    assert flog["load_from"]["n_loaded"] > 100, flog.get("load_from")
