"""One-command generation -> perception round trip (tiny, CPU).

Runs `inference.py --synthetic --tiny` (writes the Gen-nuScenes layout,
writers.py:59) then `eval_perception.py --synthetic --gen_root <that tree>`
(reads it back through GenNuScenesEvalDataset._load_generated) and asserts:

  1. a metrics JSON materializes with finite NDS/mAP, and
  2. every eval window frame was actually FOUND in the generated tree
     (gen_frames_missing == 0) — i.e. the writer and reader agree on the
     `<CAM>_<stem>/_00000<i>.jpg` contract (reference
     metrics/.../nuscenes_dataset.py:222, 316-345). The reference's silent
     zero-image fallback would otherwise hide a dir-naming drift.

Usage: python scripts/e2e_gen_eval.py [--workdir DIR] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(workdir: str, seed: int = 0, keep: bool = False) -> dict:
    os.makedirs(workdir, exist_ok=True)
    env = dict(os.environ)

    gen_cmd = [
        sys.executable, os.path.join(REPO, "inference.py"),
        "--synthetic", "--tiny", "--num_batches", "4",
        "--outdir", workdir, "--name", "e2e", "--seed", str(seed),
    ]
    print("+", " ".join(gen_cmd), flush=True)
    subprocess.run(gen_cmd, check=True, cwd=REPO, env=env)

    gen_root = os.path.join(workdir, "e2e", "val", "gen-nuscenes")
    assert os.path.isdir(gen_root), f"no Gen-nuScenes tree at {gen_root}"
    clips = sorted(os.listdir(gen_root))
    print(f"generated {len(clips)} view-clips: {clips[:3]}...", flush=True)

    metrics_path = os.path.join(workdir, "e2e_metrics.json")
    # tiny generation geometry: 2-frame clips, (16, 32) views ->
    # matching queue/final_dim and a 2-level FPN
    eval_cmd = [
        sys.executable, os.path.join(REPO, "eval_perception.py"),
        "--synthetic", "--tiny", "--gen_root", gen_root,
        "--gen_clip_len", "2", "--queue_length", "2",
        # (16,32) views -> 3 usable FPN levels (r50 start_level 1 gives 3
        # laterals; FPN emits >= laterals outputs)
        "--final_dim", "16", "32", "--num_levels", "3",
        "--seed", str(seed), "--out", metrics_path,
    ]
    print("+", " ".join(eval_cmd), flush=True)
    subprocess.run(eval_cmd, check=True, cwd=REPO, env=env)

    with open(metrics_path) as f:
        metrics = json.load(f)
    assert math.isfinite(metrics["NDS"]), metrics
    assert math.isfinite(metrics["mAP"]), metrics
    assert metrics.get("gen_frames_loaded", 0) > 0, (
        "eval loaded ZERO generated frames — writer/reader layout drift: "
        f"{metrics}")
    assert metrics.get("gen_frames_missing", 1) == 0, (
        "eval zero-filled missing generated frames — layout drift: "
        f"{metrics}")
    print(f"ROUND TRIP OK: NDS={metrics['NDS']:.4f} mAP={metrics['mAP']:.4f} "
          f"frames={int(metrics['gen_frames_loaded'])}", flush=True)
    return metrics


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="outputs/e2e_gen_eval")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    run(args.workdir, args.seed)
