"""The full Panacea experiment protocol, end-to-end at miniature scale.

The reference's headline deliverable is the train-on-generated-data table
(metrics/StreamPETR/README.md:56-60): a StreamPETR detector trained under
three recipes and compared on real-val NDS/mAP:

  1. real-only        projects/configs/diffusion/streampetr_r50_atss_512x256_nopretrain.py
  2. gen-only         .../streampetr_r50_atss_512x256_pseudo.py  (pseudo pre-train)
  3. gen-pretrain +   .../streampetr_r50_atss_512x256_e2e.py     (pseudo pre-train,
     real-finetune                                                then real finetune)

This script rehearses that protocol in ONE bounded run on synthetic scenes
(CPU, tiny dims), exercising every joint seam the individual smokes cannot:

  stage A  train the tiny generation model           (train.py --tiny --synthetic)
  stage B  generate a Gen-nuScenes tree with it      (inference.py --ckpt engine_final)
  stage C  train the three perception recipes        (train_perception.py, the
           actual recipe configs with tiny/geometry overrides; recipe 3
           load_from's recipe 2's final exactly like the reference's
           e2e config load_from, finetune.py:66/:274)
  stage D  evaluate each on the SAME real-frame val  (eval_perception.py --ckpt)
  stage E  one JSON with the three NDS/mAP rows

Numbers at this scale are plumbing proof (random-ish images, dozens of
steps), not a quality claim — the assertion is that every row is finite and
the rollout->writers->gen-train->load_from->finetune->metrics path holds
together in one pass.

Usage:
  python scripts/protocol_rehearsal.py --workdir /tmp/protocol [--out PROTOCOL.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join("panacea_tpu", "configs", "perception")

# the generation run's tiny geometry (inference.py --tiny: 2-frame clips of
# (16, 32) views) fixes the perception geometry: final_dim must match the
# generated frames, 3 FPN levels fit a 16x32 image, and the gen-train window
# equals the clip length (disjoint-clip offset contract)
GEOM = ["--final_dim", "16", "32", "--num_levels", "3"]
CLIP_LEN = 2


def _run(cmd: list, env=None) -> float:
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return time.time() - t0


def run(workdir: str, seed: int = 0, gen_steps: int = 20,
        det_steps: int = 12, eval_samples: int = 6) -> dict:
    os.makedirs(workdir, exist_ok=True)
    env = dict(os.environ)
    py = sys.executable
    timings: dict = {}

    # ---- stage A: train the generation model (tiny, synthetic scenes) ----
    gen_ckpt = os.path.join(workdir, "gen_ckpt")
    timings["gen_train_s"] = _run([
        py, os.path.join(REPO, "train.py"), "--tiny", "--synthetic",
        "--steps", str(gen_steps), "--bs", "1", "--seed", str(seed),
        "--ckpt_dir", gen_ckpt, "--ckpt_every", "0",
    ], env)

    # ---- stage B: generate the Gen-nuScenes tree with the trained model ----
    timings["generate_s"] = _run([
        py, os.path.join(REPO, "inference.py"), "--synthetic", "--tiny",
        "--num_batches", "4", "--seed", str(seed),
        "--ckpt", os.path.join(gen_ckpt, "engine_final"),
        "--outdir", workdir, "--name", "gen",
    ], env)
    gen_root = os.path.join(workdir, "gen", "val", "gen-nuscenes")
    assert os.path.isdir(gen_root), f"no Gen-nuScenes tree at {gen_root}"
    print(f"generated {len(os.listdir(gen_root))} view-clips", flush=True)

    # ---- stage C: the three perception recipes ----
    work = os.path.join(workdir, "work_dirs")
    base = [py, os.path.join(REPO, "train_perception.py"),
            "--synthetic", "--tiny", "--steps", str(det_steps),
            "--ckpt_every", "0", "--seed", str(seed),
            "--workdir", work] + GEOM

    # row 1: real-only, streaming from scratch (nopretrain.py)
    cfg1 = "streampetr_r50_atss_512x256_nopretrain"
    timings["train_real_only_s"] = _run(
        base + ["--config", os.path.join(CFG, cfg1 + ".yaml")], env)

    # row 2: gen-only window pre-train on the stage-B tree (pseudo_pretrain)
    cfg2 = "streampetr_r50_atss_512x256_window_pseudo_pretrain"
    timings["train_gen_only_s"] = _run(
        base + ["--config", os.path.join(CFG, cfg2 + ".yaml"),
                "--gen_root", gen_root, "--gen_clip_len", str(CLIP_LEN),
                "--queue_length", str(CLIP_LEN)], env)
    with open(os.path.join(work, cfg2, "train_log.json")) as f:
        tlog = json.load(f)
    assert tlog.get("gen_frames_loaded", 0) > 0, tlog
    assert tlog.get("gen_frames_missing", 1) == 0, (
        "gen-train zero-filled missing generated frames — writer/reader "
        f"layout drift: {tlog}")

    # row 3: real finetune FROM row 2's final (the e2e recipe's load_from,
    # StreamPETRWindow -> streaming StreamPETR strict=False handoff)
    cfg3 = "streampetr_r50_atss_512x256_withpretrain_real_finetune"
    timings["train_finetune_s"] = _run(
        base + ["--config", os.path.join(CFG, cfg3 + ".yaml"),
                "--load_from", os.path.join(work, cfg2, "final")], env)
    with open(os.path.join(work, cfg3, "train_log.json")) as f:
        flog = json.load(f)
    assert flog.get("load_from", {}).get("n_loaded", 0) > 0, (
        f"finetune did not initialize from the pretrain checkpoint: {flog}")

    # ---- stage D: evaluate every row on the SAME real-frame val set ----
    rows: dict = {}
    for row, cfg in (("real_only", cfg1), ("gen_only", cfg2),
                     ("gen_pretrain_real_finetune", cfg3)):
        out = os.path.join(workdir, f"row_{row}.json")
        timings[f"eval_{row}_s"] = _run([
            py, os.path.join(REPO, "eval_perception.py"),
            "--synthetic", "--tiny", "--seed", str(seed),
            "--queue_length", str(CLIP_LEN),
            "--num_samples", str(eval_samples),
            "--ckpt", os.path.join(work, cfg, "final"),
            "--out", out] + GEOM, env)
        with open(out) as f:
            m = json.load(f)
        assert math.isfinite(m["NDS"]) and math.isfinite(m["mAP"]), (row, m)
        rows[row] = {k: round(float(m[k]), 4)
                     for k in ("NDS", "mAP", "mATE", "mAOE", "mAVE")
                     if k in m}
        print(f"ROW {row}: NDS={m['NDS']:.4f} mAP={m['mAP']:.4f}", flush=True)

    result = {
        "protocol": "panacea three-recipe perception table "
                    "(metrics/StreamPETR/README.md:56-60), miniature "
                    "synthetic rehearsal — plumbing proof, not quality",
        "scale": {"gen_steps": gen_steps, "det_steps": det_steps,
                  "clip_len": CLIP_LEN, "final_dim": [16, 32],
                  "eval_samples": eval_samples, "seed": seed},
        "rows": rows,
        "timings_s": {k: round(v, 1) for k, v in timings.items()},
    }
    path = os.path.join(workdir, "protocol_rehearsal.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="outputs/protocol_rehearsal")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gen_steps", type=int, default=20)
    ap.add_argument("--det_steps", type=int, default=12)
    ap.add_argument("--eval_samples", type=int, default=6)
    ap.add_argument("--out", default=None,
                    help="also copy the result JSON here (committed artifact)")
    args = ap.parse_args()
    res = run(args.workdir, args.seed, args.gen_steps, args.det_steps,
              args.eval_samples)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
