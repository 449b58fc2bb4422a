"""bf16 numerical-drift tripwire on the real chip (docs/RUNBOOK.md §8).

The paper metrics (FID/FVD) that would catch a numerically-broken kernel are
not measurable in-env; this standing guard bounds bf16-vs-fp32 divergence of
the production denoiser instead, so future kernel changes have a regression
number to respect.

Two fixed-seed short sampler runs at production VIEW geometry (256x3072
panorama, 32x384 latent) with the frame count reduced to --frames 1: full
fp32 at t=2 was MEASURED to exceed one v5e's 16 GB HBM (ResourceExhausted,
2026-08-20 — fp32 params are 5.3 GB and the 256x3072 conv/hint activations
double vs bf16), and per-eval drift is a per-token property — the t=1 shape
exercises the identical kernels (intra/cross-view flash attention at the
production S, convs, GEGLU) at fp32-feasible memory. Temporal attention
degenerates at t=1; its bf16-vs-fp32 agreement is covered by the tiny-shape
CPU smoke (--tiny --cpu legs compare bit-exact fp32-vs-fp32 plumbing) and
the slow-tier gradient/parity tests.

  eval     one process per dtype (the axon tunnel is single-client — run
           them SEQUENTIALLY): build the production engine (PANACEA_FP32=1
           forces fp32 compute on TPU), run a --num_steps Euler-EDM sampler
           from NumPy noise with return_trajectory, save the per-step
           latents.
  compare  per-step max|Δ|/rms table + one JSON line for the artifact;
           nonzero exit past --budget.

Usage (on the TPU host):
  python scripts/bf16_drift.py eval --dtype bf16 --out /tmp/drift_bf16.npz
  python scripts/bf16_drift.py eval --dtype fp32 --out /tmp/drift_fp32.npz
  python scripts/bf16_drift.py compare /tmp/drift_bf16.npz /tmp/drift_fp32.npz \
      --out docs/bf16_drift.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_eval(args) -> None:
    if args.dtype == "fp32":
        os.environ["PANACEA_FP32"] = "1"
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    import __graft_entry__ as ge

    t = args.frames
    cfg, eng = ge._engine(tiny=args.tiny, num_frames=t)
    if args.tiny:
        ih, iw, lh, lw = 16, 192, 2, 24
    else:
        ih, iw, lh, lw = 256, 3072, 32, 384

    t0 = time.time()
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw),
                    image_hw=(ih, iw))
    print(f"[drift] init {time.time()-t0:.1f}s dtype={eng.dtype}",
          file=sys.stderr)

    # the UNet out_conv and the ControlNet zero-convs init to EXACT zero
    # (reference zero_module parity) — with them zero the denoiser output is
    # c_skip*x and the drift guard would measure nothing. Deterministically
    # perturb every all-zero tensor (path-keyed, identical in the bf16 and
    # fp32 processes) so the whole UNet+ControlNet contributes.
    import zlib

    import jax.numpy as _jnp

    def bump(p, path=""):
        if isinstance(p, dict):
            return {k: bump(v, f"{path}/{k}") for k, v in p.items()}
        if hasattr(p, "shape") and p.size and not np.any(np.asarray(p)):
            rs_p = np.random.RandomState(zlib.crc32(path.encode()) % 2**31)
            return _jnp.asarray(
                0.02 * rs_p.standard_normal(p.shape), p.dtype)
        return p

    eng.params["model"] = bump(eng.params["model"])

    rs = np.random.RandomState(args.seed)
    batch = {
        "jpg": rs.uniform(-1, 1, (1, t, ih, iw, 3)).astype(np.float32),
        "cond_img": rs.uniform(0, 1, (1, t, ih, iw, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((1, t, ih, iw, 3), np.float32),
        "txt": ["a driving scene, sunny day"],
    }
    c, uc = eng.conditioner.get_unconditional_conditioning(
        batch, batch_uc=dict(batch, txt=[""]))
    noise = rs.standard_normal((t, lh, lw, 4)).astype(np.float32)

    t0 = time.time()
    final, traj = eng.sample(c, uc=uc, batch_size=t, shape=(lh, lw, 4),
                             rng=jax.random.PRNGKey(args.seed),
                             num_steps=args.num_steps,
                             noise=jnp.asarray(noise),
                             return_trajectory=True)
    traj = np.asarray(traj, np.float32)
    print(f"[drift] {args.num_steps}-step sampler {time.time()-t0:.1f}s "
          f"(incl. compile)", file=sys.stderr)
    np.savez_compressed(args.out, traj=traj,
                        final=np.asarray(final, np.float32),
                        dtype=np.array(args.dtype),
                        frames=np.array(t), steps=np.array(args.num_steps),
                        seed=np.array(args.seed))
    print(f"[drift] wrote {args.out}")


def run_compare(args) -> None:
    a, b = np.load(args.bf16), np.load(args.fp32)
    ta, tb = a["traj"], b["traj"]
    assert ta.shape == tb.shape, (ta.shape, tb.shape)
    rows = []
    print(f"{'step':>4s} {'max|d|':>10s} {'rms(d)':>10s} {'rms(x)':>10s} "
          f"{'rel':>8s}")
    for i, (xa, xb) in enumerate(zip(ta, tb)):
        d = xa - xb
        md = float(np.abs(d).max())
        rd = float(np.sqrt((d**2).mean()))
        rx = float(np.sqrt((xb**2).mean()))
        rows.append({"step": i, "max_abs": md, "rms": rd,
                     "rel": rd / max(rx, 1e-12)})
        print(f"{i:4d} {md:10.4e} {rd:10.4e} {rx:10.4e} "
              f"{rd/max(rx,1e-12):8.2e}")
    out = {
        "what": "bf16 vs fp32 per-step latent drift, production view "
                "geometry (256x3072 panorama), Euler-EDM",
        "frames": int(a["frames"]), "steps": int(a["steps"]),
        "seed": int(a["seed"]),
        "final_max_abs": rows[-1]["max_abs"],
        "final_rel_rms": rows[-1]["rel"],
        "per_step": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[drift] wrote {args.out}")
    print(json.dumps({k: out[k] for k in
                      ("frames", "steps", "final_max_abs", "final_rel_rms")}))
    if rows[-1]["rel"] > args.budget:
        print(f"FAIL: final-step rel rms {rows[-1]['rel']:.3e} > "
              f"budget {args.budget}")
        sys.exit(1)
    print("OK")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    e = sub.add_parser("eval")
    e.add_argument("--dtype", choices=["bf16", "fp32"], required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--frames", type=int, default=1,
                   help="clip length (1 keeps fp32 inside one v5e's HBM — "
                   "t=2 fp32 measured OOM; view geometry stays full "
                   "production)")
    e.add_argument("--num_steps", type=int, default=3)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--tiny", action="store_true")
    e.add_argument("--cpu", action="store_true")
    c = sub.add_parser("compare")
    c.add_argument("bf16")
    c.add_argument("fp32")
    c.add_argument("--out", default=None, help="write the JSON artifact here")
    c.add_argument("--budget", type=float, default=0.10,
                   help="final-step rms(Δ)/rms(x) ceiling (bf16 has ~3 "
                   "decimal digits; 25-step compounding stays well under "
                   "10%% when kernels are healthy)")
    args = ap.parse_args()
    if args.mode == "eval":
        run_eval(args)
    else:
        run_compare(args)


if __name__ == "__main__":
    main()
