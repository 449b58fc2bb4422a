"""Fixed-seed latent-trajectory dump + comparison vs the reference.

The strongest off-env validation of the checkpoint conversion + model math
(docs/RUNBOOK.md §3): run OUR sampler and the reference's torch sampler from
the SAME gaussian noise on the SAME conditioning with converted weights,
and diff the latent after every sampler step.

Modes:

  dump     build the engine, (optionally) load a checkpoint, run the
           production EulerEDM sampler with ``return_trajectory=True`` and
           NumPy-generated noise (np.random.RandomState(seed) — framework-
           independent, reusable bit-exactly on the torch side), and write
           one npz: noise, conditioning inputs (jpg/cond_img/txt), per-step
           latents, final sample.

  compare  load two dumps (ours + the reference-side dump produced with the
           RUNBOOK's torch snippet hooked into sgm sampling.py's euler loop)
           and print per-step max|delta| / rms; nonzero exit when the final
           step exceeds --atol.

Usage:
  python scripts/compare_latents.py dump --tiny --synthetic --out ours.npz \
      [--ckpt ckpts/train/engine_final] [--num_steps 25] [--seed 0]
  python scripts/compare_latents.py compare ours.npz theirs.npz --atol 0.05
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dump(args) -> None:
    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from panacea_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import __graft_entry__ as ge

    _, eng = ge._engine(tiny=args.tiny)

    t = eng.num_frames
    if args.tiny:
        ih, iw = 16, 192
        lh, lw = 2, 24
    else:
        ih, iw = 256, 3072
        lh, lw = 32, 384
    if not eng.params:
        eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw),
                        image_hw=(ih, iw))
    if args.ckpt:
        # same branch as inference.py:216-224: a torch .ckpt/.safetensors is
        # converted on the fly; anything else is an orbax engine tree
        if args.ckpt.endswith((".ckpt", ".safetensors")):
            from panacea_tpu.utils.convert import convert_panacea_checkpoint

            convert_panacea_checkpoint(args.ckpt, eng)
        else:
            from panacea_tpu.utils.checkpoint import load_engine_checkpoint

            load_engine_checkpoint(args.ckpt, eng)

    # deterministic synthetic conditioning batch — the dump carries the raw
    # inputs so the torch side reproduces the same conditioning through the
    # reference conditioner
    rs = np.random.RandomState(args.seed)
    batch = {
        "jpg": rs.uniform(-1, 1, (1, t, ih, iw, 3)).astype(np.float32),
        "cond_img": rs.uniform(0, 1, (1, t, ih, iw, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((1, t, ih, iw, 3), np.float32),
        "txt": [args.prompt],
    }
    c, uc = eng.conditioner.get_unconditional_conditioning(
        batch, batch_uc=dict(batch, txt=[""]))

    # framework-independent noise: the torch side loads this array verbatim
    noise = rs.standard_normal((t, lh, lw, 4)).astype(np.float32)

    import jax.numpy as jnp

    out = eng.sample(c, uc=uc, batch_size=t, shape=(lh, lw, 4),
                     rng=jax.random.PRNGKey(args.seed),
                     num_steps=args.num_steps,
                     noise=jnp.asarray(noise), return_trajectory=True)
    final, traj = out
    traj = np.asarray(traj, np.float32)        # (n_steps, t, lh, lw, 4)
    final = np.asarray(final, np.float32)

    # conditioner outputs too, so the torch side can triage conditioning
    # parity (its conditioner on the same raw inputs) separately from
    # sampler parity — RUNBOOK §2: a step-0 latent mismatch with matching
    # cond_* arrays means noise wiring, with mismatching ones conditioning
    cond_arrs = {f"cond_{k}": np.asarray(v, np.float32)
                 for k, v in c.items()}
    cond_arrs.update({f"uc_{k}": np.asarray(v, np.float32)
                      for k, v in uc.items()})
    np.savez_compressed(
        args.out, traj=traj, final=final, noise=noise,
        jpg=batch["jpg"], cond_img=batch["cond_img"],
        txt=np.array([args.prompt]), num_steps=np.array(args.num_steps),
        seed=np.array(args.seed), **cond_arrs)
    print(f"dumped {traj.shape[0]} per-step latents "
          f"{tuple(traj.shape[1:])} + cond tensors "
          f"{sorted(cond_arrs)} -> {args.out}")


def compare(args) -> None:
    a = np.load(args.ours)
    b = np.load(args.theirs)
    ta, tb = a["traj"], b["traj"]
    # torch layout (n, t, 4, h, w) -> channels-last
    if tb.shape != ta.shape and tb.ndim == 5 and tb.shape[2] == ta.shape[-1]:
        tb = tb.transpose(0, 1, 3, 4, 2)
    assert ta.shape == tb.shape, (ta.shape, tb.shape)
    print(f"{'step':>4s} {'max|d|':>10s} {'rms(d)':>10s} {'rms(x)':>10s}")
    worst = 0.0
    for i, (xa, xb) in enumerate(zip(ta, tb)):
        d = xa - xb
        md = float(np.abs(d).max())
        rd = float(np.sqrt((d**2).mean()))
        rx = float(np.sqrt((xb**2).mean()))
        worst = max(worst, md)
        print(f"{i:4d} {md:10.4e} {rd:10.4e} {rx:10.4e}")
    final = float(np.abs(ta[-1] - tb[-1]).max())
    print(f"final-step max|delta| = {final:.4e} (budget {args.atol})")
    if final > args.atol:
        print("FAIL: trajectories diverged beyond tolerance")
        sys.exit(1)
    print("OK")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--out", required=True)
    d.add_argument("--ckpt", default=None,
                   help="engine checkpoint (train.py engine_final or a "
                   "converted reference ckpt loaded via inference.py "
                   "--ckpt machinery)")
    d.add_argument("--tiny", action="store_true")
    d.add_argument("--synthetic", action="store_true")  # doc-compat; always
    d.add_argument("--num_steps", type=int, default=25)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--prompt", default="a driving scene. daytime. sunny.")
    c = sub.add_parser("compare")
    c.add_argument("ours")
    c.add_argument("theirs")
    c.add_argument("--atol", type=float, default=0.05,
                   help="final-step max|delta| budget (bf16 vs fp32 torch "
                   "at 25 steps; tighten to 1e-3 for fp32-vs-fp32)")
    args = ap.parse_args()
    if args.mode == "dump":
        dump(args)
    else:
        compare(args)


if __name__ == "__main__":
    main()
