"""Panacea-TPU inference driver.

TPU-native replacement for the reference's torch.distributed.launch driver
(inference.py:230-318): same CLI surface (--base/--ckpt/--split/--name/--bs/
--use_last_frame + dotlist overrides), but instead of 8 DDP processes, ONE
process drives all local TPU chips — clips are sharded over the 'dp' mesh
axis and the sampler runs as a single jitted program per device group.

Examples:
  python inference.py --base panacea_tpu/configs/inference_nuscenes.yaml \
      --ckpt ckpts/panaceaplus_40k_deepspeed.ckpt --split val --name panacea
  python inference.py --synthetic --tiny --num_batches 1   # smoke run, no data
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*",
                   default=["panacea_tpu/configs/inference_nuscenes.yaml"])
    p.add_argument("--ckpt", "--ckptpath", dest="ckpt", default=None)
    p.add_argument("--split", default="val", choices=["train", "val"])
    p.add_argument("--name", default="panacea_tpu")
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--use_last_frame", action="store_true", default=True)
    p.add_argument("--use_first_frame", dest="use_last_frame",
                   action="store_false")
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--ann_file", default=None)
    p.add_argument("--data_root", default="data/nuscenes/")
    p.add_argument("--num_batches", type=int, default=-1)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated synthetic scenes (no dataset needed)")
    p.add_argument("--tiny", action="store_true",
                   help="use the tiny config (smoke testing)")
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--prefer_ema", action="store_true",
                   help="load model_ema.* shadow weights instead of raw")
    p.add_argument("--rollout", type=int, default=0,
                   help="autoregressive long-video mode: generate N "
                        "overlapping windows per clip (the reference's "
                        "last-frame-conditioning pipeline, README.md:85-88) "
                        "and write a stitched long video per sample. NOTE: "
                        "any N >= 1 (including 1) uses the rollout gif/jpg "
                        "output layout, not the standard log_images grids; "
                        "use --rollout 0 (default) for grids")
    p.add_argument("--view_shard", type=int, default=0,
                   help="shard ONE clip over the local devices: panorama "
                        "width over a 'view' mesh axis of this size (must "
                        "divide 6; ring cross-view attention) x frames over "
                        "'t' (n_devices/view). 0 (default) = replicated "
                        "model, clips data-parallel over processes")
    p.add_argument("--dry_convert", nargs="?", default=None,
                   const="tests/fixtures/panaceaplus_keys.json",
                   help="checkpoint-readiness drill: given a state-dict KEY "
                        "list (json {key: shape}, default the panaceaplus "
                        "list from scripts/dump_reference_keys.py) or a real "
                        ".ckpt, report converter name coverage (0 unmapped / "
                        "0 missing required) and exit")
    return p


def dry_convert(engine, key_source: str) -> int:
    """Whole-checkpoint name-coverage proof (no weights needed): every key
    in the panaceaplus state dict must be consumed by the converter mapping
    and land on an existing flax param with the transformed shape. Returns
    a process exit code."""
    import json

    import jax
    import jax.numpy as jnp

    from panacea_tpu.utils.convert import check_conversion_coverage

    if key_source.endswith((".ckpt", ".pth", ".safetensors")):
        from panacea_tpu.utils.convert import load_torch_checkpoint

        sd = load_torch_checkpoint(key_source)
        key_shapes = {k: list(v.shape) for k, v in sd.items()}
    else:
        with open(key_source) as f:
            key_shapes = json.load(f)

    # flax target shapes via eval_shape (abstract: no production-size arrays)
    import flax

    t = engine.num_frames
    lh, lw = 8, 96  # conv/attn param shapes are spatial-size independent
    # (but H must survive the 3 stride-2 downsamples, so >= 8)
    x0 = jnp.zeros((t, lh, lw, 8), jnp.float32)
    hint0 = jnp.zeros((t, 8 * lh, 8 * lw, 19), jnp.float32)
    ctx0 = jnp.zeros((1, 77, 1024), jnp.float32)
    model_shapes = jax.eval_shape(
        lambda k: engine.model.init(
            k, x0, jnp.zeros((t,), jnp.int32), ctx0, hint=hint0)["params"],
        jax.random.PRNGKey(0))
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    fs_shapes = jax.eval_shape(
        lambda k: engine.first_stage_model.init(k, img0)["params"],
        jax.random.PRNGKey(0))
    tree = {"model": model_shapes, "first_stage": fs_shapes}
    for emb in engine.conditioner.embedders:
        if hasattr(emb, "model") and hasattr(emb, "tokenizer"):
            tree["clip"] = jax.eval_shape(
                lambda k: emb.model.init(
                    k, jnp.zeros((1, 77), jnp.int32))["params"],
                jax.random.PRNGKey(0))
            break
    flax_shapes = {
        path: tuple(leaf.shape)
        for path, leaf in flax.traverse_util.flatten_dict(tree).items()
    }

    rep = check_conversion_coverage(key_shapes, engine, flax_shapes)
    ok = (not rep["unmapped"] and not rep["missing"]
          and not rep["shape_mismatch"])
    print(json.dumps({
        "total_keys": rep["total_keys"],
        "checked": rep["checked"],
        "unmapped": len(rep["unmapped"]),
        "missing": len(rep["missing"]),
        "shape_mismatch": len(rep["shape_mismatch"]),
        "ok": ok,
    }))
    for name in ("unmapped", "missing", "shape_mismatch"):
        for item in rep[name][:20]:
            print(f"  {name}: {item}")
    return 0 if ok else 1


def main():
    args, unknown = get_parser().parse_known_args()

    import jax
    from panacea_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()  # multi-host pods (no-op otherwise)

    from panacea_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()  # repeat compiles hit .jax_cache/

    import numpy as np

    from panacea_tpu.config import load_configs_with_overrides
    from panacea_tpu.data.nuscenes.dataset import NuScenesVideoDataset, collate
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.profiling import Timer
    from panacea_tpu.writers import log_outputs

    if args.tiny:
        # tiny_cpu.yaml is the CPU smoke config — never send it through the
        # single-client axon TPU tunnel (slow remote compile, wedges on kill)
        args.base = ["panacea_tpu/configs/tiny_cpu.yaml"]
        jax.config.update("jax_platforms", "cpu")
    if args.dry_convert:
        jax.config.update("jax_platforms", "cpu")
        cfg = load_configs_with_overrides(args.base, unknown)
        engine = instantiate_from_config(cfg["model"])
        raise SystemExit(dry_convert(engine, args.dry_convert))
    if not args.synthetic:
        # real inference with hash-fallback token ids would silently generate
        # garbage (VERDICT r1); refuse unless the BPE merge table is present
        from panacea_tpu.data.tokenizer import has_real_vocab

        if not has_real_vocab():
            raise SystemExit(
                "CLIP BPE merge table not found: real text conditioning is "
                "impossible (the tokenizer would fall back to hash ids). "
                "Set PANACEA_CLIP_BPE=/path/to/bpe_simple_vocab_16e6.txt.gz "
                "or run with --synthetic for a smoke test."
            )
    cfg = load_configs_with_overrides(args.base, unknown)
    engine = instantiate_from_config(cfg["model"])
    t = engine.num_frames

    if args.tiny:
        final_dim, lat_hw = (16, 192 // 6), (2, 24)
    else:
        final_dim, lat_hw = (256, 512), (32, 384)

    if args.synthetic:
        from panacea_tpu.data.nuscenes.synthetic import (
            make_synthetic_infos,
            synthetic_image_loader,
        )

        infos = make_synthetic_infos(num_frames=max(t, 2) * 4, seed=args.seed)
        dataset = NuScenesVideoDataset(
            infos=infos, queue_length=t, final_dim=final_dim,
            use_last_frame=args.use_last_frame,
            image_loader=synthetic_image_loader, seed=args.seed,
        )
    else:
        ann = args.ann_file or os.path.join(
            args.data_root,
            f"nuscenes2d_ego_temporal_infos_{args.split}.pkl",
        )
        dataset = NuScenesVideoDataset(
            ann_file=ann, data_root=args.data_root, queue_length=t,
            final_dim=final_dim, use_last_frame=args.use_last_frame,
            seed=args.seed,
        )

    ih, iw = final_dim[0], final_dim[1] * 6
    engine.init_params(jax.random.PRNGKey(args.seed),
                       latent_hw=lat_hw, image_hw=(ih, iw))
    if args.ckpt:
        from panacea_tpu.utils.convert import convert_panacea_checkpoint

        if args.ckpt.endswith((".ckpt", ".safetensors")):
            convert_panacea_checkpoint(args.ckpt, engine,
                                       prefer_ema=args.prefer_ema)
        else:
            from panacea_tpu.utils.checkpoint import load_engine_checkpoint

            load_engine_checkpoint(args.ckpt, engine)

    if args.view_shard:
        from panacea_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if 6 % args.view_shard or n_dev % args.view_shard:
            raise SystemExit(
                f"--view_shard {args.view_shard} must divide 6 and the "
                f"device count ({n_dev})")
        engine.set_mesh(make_mesh(n_dev, dp=1, view=args.view_shard))
        print(f"[mesh] ONE clip over {n_dev} devices: "
              f"t={n_dev // args.view_shard} x view={args.view_shard}")

    outdir = os.path.join(args.outdir, args.name, args.split)
    os.makedirs(outdir, exist_ok=True)

    # multi-host sharding of the dataset, like the reference's
    # DistributedSampler (inference.py:264-269)
    proc, nproc = jax.process_index(), jax.process_count()
    n_total = len(dataset) // max(t, 1)
    indices = [t - 1 + i * t for i in range(n_total)][proc::nproc]
    if args.num_batches > 0:
        indices = indices[: args.num_batches * args.bs]

    timer = Timer()
    n_done = 0
    if args.rollout >= 1:
        # autoregressive long-video pipeline (panacea_tpu/rollout.py)
        from panacea_tpu.rollout import rollout
        from panacea_tpu.writers import save_gif, to_uint8
        from PIL import Image

        for start, idx in enumerate(indices):
            with timer("rollout"):
                out = rollout(engine, dataset, idx, args.rollout,
                              rng=jax.random.PRNGKey(args.seed + start),
                              num_steps=args.num_steps)
            frames = out["frames"]  # (N_total, H, 6*W, 3) in [-1, 1]
            stem = os.path.basename(
                str(out["filenames"][-1][0])).rsplit(".", 1)[0]
            rdir = os.path.join(outdir, "rollout", stem)
            os.makedirs(rdir, exist_ok=True)
            save_gif(frames, os.path.join(rdir, "long.gif"), fps=4.0)
            u8 = to_uint8(frames)
            for fi in range(len(u8)):
                Image.fromarray(u8[fi]).save(
                    os.path.join(rdir, f"frame_{fi:04d}.jpg"))
            n_done += 1
            print(f"[rollout {n_done}] {len(frames)} frames "
                  f"{timer.report()}", flush=True)
        print(f"done: {n_done} rollouts -> {outdir}/rollout")
        return
    for start in range(0, len(indices), args.bs):
        chunk = indices[start:start + args.bs]
        batch = collate([dataset[i] for i in chunk])
        with timer("clip"):
            log = engine.log_images(
                batch, N=args.bs, rng=jax.random.PRNGKey(args.seed + start),
                num_steps=args.num_steps,
            )
            log = {k: np.asarray(v) for k, v in log.items()}
        log_outputs(log, outdir, batch["filenames"][0], num_frames=t,
                    view_width=final_dim[1])
        n_done += len(chunk)
        print(f"[{n_done}] {timer.report()}", flush=True)
    print(f"done: {n_done} clips -> {outdir}")


if __name__ == "__main__":
    main()
