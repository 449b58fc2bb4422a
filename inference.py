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
    return p


def main():
    args, unknown = get_parser().parse_known_args()

    import jax
    import numpy as np

    from panacea_tpu.config import load_configs_with_overrides
    from panacea_tpu.data.nuscenes.dataset import NuScenesVideoDataset, collate
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.profiling import Timer
    from panacea_tpu.writers import log_outputs

    if args.tiny:
        args.base = ["panacea_tpu/configs/tiny_cpu.yaml"]
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
