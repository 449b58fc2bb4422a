"""Perception evaluation driver: StreamPETR-Window on Gen-nuScenes (or real)
frames -> NDS/mAP.

Replaces the reference's torch.distributed.launch tools/test.py + dist_test.sh
(metrics/StreamPETR/tools/): one process, jitted detector, host-side metric
aggregation (the reference's CPU-tmpdir all-gather becomes per-host shards).

  python eval_perception.py --ann data/nuscenes/nuscenes2d_ego_temporal_infos_val.pkl \
      --gen_root outputs/panacea_tpu/val/gen-nuscenes --ckpt streampetr.ckpt
"""

from __future__ import annotations

import argparse
import json
import time


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", default=None)
    p.add_argument("--gen_root", default=None,
                   help="Gen-nuScenes root; omit to eval on real frames")
    p.add_argument("--data_root", default="data/nuscenes/")
    p.add_argument("--ckpt", default=None, help="orbax detector checkpoint")
    p.add_argument("--num_samples", type=int, default=-1)
    p.add_argument("--queue_length", type=int, default=8)
    p.add_argument("--out", default=None, help="write metrics json here")
    p.add_argument("--backbone", default="r50",
                   choices=["r50", "vovnet", "eva"],
                   help="img_backbone family (see README model zoo)")
    p.add_argument("--head", default="sparse",
                   choices=["sparse", "petr", "sparse_v3", "sparse_v4",
                            "motion", "petr_dn"],
                   help="detection head family (sparse_v3/v4 are the "
                        "proposal-query Sparse4D decoders; without "
                        "proposals they fall back to learned queries)")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference mmdet .pth; converted on the fly "
                        "(convert_streampetr_checkpoint backbone=/head=)")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic infos + images (no nuScenes needed); "
                        "with --gen_root, synthetic infos but REAL generated "
                        "frames from that root (the gen->eval round trip)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny detector dims (CPU/smoke)")
    p.add_argument("--final_dim", type=int, nargs=2, default=None,
                   help="override eval image H W (e.g. to match a tiny "
                        "generation run)")
    p.add_argument("--num_levels", type=int, default=None,
                   help="override FPN levels (small final_dim needs fewer)")
    p.add_argument("--seed", type=int, default=0,
                   help="synthetic-infos seed (must match the generation "
                        "run's --seed for the round trip)")
    p.add_argument("--gen_clip_len", type=int, default=None,
                   help="clip length of a DISJOINT-clip generation run; "
                        "evaluates only at clip-end key frames with "
                        "clip-aligned frame offsets so each history image "
                        "pairs with the calib/ego-pose of the sample it was "
                        "generated for")
    p.add_argument("--filter_file", default=None,
                   help="pkl list of sample tokens to keep (reference "
                        "filter_file)")
    return p


def main():
    args = get_parser().parse_args()

    import jax
    from panacea_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()  # multi-host pods (no-op otherwise)

    from panacea_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()  # repeat compiles hit .jax_cache/


    if args.tiny:
        # tiny smoke runs belong on CPU: through the single-chip axon tunnel,
        # un-jitted dispatch costs seconds per op (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.perception.coder import NMSFreeCoder
    from panacea_tpu.perception.detector import StreamPETRWindow
    from panacea_tpu.perception.eval_dataset import GenNuScenesEvalDataset
    from panacea_tpu.perception.metrics import CLASS_NAMES, evaluate_detections

    if args.synthetic:
        from panacea_tpu.data.nuscenes.synthetic import make_synthetic_infos

        infos = make_synthetic_infos(num_frames=8, num_boxes=6,
                                     seed=args.seed)
        for info in infos:
            info["ego2global_rotation"] = [1.0, 0.0, 0.0, 0.0]
            info["ego2global_translation"] = [2.0 * info["frame_idx"], 0.0, 0.0]

        if args.gen_clip_len:
            # keep the FULL infos (so window history frames carry their own
            # real calib/ego-pose) and let the dataset evaluate only at
            # clip-end key frames with clip-aligned frame offsets
            args.queue_length = min(args.queue_length, args.gen_clip_len)
        final_dim = tuple(args.final_dim or ((64, 128) if args.tiny
                                             else (256, 512)))
        if args.gen_root:
            # round trip: same synthetic infos the generation run used; the
            # frames come from its Gen-nuScenes tree (no image_loader, so
            # _load_generated exercises the dir-naming contract)
            loader = None
        else:
            def loader(path):
                from panacea_tpu.data.nuscenes.synthetic import path_seed

                rs = np.random.RandomState(path_seed(path))
                return rs.uniform(0, 255,
                                  final_dim + (3,)).astype(np.float32)

        ds = GenNuScenesEvalDataset(
            infos=infos, gen_root=args.gen_root,
            queue_length=min(args.queue_length, 4),
            final_dim=final_dim,
            image_loader=loader,
            gen_clip_len=args.gen_clip_len,
        )
    else:
        filter_tokens = None
        if args.filter_file:
            # {'infos': [{'token', 'timestamp', ...}]} pkl
            # (nuscenes_dataset.py:101-112)
            import pickle

            with open(args.filter_file, "rb") as f:
                fd = pickle.load(f)
            fi = fd["infos"] if isinstance(fd, dict) else fd
            filter_tokens = [e["token"] if isinstance(e, dict) else e
                             for e in fi]
        ds = GenNuScenesEvalDataset(
            ann_file=args.ann, gen_root=args.gen_root,
            data_root=args.data_root, queue_length=args.queue_length,
            filter_tokens=filter_tokens,
            **({"final_dim": tuple(args.final_dim)} if args.final_dim
               else {}),
        )
    zoo = dict(backbone_type=args.backbone, head_type=args.head,
               neck_start_level={"r50": 1, "vovnet": 2, "eva": 0}[args.backbone])
    if args.num_levels:
        zoo["num_levels"] = args.num_levels
    if args.tiny:
        model = StreamPETRWindow(
            embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
            num_propagated=8, num_decoder_layers=2, num_cams=6, **zoo,
        )
    else:
        model = StreamPETRWindow(**zoo)
    # params from shapes alone (no dataset scan): a zero window with identity
    # calibration matrices has the exact structure sliding_window returns
    t, (h, w), cams = ds.queue_length, ds.final_dim, 6
    imgs = jnp.zeros((1, t, cams, h, w, 3), jnp.float32)
    data_seq = {
        "prev_exists": jnp.ones((1, t), jnp.float32),
        "timestamp": jnp.zeros((1, t), jnp.float32),
    }
    eye = jnp.eye(4, dtype=jnp.float32)
    for k in ("lidar2img", "intrinsics", "extrinsics"):
        data_seq[k] = jnp.broadcast_to(eye, (1, t, cams, 4, 4))
    for k in ("ego_pose", "ego_pose_inv"):
        data_seq[k] = jnp.broadcast_to(eye, (1, t, 4, 4))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), imgs, data_seq)["params"]
    if args.ckpt:
        from panacea_tpu.utils.checkpoint import (
            is_train_checkpoint,
            load_pytree,
            load_train_checkpoint,
        )

        if is_train_checkpoint(args.ckpt):
            # full train-state checkpoint (train_perception.py iter_N):
            # evaluate its params sub-tree
            params = load_train_checkpoint(args.ckpt)[0]["params"]
        else:
            params = load_pytree(args.ckpt)
    elif args.torch_ckpt:
        from panacea_tpu.utils.convert import (
            convert_streampetr_checkpoint,
            merge_params,
        )

        eva_cfg = ({"grid_hw": (h // 16, w // 16)}
                   if args.backbone == "eva" else None)
        converted, _report = convert_streampetr_checkpoint(
            args.torch_ckpt, backbone=args.backbone, head=args.head,
            eva_cfg=eva_cfg)
        # merge (not replace): strict=False load semantics — leaves the
        # checkpoint doesn't cover stay at init
        params, n_merged, _skipped = merge_params(params, converted)
        print(f"restored {n_merged} tensors from {args.torch_ckpt}")

    @jax.jit
    def run(params, imgs, data_seq):
        return model.apply({"params": params}, imgs, data_seq)

    coder = NMSFreeCoder(pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
                         max_num=20 if args.tiny else 300)
    preds, gts = [], []
    n = 0
    proc, nproc = jax.process_index(), jax.process_count()
    t0 = time.time()
    for i in range(proc, len(ds), nproc):
        window = ds.sliding_window(i)
        if window is None:
            continue
        imgs = jnp.asarray(window["imgs"])
        data_seq = {k: jnp.asarray(v) for k, v in window.items()
                    if k != "imgs"}
        outs, _ = run(params, imgs, data_seq)
        dets = coder.decode(outs)[0]
        preds.append((i, {
            "boxes": dets["bboxes"], "labels": dets["labels"],
            "scores": dets["scores"],
        }))
        gts.append((i, ds.gt_for(i, list(CLASS_NAMES))))
        n += 1
        if n % 50 == 0:
            print(f"[{n}] {(time.time()-t0)/n:.2f}s/sample", flush=True)
        if args.num_samples > 0 and n >= args.num_samples:
            break

    # merge shards across processes (reference collect_results_cpu,
    # core/apis/test.py:116-163); rank 0 computes metrics
    from panacea_tpu.perception.collect import collect_results_cpu

    tmpdir = (args.out or "eval_perception") + ".collect"
    preds = collect_results_cpu(preds, tmpdir, proc, nproc)
    gts = collect_results_cpu(gts, tmpdir + "_gt", proc, nproc)
    if proc != 0:
        return

    metrics = evaluate_detections(preds, gts)
    if args.gen_root:
        # layout-contract accounting (scripts/e2e_gen_eval.py asserts
        # gen_frames_missing == 0: a writer/reader dir-naming drift would
        # otherwise be silently zero-filled)
        metrics["gen_frames_loaded"] = float(ds.gen_hits)
        metrics["gen_frames_missing"] = float(ds.gen_misses)
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()},
                     indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
