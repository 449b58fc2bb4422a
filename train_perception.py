"""Perception (StreamPETR) training driver.

Equivalent of the reference's tools/train.py + dist_train.sh over the
experiment configs in projects/configs/diffusion/ (ported to
panacea_tpu/configs/perception/*.yaml). One process drives the whole step;
data parallelism comes from per-process dataset sharding + jit.

  python train_perception.py --config panacea_tpu/configs/perception/streampetr_r50_atss_512x256_window.yaml
  python train_perception.py --synthetic --tiny --steps 3     # smoke (CPU)
"""

from __future__ import annotations

import argparse
import json
import os
import time


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="panacea_tpu/configs/perception/"
                           "streampetr_r50_atss_512x256_window.yaml")
    p.add_argument("--steps", type=int, default=-1,
                   help="override total iterations (-1: config epochs)")
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--resume", default=None,
                   help="resume full training state from an iter_N "
                        "checkpoint dir (or a workdir containing them) — "
                        "the reference's mmcv resume_from (config :279): "
                        "params + optimizer + step, plus PRNG/data-cursor "
                        "meta for an exact continuation")
    p.add_argument("--eval_every", type=int, default=0,
                   help="run NDS/mAP on --eval_samples held-out windows "
                        "every N steps (the reference's CustomDistEvalHook "
                        "evaluation=dict(interval=...), config :272)")
    p.add_argument("--eval_samples", type=int, default=8)
    p.add_argument("--workdir", default="work_dirs")
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--batch", type=int, default=0,
                   help="per-process batch size (0: config batch_size, "
                        "except --tiny smokes default to 1)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny dims on CPU (smoke)")
    # recipe overrides (scripts/protocol_rehearsal.py drives the three-row
    # Panacea experiment at miniature scale through these)
    p.add_argument("--gen_root", default=None,
                   help="train on a Gen-nuScenes tree (pseudo-pretrain "
                        "recipe, pseudo_pretrain.py:234); with --synthetic "
                        "the synthetic infos index the generated clips")
    p.add_argument("--gen_clip_len", type=int, default=None,
                   help="frames per generated clip in --gen_root")
    p.add_argument("--final_dim", type=int, nargs=2, default=None,
                   help="override image geometry (H W)")
    p.add_argument("--num_levels", type=int, default=None,
                   help="override FPN output levels (small geometries)")
    p.add_argument("--queue_length", type=int, default=None,
                   help="override the config's sliding-window length")
    p.add_argument("--load_from", default=None,
                   help="override config load_from (pretrain -> finetune "
                        "handoff, finetune config :66)")
    p.add_argument("--filter_file", default=None,
                   help="infos pkl restricting the training pool to its "
                        "tokens (the reference's filtered gen-coverage "
                        "infos, nuscenes_dataset.py:101-112)")
    return p


def main():
    args = get_parser().parse_args()

    import jax
    from panacea_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()  # multi-host pods (no-op otherwise)

    from panacea_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()  # repeat compiles hit .jax_cache/


    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.config import load_config
    from panacea_tpu.perception.atss import grid_anchors
    from panacea_tpu.perception.detector import normalize_images
    from panacea_tpu.perception.train import (
        atss_targets,
        cosine_schedule,
        init_detector_train,
        make_detector_optimizer,
        make_detector_train,
    )
    from panacea_tpu.perception.train_dataset import PerceptionTrainDataset
    from panacea_tpu.registry import instantiate_from_config

    cfg = load_config(args.config)["perception"]
    tcfg, ocfg, dcfg = cfg["train"], cfg["optimizer"], cfg["data"]

    det_cfg = dict(cfg["detector"])
    if args.tiny:
        det_cfg = dict(det_cfg)
        det_cfg["params"] = dict(
            det_cfg.get("params", {}),
            embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
            num_propagated=8, num_decoder_layers=2, atss_stacked_convs=1,
        )
    if args.num_levels:
        det_cfg = dict(det_cfg)
        det_cfg["params"] = dict(det_cfg.get("params", {}),
                                 num_levels=args.num_levels)
    model = instantiate_from_config(det_cfg)

    queue_length = int(args.queue_length or tcfg["queue_length"])
    # streaming recipes (nopretrain/real_finetune: seq_mode=True,
    # seq_split_num=2, nopretrain.py:231-233): recurrent memory carried
    # ACROSS optimizer steps over scene-continuous frame streams
    seq_mode = bool(tcfg.get("seq_mode", False))
    seq_split_num = tcfg.get("seq_split_num", 2) if seq_mode else 0
    # per-process batch (reference samples_per_gpu, config batch_size):
    # every sampled window is collated along the leading batch axis —
    # the model/losses are batch-generic. --tiny smokes stay at 1.
    bs = args.batch if args.batch > 0 else (
        1 if args.tiny else int(tcfg.get("batch_size", 1)))
    final_dim = (tuple(args.final_dim) if args.final_dim
                 else ((64, 128) if args.tiny
                       else tuple(dcfg["ida"]["final_dim"])))
    filter_tokens = None
    if args.filter_file:
        # {'infos': [{'token', ...}]} pkl (nuscenes_dataset.py:101-112) —
        # e.g. the gen-coverage filter scripts/protocol_rehearsal.py writes
        import pickle

        with open(args.filter_file, "rb") as f:
            fd = pickle.load(f)
        fi = fd["infos"] if isinstance(fd, dict) else fd
        filter_tokens = [e["token"] if isinstance(e, dict) else e
                         for e in fi]
    if args.synthetic:
        from panacea_tpu.data.nuscenes.synthetic import (
            make_synthetic_infos,
            path_seed,
        )

        infos = make_synthetic_infos(
            num_frames=max(queue_length, 2) * 4, num_boxes=6, seed=args.seed)
        for info in infos:
            info["ego2global_rotation"] = [1.0, 0.0, 0.0, 0.0]
            info["ego2global_translation"] = [2.0 * info["frame_idx"], 0, 0]

        if args.gen_root:
            # pseudo-pretrain recipe at miniature scale: the same synthetic
            # infos a generation run used, frames read from its Gen-nuScenes
            # tree through the disjoint-clip offset contract (no
            # image_loader, so _load_generated enforces the dir naming)
            loader = None
        else:
            def loader(path):
                rs = np.random.RandomState(path_seed(path))
                return rs.uniform(0, 255,
                                  final_dim + (3,)).astype(np.float32)

        ds = PerceptionTrainDataset(
            infos=infos, queue_length=queue_length, final_dim=final_dim,
            image_loader=loader, gen_root=args.gen_root,
            gen_clip_len=args.gen_clip_len, filter_tokens=filter_tokens,
            random_length=int(tcfg.get("random_length", 0)),
            seq_split_num=seq_split_num, seed=args.seed)
    else:
        ds = PerceptionTrainDataset(
            ann_file=dcfg["ann_file"],
            gen_root=args.gen_root or dcfg.get("gen_root"),
            gen_clip_len=args.gen_clip_len, filter_tokens=filter_tokens,
            data_root=dcfg.get("data_root", "data/nuscenes/"),
            queue_length=queue_length, final_dim=final_dim,
            random_length=int(tcfg.get("random_length", 0)),
            ida_aug=dcfg.get("ida"),
            rot_range=(tuple(dcfg["rot_range"])
                       if dcfg.get("rot_range") else None),
            scale_ratio_range=(tuple(dcfg["scale_ratio_range"])
                               if dcfg.get("scale_ratio_range") else None),
            seq_split_num=seq_split_num, seed=args.seed,
        )

    # schedule + optimizer (window.py:253-274)
    if args.steps > 0:
        total_iters = args.steps
    else:
        per_epoch = int(tcfg["samples_per_epoch"]) // (
            int(tcfg["dp_devices"]) * int(tcfg["batch_size"]))
        total_iters = per_epoch * int(tcfg["num_epochs"])
    sch = ocfg.get("schedule", {})
    sched = cosine_schedule(
        base_lr=float(ocfg["lr"]),
        warmup_iters=int(sch.get("warmup_iters", 500)),
        warmup_ratio=float(sch.get("warmup_ratio", 1 / 3)),
        total_iters=total_iters,
        min_lr_ratio=float(sch.get("min_lr_ratio", 1e-3)),
    )
    opt = make_detector_optimizer(
        weight_decay=float(ocfg["weight_decay"]),
        backbone_lr_mult=float(ocfg["backbone_lr_mult"]),
        grad_clip_norm=float(ocfg["grad_clip_norm"]),
        schedule=sched,
        backbone_frozen_stages=int(cfg.get("backbone_frozen_stages", -1)),
        backbone_bn_trainable=bool(cfg.get("backbone_bn_trainable", True)),
    )

    # anchors are static for a fixed input geometry
    from panacea_tpu.perception.atss import fpn_shapes

    nl = int(det_cfg["params"].get("num_levels", 5))
    anchors = grid_anchors(fpn_shapes(final_dim, nl))

    # data-parallel gradient sync (the reference's DDP allreduce,
    # tools/train.py -> MMDistributedDataParallel): shard the global batch
    # over a 'dp' mesh and pmean grads inside the train step. Engaged on
    # multi-host pods (after maybe_init_distributed) or explicitly via
    # PANACEA_PERCEPTION_DP=1 (e.g. single-process multi-device runs).
    mesh = None
    dp_sharding = None
    if jax.process_count() > 1 or os.environ.get("PANACEA_PERCEPTION_DP"):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        ndev = jax.device_count()
        if jax.process_count() > 1:
            assert (bs * jax.process_count()) % ndev == 0, (
                f"global batch {bs * jax.process_count()} must shard over "
                f"{ndev} devices; use --batch multiple of "
                f"{jax.local_device_count()}")
            dp = ndev
        else:
            dp = max(d for d in range(1, min(ndev, bs) + 1) if bs % d == 0)
        mesh = Mesh(np.asarray(jax.devices()[:dp]).reshape(dp), ("dp",))
        dp_sharding = NamedSharding(mesh, PartitionSpec("dp"))
        print(f"[ddp] {jax.process_count()} process(es) x batch {bs} "
              f"-> dp={dp} devices, synced grads", flush=True)

    def to_global(x):
        """Process-local batch shard -> global dp-sharded array."""
        if mesh is None:
            return x
        return jax.make_array_from_process_local_data(
            dp_sharding, np.asarray(x))

    pc_range = tuple(det_cfg["params"]["pc_range"])
    forward_fn, train_step = make_detector_train(
        model, opt, pc_range,
        num_classes=int(det_cfg["params"].get("num_classes", 10)),
        cls_weight=float(tcfg["cls_weight"]),
        bbox_weight=float(tcfg["bbox_weight"]),
        use_grid_mask=bool(tcfg["use_grid_mask"]),
        with_dn=bool(tcfg["with_dn"]),
        dn_scalar=int(tcfg["dn_scalar"]),
        dn_noise_scale=float(tcfg["dn_noise_scale"]),
        dn_split=float(tcfg["dn_split"]),
        dn_weight=float(tcfg["dn_weight"]),
        anchors_per_level=anchors,
        num_frame_losses=int(tcfg["num_frame_losses"]),
        streaming=seq_mode,
        mesh=mesh,
    )

    # params from shapes (same protocol as eval_perception.py)
    cams = int(det_cfg["params"].get("num_cams", 6))
    t = queue_length
    imgs0 = jnp.zeros((1, t, cams) + final_dim + (3,), jnp.float32)
    data0 = {
        "prev_exists": jnp.ones((1, t), jnp.float32),
        "timestamp": jnp.zeros((1, t), jnp.float32),
    }
    eye = jnp.eye(4, dtype=jnp.float32)
    for k in ("lidar2img", "intrinsics", "extrinsics"):
        data0[k] = jnp.broadcast_to(eye, (1, t, cams, 4, 4))
    for k in ("ego_pose", "ego_pose_inv"):
        data0[k] = jnp.broadcast_to(eye, (1, t, 4, 4))
    # init through the training path so the roi head's params materialize
    params = jax.jit(
        lambda k: model.init(k, imgs0, data0, method=model.train_window)
    )(jax.random.PRNGKey(args.seed))["params"]

    load_report = None
    if args.load_from or cfg.get("load_from"):
        path = args.load_from or cfg["load_from"]
        if os.path.exists(path):
            from panacea_tpu.utils.convert import (
                convert_streampetr_checkpoint,
                merge_params,
            )
            from panacea_tpu.utils.checkpoint import load_pytree

            if path.endswith((".pth", ".ckpt")):
                # partial pretrain (e.g. the ATSS 2D nuImages checkpoint,
                # window.py:275, covers backbone/neck/roi-head only):
                # convert what maps, merge into init params.
                converted, _report = convert_streampetr_checkpoint(
                    path,
                    num_layers=int(det_cfg["params"].get(
                        "num_decoder_layers", 6)),
                    backbone=det_cfg["params"].get("backbone_type", "r50"),
                    head=det_cfg["params"].get("head_type", "sparse"),
                    with_atss=bool(det_cfg["params"].get("with_atss", False)),
                    atss_stacked_convs=int(det_cfg["params"].get(
                        "atss_stacked_convs", 4)),
                )
                params, n_merged, skipped = merge_params(params, converted)
                print(f"merged {n_merged} pretrained tensors from {path}"
                      + (f" ({len(skipped)} skipped: shape/path mismatch)"
                         if skipped else ""))
                load_report = {"path": path, "n_loaded": int(n_merged),
                               "n_skipped": len(skipped)}
            else:
                # our own saved pytree (e.g. a pseudo-pretrain run's
                # `final`): mmcv load_from is load_checkpoint strict=False —
                # merge by path/shape so a detector-class change between
                # pretrain and finetune recipes (StreamPETRWindow ->
                # streaming StreamPETR, finetune.py:26) keeps every shared
                # tensor and leaves the rest at init
                loaded = load_pytree(path)
                params, n_merged, skipped = merge_params(params, loaded)
                print(f"loaded {n_merged} init tensors from {path}"
                      + (f" ({len(skipped)} skipped: shape/path mismatch)"
                         if skipped else ""))
                load_report = {"path": path, "n_loaded": int(n_merged),
                               "n_skipped": len(skipped)}
        else:
            print(f"[warn] load_from {path} not found; training from scratch")

    state = init_detector_train(model, opt, params)
    name = os.path.splitext(os.path.basename(args.config))[0]
    outdir = os.path.join(args.workdir, name)
    os.makedirs(outdir, exist_ok=True)

    # per-process shard of the key-frame indices (reference
    # DistributedGroupSampler -> per-rank strided shard)
    proc, nproc = jax.process_index(), jax.process_count()
    rng = jax.random.PRNGKey(args.seed)
    valid_idx = [i for i in range(len(ds))
                 if i >= queue_length - 1][proc::nproc]
    assert valid_idx, "dataset has no full windows"
    eval_idx: list = []
    if args.eval_every > 0 and not seq_mode:
        # genuinely held out: the eval windows leave the training rotation
        k = min(args.eval_samples, max(len(valid_idx) - 1, 0))
        if k > 0:
            eval_idx, valid_idx = valid_idx[-k:], valid_idx[:-k]

    # motion-head recipe (head_type='motion'): GT future trajectories ride
    # the window and feed the TrajLoss term in make_detector_train
    pred_steps = 0
    if det_cfg["params"].get("head_type") == "motion":
        pred_steps = int(dict(det_cfg["params"].get("head_cfg") or {}).get(
            "pred_steps", 12))

    # streaming mode: scene-continuous sample streams per global batch slot
    # (InfiniteGroupEachSampleInBatchSampler) + recurrent memory threaded
    # across steps. Window mode: cyclic per-process shard as before.
    sampler = None
    memory = None
    if seq_mode:
        from panacea_tpu.perception.head import init_memory
        from panacea_tpu.perception.train_dataset import StreamingSampler

        # held-out eval in streaming mode: carve WHOLE sequence groups out
        # of the sampler's pool (excluding individual windows would leave
        # their neighbours training on the same scene-continuous stream and
        # the sampler would still visit them) — every group kept by the
        # sampler is trained on, every excluded group is eval-only
        held_groups: set = set()
        if args.eval_every > 0:
            flags = np.asarray(ds.seq_flags)
            groups_num = int(flags.max()) + 1
            g = groups_num - 1
            held_wins: list = []
            while (g >= 0 and groups_num - len(held_groups) - 1
                   >= bs * nproc
                   and len(held_wins) < args.eval_samples * nproc):
                held_groups.add(g)
                held_wins.extend(
                    int(i) for i in np.where(flags == g)[0]
                    if i >= queue_length - 1)
                g -= 1
            eval_idx = sorted(held_wins)[proc::nproc][:args.eval_samples]

        sampler = StreamingSampler(ds.seq_flags, batch_size=bs,
                                   num_replicas=nproc, rank=proc,
                                   seed=args.seed,
                                   exclude_groups=held_groups)
        memory = init_memory(bs, model.memory_len, model.embed_dims)

    # resume (mmcv resume_from, config :279): restore params + optimizer +
    # step from orbax, plus the host-side loop state (JAX PRNG key, dataset
    # augmentation RandomState, window cursor / sampler draw count) from the
    # meta sidecar — the resumed run replays the exact trajectory of an
    # uninterrupted one (tests/test_checkpoint_resume.py)
    start_step, start_ptr, start_draws = 0, 0, 0
    if args.resume:
        import pickle

        from panacea_tpu.utils.checkpoint import (
            latest_checkpoint,
            load_train_checkpoint,
        )

        rpath = args.resume
        if not os.path.basename(os.path.normpath(rpath)).startswith("iter_"):
            rpath = latest_checkpoint(rpath) or rpath
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
        if memory is not None:
            template["memory"] = memory
        tree, meta = load_train_checkpoint(rpath, template)
        state = type(state)(tree["params"], tree["opt_state"], tree["step"])
        if memory is not None and "memory" in tree:
            memory = tree["memory"]
        rank_meta = rpath + f".meta.rank{proc}.pkl"
        if proc > 0 and os.path.exists(rank_meta):
            with open(rank_meta, "rb") as f:
                meta = pickle.load(f)
        start_step = int(meta.get("step", int(state.step)))
        start_ptr = int(meta.get("ptr", 0))
        start_draws = int(meta.get("draws", 0))
        if meta.get("rng_key") is not None:
            rng = jnp.asarray(meta["rng_key"])
        if meta.get("ds_rng_state") is not None and hasattr(ds, "rng"):
            ds.rng.set_state(meta["ds_rng_state"])
        if sampler is not None:
            # generators are deterministic: replaying the draw count puts
            # every slot's stream + buffer back exactly where it was
            for _ in range(start_draws):
                sampler.next_batch()
        print(f"[resume] {rpath} -> step {start_step}", flush=True)

    if memory is not None and mesh is not None:
        memory = jax.tree.map(to_global, memory)

    if mesh is not None:
        # params/opt state replicated across the whole mesh — the synced
        # step consumes global arrays only. On multi-host pods device_put
        # onto non-addressable devices is illegal; every host holds the
        # identical full value (same init seed / same checkpoint), so
        # make_array_from_process_local_data assembles the replicated
        # global array from each process's copy.
        from jax.sharding import NamedSharding, PartitionSpec

        rep_sharding = NamedSharding(mesh, PartitionSpec())
        if nproc > 1:
            state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep_sharding, np.asarray(x)), state)
        else:
            state = jax.device_put(state, rep_sharding)

    t0 = time.time()
    step = start_step
    ptr = start_ptr  # window-mode sample cursor (decoupled from step, bs > 1)
    draws = start_draws  # streaming-mode sampler draw count (for resume)
    metrics: dict = {}
    while step < total_iters:
        if sampler is not None:
            idxs = sampler.next_batch()
            draws += 1
            items = [ds.window_with_gt(i, max_gt=args.max_gt,
                                       pred_steps=pred_steps) for i in idxs]
            # a None window (scene boundary) skips the whole step: the
            # slots' stream positions are already consumed and substituting
            # items would desync the recurrent memory from its scene. The
            # decision must be GLOBALLY consistent: per-slot group streams
            # differ across ranks, so on a multi-host 'dp' mesh one rank
            # skipping while another enters the collective train step would
            # deadlock the pod — all-gather the miss flags and skip
            # everywhere if ANY rank missed (every rank consumed its draw,
            # so the streams stay aligned).
            skip = any(it is None for it in items)
            if nproc > 1:
                from jax.experimental import multihost_utils

                skip = bool(multihost_utils.process_allgather(
                    np.asarray([skip], np.int32)).max())
            if skip:
                step += 1
                continue
        else:
            # fill the batch one valid window at a time: a None window
            # (scene-start, window_with_gt needs queue_length history) is
            # skipped INDIVIDUALLY so its batch-mates still train
            items = []
            misses = 0
            while len(items) < bs and misses < 2 * len(valid_idx):
                it = ds.window_with_gt(valid_idx[ptr % len(valid_idx)],
                                       max_gt=args.max_gt,
                                       pred_steps=pred_steps)
                ptr += 1
                if it is None:
                    misses += 1
                else:
                    items.append(it)
            if len(items) < bs:
                raise RuntimeError(
                    "no full training windows in this process's shard")
        gt_trajs = gt_traj_mask = None
        if pred_steps:
            gt_trajs = np.concatenate([it[5] for it in items], 0)
            gt_traj_mask = np.concatenate([it[6] for it in items], 0)
        windows = [it[0] for it in items]
        gt_boxes = np.concatenate([it[1] for it in items], 0)
        gt_labels = np.concatenate([it[2] for it in items], 0)
        gt2d_b = sum((it[3] for it in items), [])
        gt2d_l = sum((it[4] for it in items), [])
        imgs = normalize_images(jnp.asarray(np.concatenate(
            [w.pop("imgs") for w in windows], 0)))
        data_seq = {k: jnp.asarray(np.concatenate([w[k] for w in windows], 0))
                    for k in windows[0]}
        tgt2d = atss_targets(anchors, gt2d_b, gt2d_l)
        if mesh is not None:
            # process-local batch -> global dp-sharded arrays; atss num_pos
            # is a per-PROCESS scalar and is recomputed per shard inside
            # the synced step (zeroed here so no divergent value rides a
            # replicated sharding)
            imgs = to_global(imgs)
            data_seq = {k: to_global(v) for k, v in data_seq.items()}
            gt_boxes, gt_labels = to_global(gt_boxes), to_global(gt_labels)
            tgt2d = type(tgt2d)(to_global(tgt2d.labels),
                                to_global(tgt2d.gt_xyxy),
                                to_global(tgt2d.centerness),
                                jnp.float32(0.0))
            if gt_trajs is not None:
                gt_trajs = to_global(gt_trajs)
                gt_traj_mask = to_global(gt_traj_mask)
        rng, sub = jax.random.split(rng)
        if seq_mode:
            # single-frame step: drop the T=1 window axis, thread memory
            state, memory, metrics = train_step(
                state, sub, imgs[:, 0],
                {k: v[:, 0] for k, v in data_seq.items()},
                gt_boxes, gt_labels, tgt2d, gt_trajs, gt_traj_mask, memory)
        else:
            state, metrics = train_step(state, sub, imgs, data_seq,
                                        gt_boxes, gt_labels, tgt2d,
                                        gt_trajs, gt_traj_mask)
        step = int(state.step)
        if step % 10 == 0 or step == total_iters:
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
            print(f"[{step}/{total_iters}] {msg} "
                  f"({(time.time()-t0)/max(step,1):.2f}s/it)", flush=True)
        if args.ckpt_every > 0 and step % args.ckpt_every == 0:
            # full-state rotating checkpoint (mmcv checkpoint_config
            # max_keep_ckpts=3, config :274-277): orbax tree + meta sidecar;
            # on multi-host meshes the orbax save is collective and each
            # rank adds its own loop-state meta
            import pickle

            from panacea_tpu.utils.checkpoint import save_train_checkpoint

            tree = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
            if memory is not None:
                tree["memory"] = memory
            cmeta = {"step": step, "ptr": ptr, "draws": draws,
                     "rng_key": np.asarray(rng),
                     "ds_rng_state": (ds.rng.get_state()
                                      if hasattr(ds, "rng") else None)}
            cpath = save_train_checkpoint(
                outdir, step, tree, cmeta if proc == 0 else None,
                max_keep=3)
            if proc > 0:
                with open(cpath + f".meta.rank{proc}.pkl", "wb") as f:
                    pickle.dump(cmeta, f)
        if args.eval_every > 0 and step % args.eval_every == 0:
            # in-training eval hook (reference CustomDistEvalHook,
            # core/evaluation/eval_hooks.py + evaluation=dict(interval=...)):
            # decode + devkit metrics on a fixed slice of full windows. The
            # eval set is the TAIL of this process's shard — windows the
            # cyclic training order reaches last.
            from panacea_tpu.perception.coder import NMSFreeCoder
            from panacea_tpu.perception.metrics import (
                CLASS_NAMES,
                evaluate_detections,
            )

            coder = NMSFreeCoder(pc_range=tuple(model.pc_range),
                                 max_num=min(300, model.num_query))
            # each process evaluates ITS shard of held-out windows with its
            # own (host-local) param copy — replicated global arrays are
            # fully addressable, so this is a device->host->device copy
            eval_params = state.params
            if mesh is not None:
                eval_params = jax.tree.map(
                    lambda a: jnp.asarray(np.asarray(a)), state.params)
            preds_l, gts_l = [], []
            for ei in eval_idx:
                # sliding_window = the EVAL path: fixed resize, no IDA/rot
                # augmentation, and no draw from the training RandomState
                # (train_window would both add eval noise and perturb every
                # subsequent training window's augmentation stream)
                w = ds.sliding_window(ei)
                if w is None:
                    continue
                ei_imgs = normalize_images(jnp.asarray(w.pop("imgs")))
                ei_data = {k: jnp.asarray(v) for k, v in w.items()}
                outs = forward_fn(eval_params, ei_imgs, ei_data)
                dets = coder.decode(outs)[0]
                preds_l.append({"boxes": dets["bboxes"],
                                "labels": dets["labels"],
                                "scores": dets["scores"]})
                gts_l.append(ds.gt_for(ei, list(CLASS_NAMES)))
            if preds_l:
                res = evaluate_detections(preds_l, gts_l)
                print(f"[eval @{step}] NDS={res['NDS']:.4f} "
                      f"mAP={res['mAP']:.4f}", flush=True)
                with open(os.path.join(outdir, "eval_log.jsonl"), "a") as f:
                    json.dump({"step": step, **{k: float(v)
                               for k, v in res.items()}}, f)
                    f.write("\n")

    from panacea_tpu.utils.checkpoint import save_pytree

    save_pytree(os.path.join(outdir, "final"), state.params)
    log = {"steps": step, "final_metrics": metrics}
    if load_report:
        log["load_from"] = load_report
    if args.gen_root or dcfg.get("gen_root"):
        # writer/reader layout contract on the TRAIN side too: misses mean
        # the reference's silent zero-image fallback fired
        # (nuscenes_dataset.py:330-345) — surfaced so the protocol rehearsal
        # can assert gen_frames_missing == 0
        log["gen_frames_loaded"] = int(ds.gen_hits)
        log["gen_frames_missing"] = int(ds.gen_misses)
        print(f"gen frames: {ds.gen_hits} loaded, {ds.gen_misses} missing",
              flush=True)
    with open(os.path.join(outdir, "train_log.json"), "w") as f:
        json.dump(log, f)
    print(f"done: {step} steps -> {outdir}")


if __name__ == "__main__":
    main()
