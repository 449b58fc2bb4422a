"""Training driver for the generation model.

The reference ships no Trainer (SURVEY.md: inference-only release; all hooks
present). This driver completes the path: config-driven engine + loss, sharded
SPMD train step over a ('dp','t') mesh, EMA, warmup-cosine LR, orbax
checkpoints, spatial/temporal freeze for the two-stage recipe
(stage 2 trains only temporal layers: freeze_type='spatial',
diffusion.py:107-110).

  python train.py --base panacea_tpu/configs/tiny_cpu.yaml --synthetic \
      --steps 10 --tiny
"""

from __future__ import annotations

import argparse
import os
import time


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*",
                   default=["panacea_tpu/configs/inference_nuscenes.yaml"])
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ann_file", default=None)
    p.add_argument("--data_root", default="data/nuscenes/")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh size (default: all devices / T)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3/DeepSpeed-equivalent: shard params, optimizer "
                        "state and EMA over the whole mesh (the reference "
                        "trained under DeepSpeed — panaceaplus_40k_deepspeed"
                        ".ckpt); without it they are replicated per device")
    p.add_argument("--freeze_type", default=None,
                   choices=[None, "none", "spatial"])
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ckpt_dir", default="ckpts/train")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--resume", default=None,
                   help="params-only pytree, or an iter_N full-state "
                        "checkpoint dir / ckpt_dir containing them "
                        "(restores optimizer + step + EMA + PRNG streams "
                        "for an exact continuation)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    return p


def main():
    args, unknown = get_parser().parse_known_args()

    import jax
    from panacea_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()  # multi-host pods (no-op otherwise)

    from panacea_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()  # repeat compiles hit .jax_cache/

    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.config import load_configs_with_overrides
    from panacea_tpu.data.nuscenes.dataset import NuScenesVideoDataset, collate
    from panacea_tpu.parallel.mesh import make_mesh
    from panacea_tpu.parallel.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.checkpoint import (
        is_train_checkpoint,
        latest_checkpoint,
        load_pytree,
        load_train_checkpoint,
        save_pytree,
        save_train_checkpoint,
    )

    if args.tiny:
        # tiny_cpu.yaml is the CPU smoke config — never send it through the
        # single-client axon TPU tunnel (slow remote compile, wedges on kill)
        args.base = ["panacea_tpu/configs/tiny_cpu.yaml"]
        jax.config.update("jax_platforms", "cpu")
    cfg = load_configs_with_overrides(args.base, unknown)
    engine = instantiate_from_config(cfg["model"])
    if args.freeze_type:
        engine.freeze_type = args.freeze_type
    if "loss_fn_config" in cfg:
        engine.loss_fn = instantiate_from_config(cfg["loss_fn_config"])
    else:
        from panacea_tpu.diffusion.loss import StandardDiffusionLoss

        engine.loss_fn = StandardDiffusionLoss(
            sigma_sampler_config={
                "target": "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling",
                "params": {
                    "num_idx": 1000,
                    "discretization_config": {
                        "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
                    },
                },
            },
            share_noise_level=engine.share_noise_level,
            num_frames=engine.num_frames,
        )

    t = engine.num_frames
    if args.tiny:
        final_dim, lat_hw = (16, 32), (2, 24)
    else:
        final_dim, lat_hw = (256, 512), (32, 384)
    ih, iw = final_dim[0], final_dim[1] * 6

    if args.synthetic:
        from panacea_tpu.data.nuscenes.synthetic import (
            make_synthetic_infos,
            synthetic_image_loader,
        )

        infos = make_synthetic_infos(num_frames=max(4 * t, 16), seed=args.seed)
        dataset = NuScenesVideoDataset(
            infos=infos, queue_length=t, final_dim=final_dim,
            image_loader=synthetic_image_loader, seed=args.seed,
        )
    else:
        ann = args.ann_file or os.path.join(
            args.data_root, "nuscenes2d_ego_temporal_infos_train.pkl"
        )
        dataset = NuScenesVideoDataset(
            ann_file=ann, data_root=args.data_root, queue_length=t,
            final_dim=final_dim, seed=args.seed,
        )

    engine.init_params(jax.random.PRNGKey(args.seed),
                       latent_hw=lat_hw, image_hw=(ih, iw))

    n_dev = len(jax.devices())
    dp = args.dp or max(1, n_dev // t) if n_dev > 1 else 1
    mesh = make_mesh(min(n_dev, dp * t), dp=dp) if n_dev > 1 else None
    print(f"devices={n_dev} mesh={'none' if mesh is None else mesh.devices.shape}")

    mask = engine.trainable_mask(engine.params["model"])
    opt = make_optimizer(lr=args.lr, trainable_mask=mask, grad_clip=1.0)
    state = init_train_state(engine, opt, use_ema=args.use_ema)
    resume_meta: dict = {}
    if args.resume:
        if is_train_checkpoint(args.resume):
            # full-state resume (mmcv resume_from semantics): params +
            # optimizer + step (+ EMA), exact PRNG/data streams via meta
            rpath = args.resume
            if not os.path.basename(
                    os.path.normpath(rpath)).startswith("iter_"):
                rpath = latest_checkpoint(rpath)
            template = {"params": state.params,
                        "opt_state": state.opt_state, "step": state.step}
            if state.ema is not None:
                template["ema"] = state.ema
            tree, resume_meta = load_train_checkpoint(rpath, template)
            state = state._replace(
                params=tree["params"], opt_state=tree["opt_state"],
                step=tree["step"],
                ema=tree.get("ema", state.ema))
            print(f"[resume] {rpath} -> step "
                  f"{resume_meta.get('step', int(state.step))}")
        else:
            # params-only warm start (back-compat: converted/pretrained
            # trees; optimizer and step start fresh)
            state = state._replace(params=load_pytree(args.resume))
    fs_params = engine.params["first_stage"]
    shardings = None
    if args.fsdp and mesh is None:
        print("WARNING: --fsdp ignored: needs a multi-device mesh "
              f"(have {n_dev} device); training state stays replicated")
    if mesh is not None and args.fsdp:
        from panacea_tpu.parallel.train import shard_train_state

        (state, fs_params), shardings = shard_train_state(
            mesh, state, fs_params, fsdp=True)
    step_fn = make_train_step(engine, opt, mesh=mesh, donate=False,
                              fsdp=args.fsdp, shardings=shardings)

    rng = jax.random.PRNGKey(args.seed)
    rs = np.random.RandomState(args.seed)
    start_step = int(resume_meta.get("step", 0))
    if resume_meta.get("rng_key") is not None:
        rng = jnp.asarray(resume_meta["rng_key"])
    if resume_meta.get("rs_state") is not None:
        rs.set_state(resume_meta["rs_state"])
    if resume_meta.get("ds_rng_state") is not None:
        # the dataset's own random.Random drives prompt wording / view
        # shuffles per __getitem__ — restore it so the resumed data stream
        # replays the uninterrupted one exactly
        dataset.rng.setstate(resume_meta["ds_rng_state"])
    t0 = time.time()
    for step in range(start_step, args.steps):
        idxs = rs.randint(t - 1, len(dataset), args.bs)
        batch = collate([dataset[int(i)] for i in idxs])
        rng, k_cond, k_loss = jax.random.split(rng, 3)
        cond = engine.conditioner(batch, rng=k_cond, apply_ucg=True)
        jpg = jnp.asarray(batch["jpg"])
        state, loss = step_fn(state, fs_params, jpg, cond, k_loss)
        if step % args.log_every == 0:
            dt = (time.time() - t0) / max(step, 1)
            print(f"step {step} loss {float(loss):.4f} ({dt:.2f}s/it)",
                  flush=True)
        if args.ckpt_every > 0 and (step + 1) % args.ckpt_every == 0:
            # rotating full-state checkpoint (params + optimizer + step +
            # EMA, meta = PRNG key + batch-sampling RandomState) — resume
            # with --resume {ckpt_dir}
            os.makedirs(args.ckpt_dir, exist_ok=True)
            tree = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
            if state.ema is not None:
                tree["ema"] = state.ema
            save_train_checkpoint(
                args.ckpt_dir, step + 1, tree,
                {"step": step + 1, "rng_key": np.asarray(rng),
                 "rs_state": rs.get_state(),
                 "ds_rng_state": dataset.rng.getstate()},
                max_keep=3)
    os.makedirs(args.ckpt_dir, exist_ok=True)
    save_pytree(os.path.join(args.ckpt_dir, "final"), state.params)
    if state.ema is not None:
        # shadow tree for scripts/export_torch_ckpt.py --ema (LitEma buffers)
        save_pytree(os.path.join(args.ckpt_dir, "final_ema"),
                    state.ema.ema_params)
    # train -> inference handoff: a FULL engine checkpoint (trained model
    # subtree + the frozen first-stage/conditioner towers) that
    # `inference.py --ckpt {ckpt_dir}/engine_final` loads directly — the
    # reference's trained-ckpt -> inference.py workflow (inference.py:207-228
    # loads panaceaplus_40k_deepspeed.ckpt). EMA shadow preferred when on
    # (the reference samples from model_ema, sgm/models/diffusion.py ema scope)
    from panacea_tpu.utils.checkpoint import save_engine_checkpoint

    model_params = (state.ema.ema_params if state.ema is not None
                    else state.params)
    engine.params = dict(engine.params, model=model_params)
    save_engine_checkpoint(os.path.join(args.ckpt_dir, "engine_final"),
                           engine)
    print("training done")


if __name__ == "__main__":
    main()
