"""FID / FVD between a real and a generated frame tree.

Completes the paper-metric surface (Panacea reports FID/FVD; the reference
repo defers to external pytorch-fid / FVD scripts — README.md:21, paper
arXiv 2311.16813 §4). This driver walks two directories of per-view frame
images (the layout inference.py writes: <root>/<view>_<sample>/_00000<i>.jpg,
matching the Gen-nuScenes eval layout, reference nuscenes_dataset.py:316-345),
extracts InceptionV3 pooled features (FID) and I3D video features over
8-frame clips (FVD), and prints both.

Weights: --inception_ckpt / --i3d_ckpt take torch state-dict files converted
on the fly (utils/convert.py:build_inception_mapping / build_i3d_mapping).
Without weights the towers are random-init — fine for pipeline smoke tests
(--synthetic), NOT paper-comparable.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List


def _force_platform():
    import jax

    if os.environ.get("EVAL_GEN_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")


def collect_clips(root: str, num_frames: int = 8) -> Dict[str, List[str]]:
    """clip dir -> ordered frame paths (dirs with >= num_frames images)."""
    clips = {}
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not os.path.isdir(full):
            continue
        frames = sorted(
            os.path.join(full, f) for f in os.listdir(full)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        if len(frames) >= num_frames:
            clips[d] = frames[:num_frames]
    return clips


def load_image(path: str, hw) -> "np.ndarray":
    import numpy as np
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((hw[1], hw[0]),
                                                 Image.BILINEAR)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--real_root", help="dir of per-clip frame dirs (real)")
    ap.add_argument("--gen_root", help="dir of per-clip frame dirs (generated)")
    ap.add_argument("--inception_ckpt", default=None)
    ap.add_argument("--i3d_ckpt", default=None)
    ap.add_argument("--num_frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_clips", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true",
                    help="self-test on random data (no dirs needed)")
    ap.add_argument("--allow_random_towers", action="store_true",
                    help="permit FID/FVD from random-init Inception/I3D "
                         "(pipeline smoke ONLY — numbers are meaningless; "
                         "the output JSON is stamped 'towers':'random-init')")
    args = ap.parse_args(argv)

    # honesty guard: a real comparison with random-init towers emits
    # garbage that could be mistaken for a result — refuse unless
    # explicitly allowed (and then stamp the JSON)
    towers_random = not (args.inception_ckpt and args.i3d_ckpt)
    if not args.synthetic and towers_random and not args.allow_random_towers:
        sys.exit(
            "eval_generation: refusing to compute FID/FVD with random-init "
            "feature towers (no --inception_ckpt/--i3d_ckpt). These numbers "
            "would be meaningless. Pass converted tower weights, or "
            "--allow_random_towers for a pipeline smoke run (output will be "
            "stamped 'towers': 'random-init').")

    _force_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.metrics_gen.fid import compute_fid, compute_fvd
    from panacea_tpu.metrics_gen.i3d import I3D
    from panacea_tpu.metrics_gen.inception import InceptionV3

    inc = InceptionV3()
    i3d = I3D()
    rng = jax.random.PRNGKey(0)
    inc_params = jax.jit(inc.init)(rng, jnp.zeros((1, 299, 299, 3)))["params"]
    i3d_params = jax.jit(lambda r, x: i3d.init(r, x))(
        rng, jnp.zeros((1, args.num_frames, 224, 224, 3)))["params"]
    if args.inception_ckpt:
        from panacea_tpu.utils.convert import (
            build_inception_mapping,
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.inception_ckpt)
        conv, missing, unexpected = convert_state_dict(
            sd, build_inception_mapping())
        print(f"[inception] restore: {len(missing)} missing, "
              f"{len(unexpected)} unexpected", file=sys.stderr)
        inc_params = conv
    if args.i3d_ckpt:
        from panacea_tpu.utils.convert import (
            build_i3d_mapping,
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.i3d_ckpt)
        conv, missing, unexpected = convert_state_dict(
            sd, build_i3d_mapping())
        print(f"[i3d] restore: {len(missing)} missing, "
              f"{len(unexpected)} unexpected", file=sys.stderr)
        i3d_params = conv

    inc_fn = jax.jit(lambda x: inc.apply({"params": inc_params}, x))
    i3d_fn = jax.jit(lambda x: i3d.apply({"params": i3d_params}, x))

    def frame_feats(frame_batches):
        for xb in frame_batches:
            yield np.asarray(inc_fn(jnp.asarray(xb)))

    def clip_feats(clip_batches):
        for xb in clip_batches:
            yield np.asarray(i3d_fn(jnp.asarray(xb)))

    if args.synthetic:
        rs = np.random.RandomState(0)

        def synth(n, shape):
            for _ in range(n):
                yield rs.uniform(-1, 1, shape).astype(np.float32)

        fid = compute_fid(frame_feats(synth(2, (args.batch, 299, 299, 3))),
                          frame_feats(synth(2, (args.batch, 299, 299, 3))))
        fvd = compute_fvd(
            clip_feats(synth(2, (2, args.num_frames, 224, 224, 3))),
            clip_feats(synth(2, (2, args.num_frames, 224, 224, 3))))
        towers = "random-init" if towers_random else "converted"
        print(f'{{"fid": {fid:.4f}, "fvd": {fvd:.4f}, "synthetic": true, '
              f'"towers": "{towers}"}}')
        return

    assert args.real_root and args.gen_root, "--real_root/--gen_root required"
    real = collect_clips(args.real_root, args.num_frames)
    gen = collect_clips(args.gen_root, args.num_frames)
    if args.max_clips:
        real = dict(list(real.items())[: args.max_clips])
        gen = dict(list(gen.items())[: args.max_clips])
    print(f"[eval_generation] {len(real)} real / {len(gen)} gen clips",
          file=sys.stderr)

    def frames_of(clips, hw):
        batch = []
        for frames in clips.values():
            for f in frames:
                batch.append(load_image(f, hw))
                if len(batch) == args.batch:
                    yield np.stack(batch)
                    batch = []
        if batch:
            yield np.stack(batch)

    def videos_of(clips, hw):
        batch = []
        for frames in clips.values():
            batch.append(np.stack([load_image(f, hw) for f in frames]))
            if len(batch) == 2:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)

    fid = compute_fid(frame_feats(frames_of(real, (299, 299))),
                      frame_feats(frames_of(gen, (299, 299))))
    fvd = compute_fvd(clip_feats(videos_of(real, (224, 224))),
                      clip_feats(videos_of(gen, (224, 224))))
    towers = "random-init" if towers_random else "converted"
    print(f'{{"fid": {fid:.4f}, "fvd": {fvd:.4f}, '
          f'"real_clips": {len(real)}, "gen_clips": {len(gen)}, '
          f'"towers": "{towers}"}}')


if __name__ == "__main__":
    main()
