"""Export trained panacea-tpu weights to the reference torch checkpoint format.

The inverse of the import path (utils/convert.py convert_panacea_checkpoint):
weights trained here can be dropped into the reference stack's
``inference.py --ckpt`` (reference inference.py:207-228 load path, strict=False)
for evaluation or finetuning. Round-trip identity is tested in
tests/test_convert.py::test_export_roundtrip_identity.

  python scripts/export_torch_ckpt.py \
      --base panacea_tpu/configs/inference_nuscenes.yaml \
      --params ckpts/train/final [--ema ckpts/train/ema] \
      [--torch_base ckpts/panaceaplus_40k_deepspeed.ckpt] \
      --out exported.ckpt

``--params`` is a train.py save_pytree directory holding the diffusion-model
tree; ``--torch_base`` (optional) pre-loads an original reference checkpoint
first so the frozen towers (VAE, CLIP) carry real weights when the training
run only updated the diffusion model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", nargs="*",
                    default=["panacea_tpu/configs/inference_nuscenes.yaml"])
    ap.add_argument("--params", required=True,
                    help="orbax pytree dir with the trained model tree "
                         "(train.py --ckpt_dir output)")
    ap.add_argument("--ema", default=None,
                    help="optional orbax pytree dir with the EMA shadow tree; "
                         "exported as model_ema.* LitEma buffers")
    ap.add_argument("--torch_base", default=None,
                    help="optional reference torch ckpt to pre-load (fills "
                         "frozen VAE/CLIP towers with real weights)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tiny", action="store_true")
    args, unknown = ap.parse_known_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from panacea_tpu.config import load_configs_with_overrides
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.checkpoint import load_pytree
    from panacea_tpu.utils.convert import (
        convert_panacea_checkpoint,
        export_panacea_checkpoint,
        merge_params,
    )

    if args.tiny:
        args.base = ["panacea_tpu/configs/tiny_cpu.yaml"]
    cfg = load_configs_with_overrides(args.base, unknown)
    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    if args.torch_base:
        convert_panacea_checkpoint(args.torch_base, engine)
    trained = load_pytree(args.params)
    merged, n_merged, skipped_merge = merge_params(
        engine.params["model"], trained)
    engine.params["model"] = merged
    print(f"merged {n_merged} trained leaves "
          f"({len(skipped_merge)} skipped: absent/shape-mismatch)")
    ema = load_pytree(args.ema) if args.ema else None

    sd, skipped = export_panacea_checkpoint(engine, path=args.out,
                                            ema_params=ema)
    print(f"exported {len(sd)} tensors -> {args.out} "
          f"({len(skipped)} identity-skip entries absent, as on import)")


if __name__ == "__main__":
    main()
