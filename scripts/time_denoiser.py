"""Minimal: wall-time one CFG denoiser eval (the 25x repeated unit) on TPU."""

import os
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir',
                  '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.config import load_config
from panacea_tpu.registry import instantiate_from_config


def _force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--geglu", choices=["pallas", "xla"], default=None)
    ap.add_argument("--attn", choices=["pallas", "xla"], default=None)
    ap.add_argument("--no_remat", action="store_true")
    args = ap.parse_args()
    if args.geglu:
        from panacea_tpu.ops.geglu import set_geglu_impl

        set_geglu_impl(args.geglu == "pallas")
    if args.attn:
        from panacea_tpu.ops.attention import set_attention_impl

        set_attention_impl(args.attn)
    print("backend", jax.default_backend(), "geglu", args.geglu,
          "attn", args.attn, flush=True)
    cfg = load_config("panacea_tpu/configs/inference_nuscenes.yaml")
    if args.no_remat:
        net = cfg["model"]["params"]["network_config"]["params"]
        net["use_checkpoint"] = False
        net["controlnet_config"]["params"]["use_checkpoint"] = False
    eng = instantiate_from_config(cfg["model"])
    t = eng.num_frames
    lh, lw, ih, iw = 32, 384, 256, 3072
    t0 = time.time()
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw),
                    image_hw=(ih, iw))
    print(f"init {time.time()-t0:.1f}s", flush=True)
    mp = eng.params["model"]
    B = 2 * t
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    x = jax.random.normal(ks[0], (B, lh, lw, 4))
    sigma = jnp.full((B,), 10.0)
    cond = {
        "crossattn": jax.random.normal(ks[1], (2, 77, 1024), jnp.bfloat16),
        "concat": jax.random.normal(ks[2], (B, lh, lw, 4)),
    }
    enc_hint = jax.jit(lambda p, cf: eng.model.apply(
        {"params": p}, cf, method=eng.model.encode_hint))
    cond["guided_hint"] = enc_hint(
        mp, jax.random.normal(ks[3], (B, ih, iw, 19), jnp.bfloat16))
    den = jax.jit(lambda p, x, s, c: eng.make_denoiser(p)(x, s, c))
    t0 = time.time()
    _force(den(mp, x, sigma, cond))
    print(f"compile+first {time.time()-t0:.1f}s", flush=True)
    for i in range(4):
        t0 = time.perf_counter()
        _force(den(mp, x, sigma, cond))
        print(f"eval {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
