"""Component-level TPU microbenchmark: locates where the clip seconds go.

Times (jitted, after warmup):
  - one full CFG denoiser eval (the 25x repeated unit)
  - UNet alone vs ControlNet branch alone
  - hint stack, VAE decode/encode, flash attention at hot shapes
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.config import load_config
from panacea_tpu.registry import instantiate_from_config


def _force(x):
    """block_until_ready can be a no-op through the axon tunnel; force a host
    readback of one element instead."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[0])


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"backend={jax.default_backend()}")
    cfg = load_config("panacea_tpu/configs/inference_nuscenes.yaml")
    eng = instantiate_from_config(cfg["model"])
    t = eng.num_frames
    lh, lw, ih, iw = 32, 384, 256, 3072
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw),
                    image_hw=(ih, iw))
    mp = eng.params["model"]
    B = 2 * t  # CFG batch

    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (B, lh, lw, 4))
    sigma = jnp.full((B,), 10.0)
    cond = {
        "crossattn": jax.random.normal(ks[1], (2, 77, 1024), jnp.bfloat16),
        "concat": jax.random.normal(ks[2], (B, lh, lw, 4)),
        "cond_feat": jax.random.normal(ks[3], (B, ih, iw, 19), jnp.bfloat16),
    }

    # hint stack
    enc_hint = jax.jit(lambda p, cf: eng.model.apply(
        {"params": p}, cf, method=eng.model.encode_hint))
    dt = timeit(enc_hint, mp, cond["cond_feat"])
    print(f"hint_stack (B={B}): {dt*1000:.0f} ms")
    gh = enc_hint(mp, cond["cond_feat"])
    cond_gh = {k: v for k, v in cond.items() if k != "cond_feat"}
    cond_gh["guided_hint"] = gh

    # full denoiser eval (one sampler step's network work)
    den = jax.jit(lambda p, x, s, c: eng.make_denoiser(p)(x, s, c))
    dt_full = timeit(den, mp, x, sigma, cond_gh)
    print(f"denoiser eval (UNet+ControlNet, B={B}): {dt_full*1000:.0f} ms "
          f"-> x25 = {dt_full*25:.1f}s")

    # UNet alone (no control)
    unet_only = jax.jit(lambda p, x, s, c: eng.model.apply(
        {"params": p},
        jnp.concatenate([x, c["concat"]], -1).astype(eng.dtype), s,
        c["crossattn"]))
    dt_u = timeit(unet_only, mp, x, sigma, cond_gh)
    print(f"UNet alone: {dt_u*1000:.0f} ms")

    # VAE decode / encode (8 panorama frames)
    z = jax.random.normal(ks[4], (t, lh, lw, 4))
    dec = jax.jit(lambda fp, z: eng.decode_impl(fp, z))
    dt_d = timeit(dec, eng.params["first_stage"], z)
    print(f"VAE decode x{t}: {dt_d*1000:.0f} ms")
    img = jax.random.normal(ks[5], (t, ih, iw, 3))
    enc = jax.jit(lambda fp, x: eng.encode_impl(fp, x, jax.random.PRNGKey(0)))
    dt_e = timeit(enc, eng.params["first_stage"], img)
    print(f"VAE encode x{t}: {dt_e*1000:.0f} ms")

    # flash attention at the hot spatial shape: intra-view ds1
    from panacea_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(ks[6], (B * 6, 2048, 5, 64), jnp.bfloat16)
    fa = jax.jit(lambda q: flash_attention(q, q, q))
    dt_a = timeit(fa, q)
    flops = 4 * (B * 6) * 5 * 2048 * 2048 * 64
    print(f"flash intra-view ds1 (B*6={B*6}, 2048 tok): {dt_a*1000:.1f} ms "
          f"({flops/dt_a/1e12:.1f} TFLOP/s)")

    # text cross-attn shape
    qt = jax.random.normal(ks[7], (2, 8 * 12288, 5, 64), jnp.bfloat16)
    kv = jax.random.normal(ks[7], (2, 77, 5, 64), jnp.bfloat16)
    fa2 = jax.jit(lambda q, k: flash_attention(q, k, k))
    dt_a2 = timeit(fa2, qt, kv)
    print(f"flash text cross (98k q, 77 kv): {dt_a2*1000:.1f} ms")

    est = dt_full * 25 + dt_d + dt_e
    print(f"estimated clip total: {est:.1f}s")


if __name__ == "__main__":
    main()
