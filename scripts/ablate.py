"""Ablation timing: where does the 1.5 s CFG denoiser eval go?

Monkeypatches one component family at a time to identity and re-times the
full denoiser eval (fresh init per variant — timing is weight-agnostic).
The difference vs baseline attributes wall time to that family, including
the fusion/layout effects a standalone microbenchmark can't see.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_denoiser():
    from panacea_tpu.config import load_config
    from panacea_tpu.registry import instantiate_from_config

    cfg = load_config("panacea_tpu/configs/inference_nuscenes.yaml")
    eng = instantiate_from_config(cfg["model"])
    t = eng.num_frames
    lh, lw, ih, iw = 32, 384, 256, 3072
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw),
                    image_hw=(ih, iw))
    mp = eng.params["model"]
    B = 2 * t
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    x = jax.random.normal(ks[0], (B, lh, lw, 4))
    sigma = jnp.full((B,), 10.0)
    cond = {
        "crossattn": jax.random.normal(ks[1], (2, 77, 1024), jnp.bfloat16),
        "concat": jax.random.normal(ks[2], (B, lh, lw, 4)),
        "guided_hint": None,
    }
    enc_hint = jax.jit(lambda p, cf: eng.model.apply(
        {"params": p}, cf, method=eng.model.encode_hint))
    cond["guided_hint"] = enc_hint(
        mp, jax.random.normal(ks[3], (B, ih, iw, 19), jnp.bfloat16))
    den = jax.jit(lambda p, x, s, c: eng.make_denoiser(p)(x, s, c))
    return timeit(den, mp, x, sigma, cond)


def main():
    print(f"backend={jax.default_backend()}")
    import panacea_tpu.models.layers as L
    import panacea_tpu.models.transformer as TR

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}

    def run(name):
        dt = time_denoiser()
        results[name] = dt
        print(f"{name:24s} {dt*1000:7.0f} ms", flush=True)

    if which in ("all", "baseline"):
        run("baseline")

    if which in ("all", "attn"):
        # the model resolves `attention` through transformer.py's globals
        orig = TR.attention
        TR.attention = lambda q, k, v, scale=None, impl=None, kv_lens=None: q
        run("attention=identity")
        TR.attention = orig

    if which in ("all", "gn"):
        orig = L.GroupNorm.__call__
        L.GroupNorm.__call__ = lambda self, x: x
        run("spatial GN=identity")
        L.GroupNorm.__call__ = orig

    if which in ("all", "tgn"):
        orig = L.TemporalGroupNorm.__call__
        L.TemporalGroupNorm.__call__ = lambda self, x: x
        run("temporal GN=identity")
        L.TemporalGroupNorm.__call__ = orig

    if which in ("all", "tconv"):
        orig = L.TemporalConv.__call__
        L.TemporalConv.__call__ = lambda self, x: x
        run("temporal conv=identity")
        L.TemporalConv.__call__ = orig

    if "baseline" in results:
        base = results["baseline"]
        for k, v in results.items():
            if k != "baseline":
                print(f"  {k}: {1000*(base-v):+.0f} ms attribution")


if __name__ == "__main__":
    main()
