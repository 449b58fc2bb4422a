"""Capture a jax.profiler trace of one CFG denoiser eval and print the
top HLO ops by self time (parsed with tensorboard_plugin_profile)."""

import glob
import os
import sys

import jax
jax.config.update('jax_compilation_cache_dir',
                  '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.config import load_config
from panacea_tpu.registry import instantiate_from_config

TRACE_DIR = "/tmp/jtrace"


def main():
    print(f"backend={jax.default_backend()}")
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
    }
    enc_hint = jax.jit(lambda p, cf: eng.model.apply(
        {"params": p}, cf, method=eng.model.encode_hint))
    cond["guided_hint"] = enc_hint(
        mp, jax.random.normal(ks[3], (B, ih, iw, 19), jnp.bfloat16))
    den = jax.jit(lambda p, x, s, c: eng.make_denoiser(p)(x, s, c))
    out = den(mp, x, sigma, cond)
    np.asarray(out.reshape(-1)[0])  # warmup

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(2):
        out = den(mp, x, sigma, cond)
        np.asarray(out.reshape(-1)[0])
    jax.profiler.stop_trace()

    planes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                       recursive=True)
    print("xplanes:", planes)
    if not planes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "framework_op_stats", params={"tqx": "out:csv"})
    lines = data.splitlines() if isinstance(data, str) else []
    for ln in lines[:60]:
        print(ln)


if __name__ == "__main__":
    main()
