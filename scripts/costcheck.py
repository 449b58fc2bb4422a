"""Print XLA cost analysis (FLOPs, bytes) for one CFG denoiser eval, and the
implied utilization at the measured wall time — tells whether to chase
utilization or to cut work.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.config import load_config
from panacea_tpu.registry import instantiate_from_config


def main():
    print(f"backend={jax.default_backend()}")
    cfg = load_config("panacea_tpu/configs/inference_nuscenes.yaml")
    eng = instantiate_from_config(cfg["model"])
    t = eng.num_frames
    lh, lw, ih, iw = 32, 384, 256, 3072
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw), image_hw=(ih, iw))
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
    gh = enc_hint(mp, jax.random.normal(ks[3], (B, ih, iw, 19), jnp.bfloat16))
    cond["guided_hint"] = gh

    den = jax.jit(lambda p, x, s, c: eng.make_denoiser(p)(x, s, c))
    lowered = den.lower(mp, x, sigma, cond)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    print(f"flops: {flops/1e12:.2f} TFLOP")
    print(f"bytes accessed: {bytes_acc/1e9:.2f} GB")
    # time it
    out = den(mp, x, sigma, cond)
    np.asarray(out.reshape(-1)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = den(mp, x, sigma, cond)
        np.asarray(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"wall: {dt*1000:.0f} ms -> {flops/dt/1e12:.1f} TFLOP/s "
          f"({bytes_acc/dt/1e9:.0f} GB/s)")
    # memory-space stats if present
    for k in sorted(ca):
        if "bytes" in k and k != "bytes accessed":
            v = ca[k]
            if v > 1e8:
                print(f"  {k}: {v/1e9:.2f} GB")


if __name__ == "__main__":
    main()
