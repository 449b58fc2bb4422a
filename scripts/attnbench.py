"""Attention-kernel shootout at the model's hot shapes.

Times (jitted, median of 5): our Pallas flash kernel, the XLA einsum path,
and jax.experimental's reference TPU flash kernel, at every attention shape
the 25-step denoiser touches (B = 16 CFG frames, latent 32x384).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.ops.attention import attention_xla
from panacea_tpu.ops.flash_attention import flash_attention


def _force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# (name, B, Sq, Skv, H, D)
SHAPES = [
    ("intra ds1", 96, 2048, 2048, 5, 64),
    ("inter ds1", 96, 2048, 4096, 5, 64),
    ("text  ds1", 2, 98304, 77, 5, 64),
    ("temporal ds1", 24576, 8, 8, 5, 64),
    ("intra ds2", 96, 512, 512, 10, 64),
    ("inter ds2", 96, 512, 1024, 10, 64),
    ("text  ds2", 2, 24576, 77, 10, 64),
    ("intra ds4", 96, 128, 128, 20, 64),
    ("text  ds4", 2, 6144, 77, 20, 64),
    ("full  mid", 16, 192, 192, 20, 64),
]


def main():
    print(f"backend={jax.default_backend()}")
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )
        have_builtin = True
    except ImportError:
        have_builtin = False

    key = jax.random.PRNGKey(0)
    for name, b, sq, skv, h, d in SHAPES:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, skv, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, skv, h, d), jnp.bfloat16)
        flops = 4 * b * h * sq * skv * d

        ours = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        t_ours = timeit(ours, q, k, v)
        line = (f"{name:13s} B={b:<6d} Sq={sq:<6d} Skv={skv:<5d} H={h:<2d} | "
                f"ours {t_ours*1e3:7.2f} ms {flops/t_ours/1e12:6.1f} TF/s")

        # XLA einsum path (skip where the score matrix exceeds ~4 GB)
        score_bytes = 4 * b * h * sq * skv
        if score_bytes <= 4e9:
            xla = jax.jit(lambda q, k, v: attention_xla(q, k, v))
            t_xla = timeit(xla, q, k, v)
            line += f" | xla {t_xla*1e3:7.2f} ms"
        else:
            line += " | xla    skip   "

        if have_builtin and sq >= 128 and skv >= 128:
            # builtin wants (B, H, S, D)
            qb = q.transpose(0, 2, 1, 3)
            kb = k.transpose(0, 2, 1, 3)
            vb = v.transpose(0, 2, 1, 3)
            jf = jax.jit(lambda q, k, v: jax_flash(q, k, v, causal=False))
            try:
                t_jf = timeit(jf, qb, kb, vb)
                line += f" | jaxflash {t_jf*1e3:7.2f} ms"
            except Exception as e:
                line += f" | jaxflash ERR {type(e).__name__}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
