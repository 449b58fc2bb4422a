"""Standalone sweeps of the two custom kernels at production shapes."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from panacea_tpu.ops.flash_attention import flash_attention
from panacea_tpu.ops.geglu import geglu_matmul


def timeit(fn, *args, n=20):
    sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    out = fn(*args)
    np.asarray(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(sync(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)

    # ---- GEGLU ds1: tokens 196608, 320 -> 2*1280
    T, C, I = 16 * 12288, 320, 1280
    x = jax.random.normal(ks[0], (T, C), jnp.bfloat16)
    w = jax.random.normal(ks[1], (C, 2 * I), jnp.bfloat16) * 0.02
    b = jnp.zeros((2 * I,), jnp.bfloat16)
    flg = 2 * T * C * 2 * I / 1e12
    t = timeit(jax.jit(geglu_matmul), x, w, b)
    print(f"geglu new-blocks {t:7.2f} ms  {flg/t*1e3:6.1f} TF/s", flush=True)

    def dense(x, w):
        return x @ w
    t = timeit(jax.jit(dense), x, w)
    print(f"dense same shape {t:7.2f} ms  {flg/t*1e3:6.1f} TF/s", flush=True)

    # half-size dense (the 'useful half' reference point)
    t = timeit(jax.jit(dense), x, w[:, :I])
    print(f"dense half       {t:7.2f} ms", flush=True)

    # ---- flash inter: B=80, S=2048, KV=4096, H=5, D=64
    B, S, KV, H, D = 80, 2048, 4096, 5, 64
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, KV, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, KV, H, D), jnp.bfloat16)
    fl = 4 * B * H * S * KV * D / 1e12
    t = timeit(jax.jit(flash_attention), q, k, v)
    print(f"flash inter auto {t:7.2f} ms  {fl/t*1e3:6.1f} TF/s", flush=True)
    for bq, bk in [(512, 2048), (256, 4096), (1024, 2048), (512, 4096),
                   (2048, 2048)]:
        try:
            t = timeit(jax.jit(functools.partial(
                flash_attention, block_q=bq, block_k=bk)), q, k, v)
            print(f"flash inter {bq:4d}x{bk:<4d} {t:7.2f} ms  "
                  f"{fl/t*1e3:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"flash inter {bq}x{bk} FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
