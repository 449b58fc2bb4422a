"""Amortized flash-kernel timing: chains ITERS dependent calls inside one jit
so the ~30 ms per-dispatch tunnel overhead is paid once, giving true kernel
wall time per call."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from panacea_tpu.ops.flash_attention import flash_attention

ITERS = 16


def bench(name, b, sq, skv, h, d, ragged=False):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, skv, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, skv, h, d), jnp.bfloat16)
    kv_lens = (jnp.full((b,), skv, jnp.int32) if ragged else None)

    @jax.jit
    def chained(q, k, v):
        def body(i, acc):
            o = flash_attention(acc, k, v, kv_lens=kv_lens)
            return o.astype(acc.dtype)
        return jax.lax.fori_loop(0, ITERS, body, q)

    out = chained(q, k, v)
    np.asarray(out.reshape(-1)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(q, k, v)
        np.asarray(out.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    dt = (float(np.median(ts))) / ITERS
    flops = 4 * b * h * sq * skv * d
    print(f"{name:16s} {dt*1e3:7.2f} ms/call {flops/dt/1e12:6.1f} TF/s",
          flush=True)


def main():
    print(f"backend={jax.default_backend()}")
    bench("intra ds1", 96, 2048, 2048, 5, 64)
    bench("inter ds1 ragged", 96, 2048, 4096, 5, 64, ragged=True)
    bench("text  ds1", 2, 98304, 77, 5, 64)
    bench("intra ds2", 96, 512, 512, 10, 64)


if __name__ == "__main__":
    main()
