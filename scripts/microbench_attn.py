"""Microbenchmark the production attention/GEGLU shapes on the real TPU.

Shapes are the level-1 (32x384 latent) denoiser sites, the hot 60% of
pallas time in the op profile: intra-view (S=KV=2048), inter-view ragged
(S=2048, KV=4096, last view masked to 2048), text cross (KV=77), and the
GEGLU projection. Compares our kernel, XLA, and jax's built-in TPU flash.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from panacea_tpu.ops.attention import attention_xla
from panacea_tpu.ops.flash_attention import flash_attention
from panacea_tpu.ops.geglu import geglu_matmul


def timeit(fn, *args, n=20):
    # axon: block_until_ready doesn't flush the tunnel; force a host copy
    sync = jax.jit(lambda o: jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    out = fn(*args)
    np.asarray(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(sync(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("backend", jax.default_backend())
    key = jax.random.PRNGKey(0)

    # ---- intra-view: B=96 (16 frames x 6 views), S=KV=2048, H=5, D=64
    B, S, H, D = 96, 2048, 5, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    fl = 4 * B * H * S * S * D / 1e12

    t = timeit(jax.jit(flash_attention), q, k, v)
    print(f"intra ours      {t:7.2f} ms  {fl/t*1e3:6.1f} TF/s")
    for bq, bk in [(512, 1024), (256, 2048), (512, 2048), (1024, 2048),
                   (2048, 512), (2048, 1024)]:
        t = timeit(jax.jit(functools.partial(
            flash_attention, block_q=bq, block_k=bk)), q, k, v)
        print(f"intra ours {bq:4d}x{bk:<4d} {t:7.2f} ms  {fl/t*1e3:6.1f} TF/s")
    t = timeit(jax.jit(attention_xla), q, k, v)
    print(f"intra xla       {t:7.2f} ms  {fl/t*1e3:6.1f} TF/s")

    # jax built-in: wants (b, h, s, d)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as jfa)
    qb = q.transpose(0, 2, 1, 3)
    kb = k.transpose(0, 2, 1, 3)
    vb = v.transpose(0, 2, 1, 3)
    jf = jax.jit(functools.partial(jfa, causal=False, sm_scale=D**-0.5))
    t = timeit(jf, qb, kb, vb)
    print(f"intra jax-flash {t:7.2f} ms  {fl/t*1e3:6.1f} TF/s (excl transposes)")

    def jfa_full(q, k, v):
        o = jfa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), causal=False, sm_scale=D**-0.5)
        return o.transpose(0, 2, 1, 3)
    t = timeit(jax.jit(jfa_full), q, k, v)
    print(f"intra jax-flash {t:7.2f} ms  {fl/t*1e3:6.1f} TF/s (incl transposes)")

    # ---- inter-view: B=96, S=2048, KV=4096 ragged (5/6 rows full, 1/6 half)
    KV = 4096
    k2 = jax.random.normal(ks[1], (B, KV, H, D), jnp.bfloat16)
    v2 = jax.random.normal(ks[2], (B, KV, H, D), jnp.bfloat16)
    kv_lens = jnp.tile(jnp.asarray([KV] * 5 + [KV // 2], jnp.int32), 16)
    fl2 = 4 * B * H * S * KV * D / 1e12
    t = timeit(jax.jit(flash_attention), q, k2, v2, None, None, None, None,
               kv_lens)
    print(f"inter ours      {t:7.2f} ms  {fl2/t*1e3:6.1f} TF/s")
    t = timeit(jax.jit(jfa_full), q, k2, v2)
    print(f"inter jax-flash {t:7.2f} ms  {fl2/t*1e3:6.1f} TF/s (no mask)")

    # ---- text cross: folded frames. B=2 clips, Sq=8*12288, KV=77
    Bq, Sq, KVt = 2, 8 * 12288, 77
    qt = jax.random.normal(ks[0], (Bq, Sq, H, D), jnp.bfloat16)
    kt = jax.random.normal(ks[1], (Bq, KVt, H, D), jnp.bfloat16)
    vt = jax.random.normal(ks[2], (Bq, KVt, H, D), jnp.bfloat16)
    t = timeit(jax.jit(flash_attention), qt, kt, vt)
    print(f"cross ours      {t:7.2f} ms")
    t = timeit(jax.jit(attention_xla), qt, kt, vt)
    print(f"cross xla       {t:7.2f} ms")

    # ---- GEGLU: tokens=196608, 320 -> 2*1280, gelu-gate
    T, C, I = 16 * 12288, 320, 1280
    x = jax.random.normal(ks[0], (16, 12288, C), jnp.bfloat16)
    w = jax.random.normal(ks[1], (C, 2 * I), jnp.bfloat16) * 0.02
    b = jnp.zeros((2 * I,), jnp.bfloat16)
    flg = 2 * T * C * 2 * I / 1e12

    t = timeit(jax.jit(geglu_matmul), x, w, b)
    print(f"geglu ours      {t:7.2f} ms  {flg/t*1e3:6.1f} TF/s")

    def geglu_xla(x, w, b):
        h = x @ w + b
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)
    t = timeit(jax.jit(geglu_xla), x, w, b)
    print(f"geglu xla       {t:7.2f} ms  {flg/t*1e3:6.1f} TF/s")

    # dense-only reference rate at this shape
    t = timeit(jax.jit(lambda x, w: x @ w), x, w)
    print(f"dense xla       {t:7.2f} ms  {flg/t*1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
