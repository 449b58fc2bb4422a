"""Fused GroupNorm(+SiLU) — single-pass stats, no fp32 materialization.

The reference GroupNorm32 (sgm/modules/diffusionmodules/util.py:292-294)
casts to fp32, runs torch GroupNorm, casts back. Translating that literally
(x.astype(f32) -> nn.GroupNorm) costs three sequential passes on TPU: a mean
reduce, a variance reduce over (x - mean)^2, and the normalize/affine pass —
plus XLA materializes the fp32 copy feeding them (~150 ms/denoiser-eval of
HBM traffic at production geometry, docs/PERF.md).

Here the fp32 island is preserved *algebraically* instead: sum and
sum-of-squares are computed in ONE multi-output reduce with fp32
accumulation directly from the (bf16) input, var = E[x^2] - mean^2, and the
normalize + affine + optional SiLU fuse into a single elementwise pass —
2 reads + 1 write total, bf16 on the wire.

Two layouts, matching models/layers.py:
- ``group_norm``: standard spatial GN — stats per (n, group) over
  (H, W, C/G).
- ``temporal_group_norm``: the reference temporal sub-block rearranges to
  (b·h·w, C, T) before normalization (openaimodel.py:415-419, 508-515), so
  stats are PER PIXEL over (T, C/G).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _stats(xg: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (mean, var) over ``axes`` via one fused sum/sum-sq pass.

    E[x^2]-E[x]^2 lets XLA compute both moments in a single multi-output
    reduce fusion over the raw (bf16) input, instead of the sequential
    mean -> (x-mean)^2 passes of nn.GroupNorm."""
    cnt = 1.0
    for a in axes:
        cnt *= xg.shape[a]
    s1 = jnp.sum(xg, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(xg.astype(jnp.float32)), axis=axes)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
    return mean, var


def _group_onehot(g: int, cg: int, dtype) -> jnp.ndarray:
    """(C, G) one-hot group-membership matrix (M[i, i // cg] = 1)."""
    return jnp.repeat(jnp.eye(g, dtype=dtype), cg, axis=0)


def _stats_matmul(x3: jnp.ndarray, g: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (mean, var) per (n, group) from x3 (N, S, C).

    The within-group channel axis lives in the LANE dimension on TPU, so a
    plain reduce over it is a strided cross-lane shuffle; contracting C
    against a (C, G) one-hot on the MXU instead turns the group reduction
    into a matmul and leaves only the fast sublane reduce over S
    (docs/PERF.md round-3 lever #1)."""
    n, s, c = x3.shape
    cg = c // g
    m = _group_onehot(g, cg, x3.dtype)
    s1 = jnp.einsum("nsc,cd->nd", x3, m,
                    preferred_element_type=jnp.float32)
    s2 = jnp.einsum("nsc,cd->nd", jnp.square(x3), m,
                    preferred_element_type=jnp.float32)
    cnt = float(s * cg)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
    return mean, var


def group_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = False,
) -> jnp.ndarray:
    """Spatial GroupNorm on (N, H, W, C) (or (N, L, C)); returns x.dtype.

    Stats per (sample, group) in fp32; normalize+affine(+SiLU) fused into
    one elementwise pass."""
    orig_shape, orig_dtype = x.shape, x.dtype
    c = orig_shape[-1]
    g = num_groups if c % num_groups == 0 else c
    cg = c // g
    n = orig_shape[0]
    x3 = x.reshape(n, -1, c)
    mean, var = _stats_matmul(x3, g)                    # (n, g)
    rstd = jax.lax.rsqrt(var + eps)
    xg = x3.reshape(n, -1, g, cg)
    mean = mean[:, None, :, None]
    rstd = rstd[:, None, :, None]
    y = (xg.astype(jnp.float32) - mean) * rstd
    y = y.reshape(n, -1, c)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(orig_shape).astype(orig_dtype)


def temporal_group_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    num_frames: int,
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = False,
) -> jnp.ndarray:
    """Temporal-layout GroupNorm on (B*T, H, W, C): stats per (b, pixel,
    group) over (T, C/G) — the reference's per-pixel statistics from its
    (b·h·w, C, T) rearrange (openaimodel.py:415-419)."""
    n, h, w, c = x.shape
    t = num_frames
    b = n // t
    g = num_groups if c % num_groups == 0 else c
    cg = c // g
    # per-pixel stats over (T, C/G): one-hot matmul over C on the MXU, then
    # a major-axis reduce over T
    m = _group_onehot(g, cg, x.dtype)
    x4 = x.reshape(b, t, h * w, c)
    s1 = jnp.einsum("btsc,cd->bsd", x4, m,
                    preferred_element_type=jnp.float32)
    s2 = jnp.einsum("btsc,cd->bsd", jnp.square(x4), m,
                    preferred_element_type=jnp.float32)
    cnt = float(t * cg)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
    xg = x.reshape(b, t, h * w, g, cg)
    rstd = jax.lax.rsqrt(var + eps)
    mean = mean[:, None, :, :, None]
    rstd = rstd[:, None, :, :, None]
    y = (xg.astype(jnp.float32) - mean) * rstd
    y = y.reshape(b, t, h * w, c)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(n, h, w, c).astype(x.dtype)
