"""Pallas TPU flash attention.

Replaces the reference's xformers/SDPA CUDA kernels (sgm/modules/attention.py:
363-365, 469-471, 590-592) with an online-softmax tiled kernel that never
materializes the (Sq, Skv) score matrix in HBM. One kernel serves all four
attention patterns of the decomposed 4D attention (intra-view, cross-view,
temporal, text cross-attn) — the patterns differ only in how the caller folds
views/frames into the batch dimension.

Layout: q (B, Sq, H, D), k/v (B, Skv, H, D). Internally (B*H, S, D) with the
query sequence tiled over the grid and K/V streamed in blocks through an
in-kernel ``fori_loop`` carrying (running-max, running-sum, accumulator) in VMEM.
bf16 inputs, fp32 softmax and accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                  block_k: int):
    """One (batch*head, q-block) grid cell: stream K/V blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    bq = q.shape[0]
    d = q.shape[1]
    kv_pad = k_ref.shape[1]
    num_kv_blocks = kv_pad // block_k
    needs_mask = kv_pad != kv_len

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        if needs_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(col + j * block_k < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """q: (B, Sq, H, D); k, v: (B, Skv, H, D) -> (B, Sq, H, D)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # fold heads into batch, sequence-major
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)

    bq = min(block_q, _round_up(sq, 8))
    bk = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, bk)
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        kt = jnp.pad(kt, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, skv_pad - skv), (0, 0)))

    grid = (b * h, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=skv, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(b * h) * (sq_pad * d + 2 * skv_pad * d + sq_pad * d)
            * q.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
        interpret=interpret,
    )(qt, kt, vt)

    out = out[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
