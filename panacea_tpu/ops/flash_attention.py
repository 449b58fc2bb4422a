"""Pallas TPU flash attention.

Replaces the reference's xformers/SDPA CUDA kernels (sgm/modules/attention.py:
363-365, 469-471, 590-592) with an online-softmax tiled kernel that never
materializes the (Sq, Skv) score matrix and never holds full K/V in VMEM:
K/V stream through a third (innermost, sequential) grid dimension while
running-max / running-sum / output accumulators persist in VMEM scratch.

One kernel serves all four patterns of the decomposed 4D attention
(intra-view, cross-view, temporal, text cross-attn) — the patterns differ only
in how the caller folds views/frames into the batch dimension.

Layout: q (B, Sq, H, D), k/v (B, Skv, H, D). bf16-in / fp32 softmax+accum.
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


def _flash_kernel(kv_lens_ref, q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc,
                  *, scale: float, kv_len: int, block_k: int, heads: int,
                  ragged: bool):
    """Grid (BH, nq, nk); kv dim iterates innermost with scratch carry.
    ``ragged``: per-row kv lengths in the scalar-prefetch ref (kv_lens_ref,
    indexed by batch row = BH // heads) mask the key tail — used by the
    inter-view attention where the last view attends to ONE neighbor
    (reference attention.py:545-559 dead-wraparound quirk)."""
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    # keep native (bf16) operands on the MXU; accumulate fp32, scale after.
    # softmax in base-2: fold log2(e) into the scale so exp becomes the
    # VPU-native exp2 — exp(s - m) == exp2(s*log2e - m*log2e) — at zero
    # extra elementwise work (the scale multiply was already there)
    q = q_ref[0]                                   # (BQ, D)
    k = k_ref[0]                                   # (BK, D)
    v = v_ref[0]                                   # (BK, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * 1.4426950408889634)  # (BQ, BK) fp32, log2-domain
    if ragged:
        row_len = kv_lens_ref[pl.program_id(0) // heads]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + kj * block_k < row_len, s, NEG_INF)
    elif kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + kj * block_k < kv_len, s, NEG_INF)

    m_prev = m_sc[:]
    l_prev = l_sc[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_sc[:] = acc_sc[:] * corr + pv
    m_sc[:] = m_new
    l_sc[:] = l_new

    @pl.when(kj == nk - 1)
    def _finalize():
        o_ref[0] = (acc_sc[:] / l_sc[:]).astype(o_ref.dtype)


def _pick_blocks(sq: int, skv: int, d: int,
                 vmem_budget: int = 8 * 1024 * 1024):
    """Grid-cell overhead dominates with small blocks (measured ~2us/cell on
    v5e); maximize block sizes within a VMEM budget:
    bytes ~= (bq + 2*bk) * d * 4 (pipelined io) + 4*bq*bk (scores) +
    4*bq*(d+2) (scratch)."""
    bq = min(1024, _round_up(sq, 8))
    bk = min(1024, _round_up(skv, 128))
    while True:
        cost = (bq + 2 * bk) * d * 8 + 4 * bq * bk + 4 * bq * (d + 16)
        if cost <= vmem_budget or (bq <= 128 and bk <= 128):
            break
        if bq >= bk and bq > 128:
            bq //= 2
        else:
            bk //= 2
    return bq, bk


def _lax_flash(qt: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
               scale: float, heads: int,
               kv_lens: Optional[jnp.ndarray] = None,
               block_k: int = 512) -> jnp.ndarray:
    """Streamed attention in plain lax for non-TPU backends.

    Same online-softmax recurrence as ``_flash_kernel`` (base-2 domain,
    fp32 accumulators, per-chunk masking), expressed as a ``lax.scan`` over
    KV chunks so no backend ever materializes the full (Sq, Skv) score
    matrix. This keeps CPU-backend compiles of the production programs
    memory-representative of the TPU path: interpret-mode pallas used to
    lower to full-size f32 score buffers (observed 0.94 GiB each in the
    sharded production sampler's HLO), inflating the per-device temp
    estimate the multichip dryrun reports.
    """
    bh, sq, d = qt.shape
    skv = kt.shape[1]
    bk = min(block_k, _round_up(skv, 128))
    skv_pad = _round_up(skv, bk)
    if skv_pad != skv:
        kt = jnp.pad(kt, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, skv_pad - skv), (0, 0)))
    if kv_lens is not None:
        row_len = jnp.repeat(kv_lens.astype(jnp.int32), heads)      # (BH,)
    else:
        row_len = jnp.full((bh,), skv, jnp.int32)
    log2e = 1.4426950408889634

    def body(carry, j):
        m_prev, l_prev, acc = carry
        ks = jax.lax.dynamic_slice_in_dim(kt, j * bk, bk, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(vt, j * bk, bk, axis=1)
        s = jax.lax.dot_general(
            qt, ks, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (scale * log2e)                                    # (BH, Sq, BK)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, bk), 2) + j * bk
        s = jnp.where(col < row_len[:, None, None], s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vs.dtype), vs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc * corr + pv), None

    m0 = jnp.full((bh, sq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bh, sq, 1), jnp.float32)
    acc0 = jnp.zeros((bh, sq, d), jnp.float32)
    (_, l, acc), _ = jax.lax.scan(
        body, (m0, l0, acc0), jnp.arange(skv_pad // bk))
    return (acc / l).astype(qt.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    kv_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q: (B, Sq, H, D); k, v: (B, Skv, H, D) -> (B, Sq, H, D).

    ``kv_lens``: optional (B,) int32 per-row valid key counts (ragged KV)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5

    # fold heads into batch, sequence-major
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)

    if interpret is None:
        if jax.default_backend() != "tpu":
            # off-TPU default: the streamed plain-lax path (same math,
            # bounded score chunks). Pass interpret=True explicitly to
            # exercise the pallas kernel itself under the interpreter
            # (kernel-exactness tests).
            out = _lax_flash(qt, kt, vt, scale, h, kv_lens)
            return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
        interpret = False

    auto_bq, auto_bk = _pick_blocks(sq, skv, d)
    bq = min(block_q or auto_bq, _round_up(sq, 8))
    bk = min(block_k or auto_bk, _round_up(skv, 128))
    sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, bk)
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        kt = jnp.pad(kt, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, skv_pad - skv), (0, 0)))

    ragged = kv_lens is not None
    kv_lens_arr = (kv_lens.astype(jnp.int32) if ragged
                   else jnp.zeros((b,), jnp.int32))

    grid = (b * h, sq_pad // bq, skv_pad // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, i, j, kvl: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, i, j, kvl: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, i, j, kvl: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, i, j, kvl: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=skv, block_k=bk,
                          heads=h, ragged=ragged),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(b * h) * (sq_pad * d + 2 * skv_pad * d
                                      + sq_pad * d) * q.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens_arr, qt, kt, vt)

    out = out[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
