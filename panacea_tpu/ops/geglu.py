"""Fused GEGLU projection: y = (x @ W1 + b1) * gelu(x @ W2 + b2).

The reference computes the GEGLU feed-forward (attention.py:92-115) as one
(C -> 2*inner) projection, a split, and an elementwise gate. At production
geometry the 2*inner intermediate is ~2 GB bf16 per call — written by the
dot and re-read by the gate, making the FF stage HBM-bound (profiled: the
elementwise tail is ~1/3 of the denoiser eval). This Pallas kernel computes
both halves tile-by-tile in VMEM and writes ONLY the gated (tokens, inner)
result: ~4 GB of HBM traffic saved per ds1 call.

Weight layout matches flax Dense: W (C, 2*inner) with [h | gate] halves,
bias (2*inner,). Exact (erf) GELU, matching torch F.gelu.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_GEGLU_OVERRIDE: Optional[bool] = None


def set_geglu_impl(use_pallas: Optional[bool]) -> None:
    """Force (True/False) or reset (None) the fused-Pallas GEGLU path —
    independent of the attention impl switch: on v5e the fused GEGLU beats
    XLA (5.5 vs 7.3 ms at the ds1 production shape) even where XLA's fused
    attention beats the flash kernel."""
    global _GEGLU_OVERRIDE
    _GEGLU_OVERRIDE = use_pallas


def use_pallas_geglu() -> bool:
    if _GEGLU_OVERRIDE is not None:
        return _GEGLU_OVERRIDE
    return jax.default_backend() == "tpu"


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7 —
    far below bf16 resolution); Pallas TPU has no erf lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _geglu_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    g = jax.lax.dot_general(
        x, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    o_ref[...] = (h * _gelu_exact(g)).astype(o_ref.dtype)


def _pick_tiles(tokens: int, c: int, inner: int,
                isx: int, isw: int) -> tuple:
    """Choose (bm, bn) under the scoped-VMEM budget.

    Budget per grid cell: double-buffered x tile (bm, c) and two weight
    tiles (c, bn) at their REAL itemsizes, the output tile (bm, bn) at the
    x itemsize, plus the two fp32 h/g accumulators (8 * bm * bn). Mosaic's
    hard stack limit is 16 MB/core; target 12 MB to leave headroom for the
    kernel's own temporaries.
    """
    bm = min(1024, _round_up(tokens, 8))

    def _shrink_bn(cur):
        # largest divisor of inner strictly below cur. Mosaic requires the
        # last block dim to be a multiple of 128 (or the full array dim —
        # impossible here: the w blocks span HALF of w's 2*inner axis), so
        # when inner allows it only 128-multiples are candidates; widths
        # like 1250 keep the plain-divisor search (the TPU path falls back
        # to the unfused form for them — see geglu_matmul).
        if inner % 128 == 0:
            for d in range((min(cur - 1, inner)) // 128 * 128, 0, -128):
                if inner % d == 0:
                    return d
            return 128
        for d in range(min(cur - 1, inner), 0, -1):
            if inner % d == 0:
                return d
        return 1

    bn = 640 if inner % 640 == 0 else (256 if inner % 256 == 0 else inner)
    while True:
        vmem = (2 * (bm * c * isx + 2 * c * bn * isw + bm * bn * isx)
                + 8 * bm * bn)
        if vmem <= 12 * 1024 * 1024 or (bm <= 256 and bn <= 256):
            break
        if bm > 256:
            bm //= 2
        else:
            bn = _shrink_bn((bn + 1) // 2 + 1)
    assert inner % bn == 0, (inner, bn)
    assert inner % 128 != 0 or bn % 128 == 0, (inner, bn)
    return bm, bn


@functools.partial(jax.jit, static_argnames=("interpret",))
def geglu_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x: (..., C); w: (C, 2*inner) = [W_h | W_gate]; b: (2*inner,).
    Returns (..., inner) = (x@W_h + b_h) * gelu_exact(x@W_gate + b_gate)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    c = orig_shape[-1]
    inner = w.shape[1] // 2
    if not interpret and inner % 128 != 0:
        # Mosaic needs the last block dim %128 and the w blocks can never be
        # the full 2*inner array dim — no legal tiling exists; unfused XLA
        # form (same flax-Dense semantics, true erf) instead of a compile
        # error on the real chip.
        return geglu_reference(x, w, b)
    x2 = x.reshape(-1, c)
    tokens = x2.shape[0]

    # big tiles: ~2us fixed cost per grid cell on v5e dwarfs the arithmetic
    # at small blocks (512x256 tile = 168 MF = 0.9us of MXU work). Tile by
    # the REAL itemsizes: with the 2-byte (bf16) constant that used to sit
    # in the budget formula, an fp32 call at the ds1 production shape
    # (tokens 49152, c 320, inner 1280 -> bm 1024, bn 640) estimated
    # 10.8 MB but actually needs ~16.4 MB and the Mosaic scoped-vmem
    # allocator rejects it (observed: "16.06M and limit 16.00M" in the
    # fp32-reference leg of scripts/bf16_drift.py)
    bm, bn = _pick_tiles(tokens, c, inner,
                         jnp.dtype(x.dtype).itemsize,
                         jnp.dtype(w.dtype).itemsize)
    tok_pad = _round_up(tokens, bm)
    if tok_pad != tokens:
        x2 = jnp.pad(x2, ((0, tok_pad - tokens), (0, 0)))
    nj = inner // bn
    ni = tok_pad // bm

    b2d = b.reshape(1, 2 * inner)
    out = pl.pallas_call(
        _geglu_kernel,
        # j outer so each weight tile stays VMEM-resident across the full
        # token sweep (W re-read once per j, x re-read nj times — W is the
        # small operand)
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((bm, c), lambda j, i: (i, 0)),
            pl.BlockSpec((c, bn), lambda j, i: (0, j)),
            pl.BlockSpec((c, bn), lambda j, i: (0, j + nj)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j + nj)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((tok_pad, inner), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * tok_pad * c * inner,
            bytes_accessed=(tok_pad * c * nj + 2 * c * inner
                            + tok_pad * inner) * x.dtype.itemsize,
            transcendentals=tok_pad * inner,
        ),
        interpret=interpret,
    )(x2, w, w, b2d, b2d)
    if tok_pad != tokens:
        out = out[:tokens]
    return out.reshape(orig_shape[:-1] + (inner,))


def geglu_reference(x, w, b):
    """Unfused reference (flax-Dense semantics, TRUE erf) for tests/CPU —
    also validates the kernel's erf approximation against exact."""
    h = x @ w + b
    hh, gate = jnp.split(h, 2, axis=-1)
    return hh * (0.5 * gate * (1.0 + jax.lax.erf(gate * 0.7071067811865476)))
