"""Multi-head attention ops: public API + XLA reference implementation.

The reference model leans on xformers ``memory_efficient_attention`` / torch SDPA
CUDA kernels (sgm/modules/attention.py:363-365, 469-471, 590-592). Here the hot
path is a Pallas TPU flash-attention kernel (panacea_tpu/ops/flash_attention.py);
the XLA einsum path is the numerical reference and the CPU/testing fallback.

Layout convention: ``q: (B, Sq, H, D)``, ``k/v: (B, Skv, H, D)`` (sequence-major,
heads folded late) — channels-last keeps XLA layouts clean on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL_OVERRIDE: Optional[str] = None


def set_attention_impl(impl: Optional[str]) -> None:
    """Globally force an implementation: 'xla', 'pallas', 'streamed', or
    None for auto."""
    global _IMPL_OVERRIDE
    assert impl in (None, "xla", "pallas", "streamed")
    _IMPL_OVERRIDE = impl


def default_impl() -> str:
    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    platform = jax.default_backend()
    # non-TPU: 'streamed' bounds score buffers at production sequence
    # lengths the way the TPU path does (XLA:TPU fuses softmax-attention
    # in-graph for Skv<=Sq and Pallas streams the rest; XLA:CPU has no such
    # fusion and materializes the full f32 score tensor — which used to
    # dominate the multichip dryrun's temp-memory estimate). Small shapes
    # keep the exact einsum reference path.
    return "pallas" if platform == "tpu" else "streamed"


def attention_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference softmax attention; fp32 softmax island for bf16 inputs.
    ``kv_lens``: optional (B,) valid key counts (ragged KV)."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if kv_lens is not None:
        col = jnp.arange(k.shape[1], dtype=jnp.int32)
        mask = col[None, None, None, :] < kv_lens[:, None, None, None]
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def attention_partial_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
):
    """One KV block of a flash-style decomposition of softmax attention.

    Returns ``(out_un (B,Sq,H,D), m (B,Sq,H) f32, den (B,Sq,H) f32)`` such
    that normalized attention over the union of several KV blocks is
    recovered by the online-softmax combine identity (see
    ``merge_attention_partials``). Used by the ring cross-view path
    (parallel/ring_attention.py) on non-TPU backends, where the progressive
    per-block merge IS ring attention and the alternative (one ragged call
    over the gathered 2S KV) materializes the f32 (.., S, 2S) score tensor.
    NOT used on the TPU hot path: the separated exp/max/sum form does not
    pattern-match XLA's in-graph attention fusion and the f32 merge traffic
    measured ~4x slower than the Pallas flash kernel for the inter-view
    stage (docs/PERF.md round-3 measurements).
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    m = jax.lax.stop_gradient(logits.max(-1))  # as jax.nn.softmax does
    p = jnp.exp(logits - m[..., None])
    out_un = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    den = p.sum(-1)
    return out_un, m.transpose(0, 2, 1), den.transpose(0, 2, 1)


def attention_partial_streamed(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    block_k: int = 512,
):
    """``attention_partial_xla`` with the KV block itself streamed.

    Same ``(out_un (B,Sq,H,D), m (B,Sq,H) f32, den (B,Sq,H) f32)`` contract
    (so ``merge_attention_partials`` applies unchanged), computed by a
    ``lax.scan`` over KV chunks — never materializes the (B,H,Sq,Skv) f32
    score tensor. This is what keeps the CPU-backend ring cross-view path
    (and its compile-time temp-memory estimates) representative of the TPU
    path, where the ragged Pallas kernel streams by construction: at
    production shape each materialized per-block score tensor is
    0.94 GiB/device in the sharded sampler's HLO."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = d**-0.5 if scale is None else scale

    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    bk = min(block_k, skv)
    pad = (-skv) % bk
    if pad:
        kt = jnp.pad(kt, ((0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, pad), (0, 0)))

    def body(carry, j):
        m_prev, den_prev, acc = carry
        ks = jax.lax.dynamic_slice_in_dim(kt, j * bk, bk, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(vt, j * bk, bk, axis=1)
        s = jax.lax.dot_general(
            qt, ks, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                           # (BH, Sq, bk)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2) + j * bk
        s = jnp.where(col < skv, s, -1e30)
        m_cur = jax.lax.stop_gradient(jnp.max(s, axis=-1))
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m_prev - m_new)
        den_new = den_prev * corr + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p.astype(vs.dtype), vs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return (m_new, den_new, acc * corr[..., None] + pv), None

    m0 = jnp.full((b * h, sq), -jnp.inf, jnp.float32)
    den0 = jnp.zeros((b * h, sq), jnp.float32)
    acc0 = jnp.zeros((b * h, sq, d), jnp.float32)
    (m, den, acc), _ = jax.lax.scan(
        body, (m0, den0, acc0), jnp.arange((skv + pad) // bk))

    out_un = acc.astype(v.dtype).reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    m = m.reshape(b, h, sq).transpose(0, 2, 1)
    den = den.reshape(b, h, sq).transpose(0, 2, 1)
    return out_un, m, den


def merge_attention_partials(*parts) -> jnp.ndarray:
    """Combine ``attention_partial_xla`` blocks into normalized attention.

    parts: (out_un, m, den) triples over disjoint KV blocks of the same
    query set. Flash-attention's combine step:
        M = max_b m_b;  out = Σ_b out_un_b·e^{m_b−M} / Σ_b den_b·e^{m_b−M}
    """
    big_m = parts[0][1]
    for _, m, _ in parts[1:]:
        big_m = jnp.maximum(big_m, m)
    num = 0.0
    den = 0.0
    for o, m, d_ in parts:
        w = jnp.exp(m - big_m)
        num = num + o.astype(jnp.float32) * w[..., None]
        den = den + d_ * w
    return (num / den[..., None]).astype(parts[0][0].dtype)


def attention_xla_smallseq(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Head-major batched attention for tiny sequences (the 8-frame temporal
    stage). One explicit (B,S,H,D)->(BH,S,D) transpose per tensor, then
    batch-major dots — the generic einsum form leaves XLA transposing around
    (..., 8, 8) minor dims inside the dots (profiled ~25x slower than the
    arithmetic)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = d**-0.5 if scale is None else scale

    def hm(x, s):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, x.shape[-1])

    qt, kt, vt = hm(q, sq), hm(k, skv), hm(v, skv)
    logits = jnp.einsum("bqd,bkd->bqk", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    if kv_lens is not None:
        col = jnp.arange(skv, dtype=jnp.int32)
        mask = col[None, None, :] < jnp.repeat(kv_lens, h)[:, None, None]
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), vt)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("scale", "impl"))
def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    kv_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense multi-head attention, dispatching to Pallas flash on TPU.

    q: (B, Sq, H, D); k, v: (B, Skv, H, D); returns (B, Sq, H, D).
    ``kv_lens``: optional (B,) per-row valid key counts (ragged KV).
    """
    impl = impl or default_impl()
    if impl == "pallas":
        # tiny query sequences (the 8-frame temporal attention): head-major
        # batched einsum instead of a Pallas grid of micro-cells
        if q.shape[1] < 128:
            return attention_xla_smallseq(q, k, v, scale=scale,
                                          kv_lens=kv_lens)
        # Production-shape dispatch, measured on v5e (scripts/
        # microbench_attn.py): XLA's fused attention beats the hand flash
        # kernel when Skv <= Sq — intra-view S=KV=2048 (8.1 vs 11.4 ms),
        # text cross KV=77 (3.7 vs 5.1 ms) — and XLA's softmax-attention
        # fusion holds up inside the full UNet graph for those shapes.
        # For Skv > Sq (the inter-view [left,right] neighbor KV, KV=2*S)
        # the fusion FAILS in-model: XLA materializes the f32
        # (80,5,2048,4096) score tensor (12.5 GB -> HBM OOM on 16 GB
        # v5e), so those shapes go to the Pallas flash kernel, which
        # streams K/V by construction.
        if k.shape[1] <= q.shape[1]:
            return attention_xla(q, k, v, scale=scale, kv_lens=kv_lens)
        from panacea_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, kv_lens=kv_lens)
    if impl == "streamed" and q.shape[1] >= 512 and k.shape[1] >= 512:
        # chunked online-softmax in plain lax (flash_attention._lax_flash):
        # never materializes the (Sq, Skv) score matrix on any backend
        b, sq, h, d = q.shape
        skv = k.shape[1]
        qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
        kt = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
        vt = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
        from panacea_tpu.ops.flash_attention import _lax_flash

        out = _lax_flash(qt, kt, vt, scale or d**-0.5, h, kv_lens)
        return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return attention_xla(q, k, v, scale=scale, kv_lens=kv_lens)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, S, H*D) -> (B, S, H, D)"""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B, S, H*D)"""
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)
