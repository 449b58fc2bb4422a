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
    """Globally force an implementation: 'xla', 'pallas', or None for auto."""
    global _IMPL_OVERRIDE
    assert impl in (None, "xla", "pallas")
    _IMPL_OVERRIDE = impl


def default_impl() -> str:
    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    platform = jax.default_backend()
    return "pallas" if platform == "tpu" else "xla"


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
    return attention_xla(q, k, v, scale=scale, kv_lens=kv_lens)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, S, H*D) -> (B, S, H, D)"""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) -> (B, S, H*D)"""
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)
