"""Decomposed 4D attention transformer (flax.linen).

TPU-native redesign of the reference SpatialTemporalTransformer
(sgm/modules/attention.py:898-1134) and its attention variants:

  * intra-view  — self-attention within each of 6 camera views. The reference
    slices the panorama width in a Python loop (attention.py:436-441); here the
    view axis is folded into the batch so it's ONE batched flash-attention call.
  * inter-view  — queries of view i attend to K/V of neighbors i±1 with circular
    wraparound (attention.py:545-559); built with two rolls on the view axis.
  * temporal    — per-pixel attention over the 8-frame axis with the legacy
    sin-cos embedding (attention.py:1106-1134).
  * text cross  — OpenCLIP context; the per-clip context is NOT repeated per
    frame/pixel as in the reference (openaimodel.py:1304-1305) — instead K/V are
    projected once per clip and shared across frames by folding frames into the
    query sequence (same math, 8x less K/V work, no broadcasted memory).

GELU uses the exact (erf) form to match torch F.gelu.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from panacea_tpu.diffusion.util import sincos_1d_embedding
from panacea_tpu.models.layers import GroupNorm
from panacea_tpu.ops.attention import attention, merge_heads, split_heads
from panacea_tpu.ops.panorama import (
    NUM_VIEWS,
    merge_views,
    neighbor_kv,
    split_views,
)

Dtype = Any


class MultiHeadAttention(nn.Module):
    """q/k/v/out projections around the fused attention op
    (reference CrossAttention / MemoryEfficient* heads, attention.py:203-610)."""

    num_heads: int
    head_dim: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, kv_override=None, kv_lens=None,
                 attn_fn=None):
        """x: (B, S, C). context: (B', L, D) with B = B' * k (k frames share one
        clip's context). kv_override: precomputed (k_heads, v_heads) tuple.
        kv_lens: optional (B,) per-row valid key counts (ragged KV).
        attn_fn: optional replacement for the fused attention op (same
        signature) — used by the ring cross-view path."""
        from panacea_tpu.parallel import shardctx

        def gathered(wt):
            # gather-at-use under FSDP: a head-dim-sharded projection kernel
            # otherwise drags the attention internals into head-sharding
            # against the batch-sharded activation constraints (involuntary
            # full remat). No-op without an active mesh context.
            if wt is None or shardctx.current() is None:
                return wt
            return shardctx.constrain(wt, *([None] * wt.ndim))

        inner = self.num_heads * self.head_dim
        wq, _ = _DenseParams(inner, use_bias=False, name="to_q")(x.shape[-1])
        wq = gathered(wq.astype(self.dtype))
        if kv_override is not None:
            q = x @ wq
            k, v = kv_override
        else:
            ctx = x if context is None else context
            wk, _ = _DenseParams(inner, use_bias=False,
                                 name="to_k")(ctx.shape[-1])
            wv, _ = _DenseParams(inner, use_bias=False,
                                 name="to_v")(ctx.shape[-1])
            wk = gathered(wk.astype(self.dtype))
            wv = gathered(wv.astype(self.dtype))
            if context is None:
                # self-attention: ONE fused qkv dot — a single read of x
                # instead of three (3 separate dots measured +180 ms/eval
                # in-model at production geometry)
                qkv = x @ jnp.concatenate([wq, wk, wv], axis=1)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = x @ wq
                kv = ctx @ jnp.concatenate([wk, wv], axis=1)
                k, v = jnp.split(kv, 2, axis=-1)

        b, s, _ = q.shape
        bk = k.shape[0]
        if bk != b:
            # fold the frames sharing each clip context into the query sequence
            assert b % bk == 0, (b, bk)
            reps = b // bk
            q = q.reshape(bk, reps * s, inner)
        qh = split_heads(q, self.num_heads)
        kh = split_heads(k, self.num_heads)
        vh = split_heads(v, self.num_heads)
        out = (attn_fn or attention)(qh, kh, vh, kv_lens=kv_lens)
        out = merge_heads(out)
        if bk != b:
            out = out.reshape(b, s, inner)
        if shardctx.current() is not None:
            # same gather-at-use as the q/k/v kernels: an FSDP-sharded
            # to_out kernel otherwise pulls the softmax interior into
            # head-sharding against the batch-sharded operands
            wo, bo = _DenseParams(x.shape[-1], name="to_out")(inner)
            return out @ gathered(wo.astype(self.dtype)) \
                + gathered(bo.astype(self.dtype))
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)

    def project_kv(self, context):
        """Expose k/v projection for callers that reuse K/V across many queries."""
        inner = self.num_heads * self.head_dim
        wk, _ = _DenseParams(inner, use_bias=False,
                             name="to_k")(context.shape[-1])
        wv, _ = _DenseParams(inner, use_bias=False,
                             name="to_v")(context.shape[-1])
        return context @ wk.astype(self.dtype), context @ wv.astype(self.dtype)


class _DenseParams(nn.Module):
    """Creates nn.Dense's exact param tree (kernel/bias, same initializers
    and rng path) without running the matmul — lets fused kernels / merged
    dots consume the weights while checkpoints map unchanged."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (in_features, self.features))
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (attention.py:92-115); exact-erf GELU to match torch.

    On TPU the projection+split+gate runs as one fused Pallas matmul
    (ops/geglu.py) that never materializes the (tokens, 2*inner)
    intermediate — the FF stage is otherwise HBM-bound at production
    geometry."""

    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from panacea_tpu.ops.geglu import geglu_matmul, use_pallas_geglu

        dim = x.shape[-1]
        inner = dim * self.mult
        kernel, bias = _DenseParams(inner * 2, name="proj")(dim)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if use_pallas_geglu():
            h = geglu_matmul(x, kernel, bias)
        else:
            h = x @ kernel + bias
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """attn1 (spatial variant or self) + attn2 (text cross) + GEGLU FF, each with
    pre-LayerNorm and residual (attention.py:613-747).

    mode: 'full' | 'intra-view' | 'inter-view' | 'temporal'.
    For spatial modes x is (N, H, W, C); for temporal x is (BHW, T, C).
    """

    num_heads: int
    head_dim: int
    context_dim: int
    mode: str = "full"
    view_mesh: Any = None  # Mesh with a 'view' axis -> ring halo exchange
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, temporal_tail=None):
        attn1 = MultiHeadAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                                   name="attn1")
        attn2 = MultiHeadAttention(self.num_heads, self.head_dim,
                                   context_dim=self.context_dim, dtype=self.dtype,
                                   name="attn2")

        if self.mode == "temporal":
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            x = x + attn1(h)
            if temporal_tail is not None:
                # attn2 and the FF are token-wise — they commute with any
                # token permutation. Return to frame-major (B*T, HW, C) HERE
                # instead of after the FF: the pixel-major (BHW, T, C)
                # layout tiles T=8 into sublanes, making attn2's clip-fold
                # reshape and the GEGLU a profiled ~2 ms layout copy per
                # site; frame-major folds contiguously. The caller skips
                # its own back-transpose in exchange.
                b_, hh_, ww_, t_ = temporal_tail
                c = x.shape[-1]
                x = x.reshape(b_, hh_ * ww_, t_, c).transpose(0, 2, 1, 3)
                x = x.reshape(b_ * t_, hh_ * ww_, c)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            x = x + attn2(h, context=context)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
            return x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h)

        from panacea_tpu.parallel import shardctx

        ctx = shardctx.current()
        n, hh, ww, c = x.shape
        if ctx is not None:
            n_ax = shardctx.resolve_axes(n, (ctx.clip, ctx.frame))
            v_ax = shardctx.resolve_axes(NUM_VIEWS, (ctx.view,))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.mode == "intra-view":
            views = split_views(h)  # (N, V, H, Wv, C)
            if ctx is not None:
                # the w -> (V, wv) split moves the 'view' sharding onto V;
                # pin it so the (n, V) merge below stays a local reshape
                views = shardctx.constrain(views, n_ax, v_ax, None, None, None)
            tokens = views.reshape(n * NUM_VIEWS, hh * (ww // NUM_VIEWS), c)
            if ctx is not None:
                tokens = shardctx.constrain(tokens, n_ax + v_ax, None, None)
            out = attn1(tokens)
            out = merge_views(
                out.reshape(n, NUM_VIEWS, hh, ww // NUM_VIEWS, c)
            )
        elif self.mode == "inter-view":
            # Reference quirk (attention.py:545-559): the `i == 6*width`
            # wraparound branch is dead code — the last view's right-neighbor
            # slice [6w:7w] is empty — so view 5 (FL) attends ONLY to its left
            # neighbor (view 4), while views 0..4 see both neighbors (view 0
            # wraps left to view 5). One batched ragged-KV call: every view
            # gets [left, right] K/V, view 5's kv_len masks the right block.
            views = split_views(h)
            wv = ww // NUM_VIEWS
            s = hh * wv
            if ctx is not None:
                views = shardctx.constrain(views, n_ax, v_ax, None, None,
                                           None)
            tokens = views.reshape(n, NUM_VIEWS, s, c)
            if ctx is not None:
                tokens = shardctx.constrain(tokens, n_ax, v_ax, None, None)
            if self.view_mesh is not None:
                # view-sharded mesh: K/V are projected per view locally and
                # exchanged over ICI by the ring (halo exchange); the kernel
                # applies the same [left, right] + last-view-masked semantics
                from panacea_tpu.parallel.ring_attention import (
                    ring_cross_view_attention,
                )

                nh = self.num_heads
                baxes = tuple(a for a in ("dp", "t")
                              if a in self.view_mesh.axis_names)

                def ring_fn(qh, kh, vh, kv_lens=None):
                    # (n*V, s, H, D) n-major -> (V, n, s, H, D) view-major
                    hd = qh.shape[-1]

                    def vmaj(z):
                        return z.reshape(n, NUM_VIEWS, s, nh, hd).transpose(
                            1, 0, 2, 3, 4)

                    o = ring_cross_view_attention(
                        vmaj(qh), vmaj(kh), vmaj(vh), self.view_mesh,
                        batch_axes=baxes)
                    return o.transpose(1, 0, 2, 3, 4).reshape(
                        n * NUM_VIEWS, s, nh, hd)

                out = attn1(tokens.reshape(n * NUM_VIEWS, s, c),
                            attn_fn=ring_fn)
            else:
                kv_both = neighbor_kv(tokens)  # (n, V, 2s, c): [left, right]
                # Two DENSE calls instead of one ragged-KV call: views 0..4
                # see [left, right], view 5 sees left only. A ragged mask
                # (jnp.where between the QK dot and softmax) breaks XLA's
                # attention fusion inside the full UNet graph — it
                # materializes the f32 (96,5,2048,4096) score tensor (15 GB,
                # OOM on 16 GB v5e HBM); dense chains fuse, and the Skv > Sq
                # call routes to the Pallas flash kernel. NOTE (settled,
                # do not redo — docs/PERF.md round-3): the Skv==Sq
                # partial-block + online-softmax-merge form that the ring
                # path uses was tried here too and REGRESSED 1374 ->
                # ~1760 ms/eval on v5e — the separated exp/sum partials
                # defeat XLA's attention fusion pattern and the f32 merge
                # traffic exceeds the flash kernel's layout-copy tax.
                out04 = attn1(
                    tokens[:, : NUM_VIEWS - 1].reshape(-1, s, c),
                    context=kv_both[:, : NUM_VIEWS - 1].reshape(-1, 2 * s, c))
                out5 = attn1(tokens[:, NUM_VIEWS - 1],
                             context=kv_both[:, NUM_VIEWS - 1, :s])
                out = jnp.concatenate(
                    [out04.reshape(n, NUM_VIEWS - 1, s, c), out5[:, None]],
                    axis=1).reshape(n * NUM_VIEWS, s, c)
            out = merge_views(out.reshape(n, NUM_VIEWS, hh, wv, c))
        else:  # full
            tokens = h.reshape(n, hh * ww, c)
            out = attn1(tokens).reshape(n, hh, ww, c)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        if ctx is not None and v_ax:
            # view-sharded mesh: the (hh*ww) token merge would STRIDE the
            # 'view' sharding on w (involuntary full remat). Cross-attention
            # is per-query-token, so tokenize per view instead — the (n, V)
            # merge is contiguous in the mesh axes and stays local.
            hv = split_views(h)
            hv = shardctx.constrain(hv, n_ax, v_ax, None, None, None)
            tokens = hv.reshape(n * NUM_VIEWS, hh * (ww // NUM_VIEWS), c)
            tokens = shardctx.constrain(tokens, n_ax + v_ax, None, None)
            out = attn2(tokens, context=context)
            out = merge_views(out.reshape(n, NUM_VIEWS, hh,
                                          ww // NUM_VIEWS, c))
        else:
            tokens = h.reshape(n, hh * ww, c)
            out = attn2(tokens, context=context).reshape(n, hh, ww, c)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h)


class SpatialTemporalTransformer(nn.Module):
    """spatial stage -> optional cross-view stage -> temporal stage, each with own
    GroupNorm + in/out projections (zero-init out) and residual
    (attention.py:898-1134). use_linear=True path only (the production config,
    configs/inference_nuscenes.yaml:44)."""

    channels: int
    num_heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    num_frames: int = 8
    spatial_attn_mode: str = "intra-view"  # 'intra-view' | 'inter-view' | 'full'
    insert_crossview: bool = True
    legacy_temporal_pe: bool = True
    view_mesh: Any = None  # Mesh with a 'view' axis (ring cross-view path)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        """x: (N, H, W, C) with N = B*T; context: (B, L, context_dim) per clip."""
        n, hh, ww, c = x.shape
        t = self.num_frames
        b = n // t
        inner = self.num_heads * self.head_dim

        # --- spatial stage -------------------------------------------------
        x_in = x
        h = GroupNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.context_dim,
                mode=self.spatial_attn_mode, view_mesh=self.view_mesh,
                dtype=self.dtype, name=f"blocks_{d}",
            )(h, context=context)
        h = nn.Dense(self.channels, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="proj_out")(h)
        x = x_in + h

        # --- cross-view stage ----------------------------------------------
        if self.insert_crossview:
            x_in = x
            h = GroupNorm(eps=1e-6, dtype=self.dtype, name="norm_crossview")(x)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in_crossview")(h)
            for d in range(self.depth):
                h = BasicTransformerBlock(
                    self.num_heads, self.head_dim, self.context_dim,
                    mode="inter-view", view_mesh=self.view_mesh,
                    dtype=self.dtype, name=f"blocks_crossview_{d}",
                )(h, context=context)
            h = nn.Dense(self.channels, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name="proj_out_crossview")(h)
            x = x_in + h

        # --- temporal stage -------------------------------------------------
        from panacea_tpu.parallel import shardctx

        ctx = shardctx.current()
        x_in = x
        h = GroupNorm(eps=1e-6, dtype=self.dtype, name="norm_temporal")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in_temporal")(h)
        if ctx is not None:
            # Mesh path (Ulysses over frames): frames must be LOCAL for the
            # temporal attention, so reshard once in / once out — an explicit
            # all-to-all over ICI instead of the partitioner's
            # replicate-then-repartition. Token order is (b, ww, hh) —
            # width-major — so the merged pixel dim's sharding is the
            # contiguous product of the clip axes and the (view, frame) axes
            # moved onto ww (per-pixel attention is order-invariant).
            # resolve_axes is computed ONCE per dim and reused on both sides
            # of every reshape so the transitions stay local.
            b_ax = shardctx.resolve_axes(b, (ctx.clip,))
            t_ax = shardctx.resolve_axes(t, (ctx.frame,))
            wv_ax = shardctx.resolve_axes(ww, (ctx.view,))
            wa_ax = shardctx.resolve_axes(ww, (ctx.view, ctx.frame))
            h5 = h.reshape(b, t, hh, ww, inner)
            h5 = shardctx.constrain(h5, b_ax, t_ax, None, wv_ax, None)
            h5 = h5.transpose(0, 3, 2, 1, 4)  # (b, ww, hh, t, inner)
            h5 = shardctx.constrain(h5, b_ax, wa_ax, None, None, None)
            h = h5.reshape(b * ww * hh, t, inner)
            h = shardctx.constrain(h, b_ax + wa_ax, None, None)
        else:
            # (B*T, H, W, C) -> (B*H*W, T, C)
            h = h.reshape(b, t, hh, ww, inner).transpose(0, 2, 3, 1, 4)
            h = h.reshape(b * hh * ww, t, inner)
        pe = jnp.asarray(
            sincos_1d_embedding(t, inner, legacy_int_freq=self.legacy_temporal_pe),
            dtype=h.dtype,
        )
        h = h + pe
        for d in range(self.depth):
            # reference: text context of frame 0, broadcast per pixel
            # (attention.py:1122-1124). attn1 stays per-pixel over T; for attn2
            # MultiHeadAttention projects K/V once per clip and folds the
            # pixel/frame ratio into the query sequence — equivalent math.
            # The last block returns frame-major (temporal_tail): its attn2/FF
            # run on the spatial layout and the back-transpose below is
            # already folded in. On the mesh path the tail is skipped (the
            # explicit all-to-all back-transpose below replaces it).
            last = d == self.depth - 1
            h = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.context_dim,
                mode="temporal", dtype=self.dtype, name=f"blocks_temporal_{d}",
            )(h, context=context,
              temporal_tail=(b, hh, ww, t) if last and ctx is None else None)
        if ctx is not None:
            h5 = h.reshape(b, ww, hh, t, inner)
            h5 = shardctx.constrain(h5, b_ax, wa_ax, None, None, None)
            h5 = h5.transpose(0, 3, 2, 1, 4)  # (b, t, hh, ww, inner)
            h5 = shardctx.constrain(h5, b_ax, t_ax, None, wv_ax, None)
            h = h5.reshape(n, hh, ww, inner)
            h = shardctx.constrain(h, b_ax + t_ax, None, wv_ax, None)
        else:
            h = h.reshape(n, hh, ww, inner)
        h = nn.Dense(self.channels, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name="proj_out_temporal")(h)
        return x_in + h
