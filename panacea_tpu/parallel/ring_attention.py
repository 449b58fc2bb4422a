"""Ring cross-view attention over a view-sharded mesh.

The decomposed 4D attention's cross-view stage needs only the two neighbor
views' K/V — a natural ring over the 6 cameras (SURVEY.md §2.4/§5). When the
view axis is sharded over devices, each device ppermutes just its BOUNDARY
views' K/V one hop left and right over ICI (a halo exchange, NOT an
all-gather) and attends locally — O(1) communication per device regardless
of view count.

Semantics match the single-chip roll formulation in
models/transformer.py inter-view mode exactly, including the reference
quirk (attention.py:545-559): every view attends to [left, right] neighbor
K/V, except the LAST view (FL) whose right-neighbor slice is dead code in
the reference — its kv length masks the right block.

Used when engine.set_mesh gets a mesh with a 'view' axis; the single-chip /
frame-sharded paths use the jnp.roll formulation in ops/panorama.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from panacea_tpu.ops.attention import (
    attention,
    attention_partial_streamed,
    merge_attention_partials,
)


def ring_cross_view_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "view",
    num_views: int = 6,
    last_view_left_only: bool = True,
    batch_axes: Optional[tuple] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """q/k/v: (V, B, S, H, D) with the leading view axis sharded over
    ``axis_name`` (V % mesh.shape[axis_name] == 0; any views-per-device).
    Each view's queries attend to concat[left, right] neighbor K/V with
    circular wraparound; when ``last_view_left_only`` the final view's kv
    length masks the right block (reference dead-wraparound quirk).
    ``batch_axes``: mesh axes the B dimension stays sharded over (e.g.
    ('dp','t') when frames are also sharded) — the view ring is batch-local,
    so no gather is needed. ``impl``: 'auto' picks by backend (see the local
    dispatch below); 'ragged' / 'partial' force a branch — 'ragged' off-TPU
    routes to the masked XLA attention (same semantics), which is how tests
    cover the TPU branch's lens/offset math on the CPU mesh.
    Returns (V, B, S, H, D)."""
    assert impl in ("auto", "ragged", "partial"), impl
    n_dev = mesh.shape[axis_name]
    assert num_views % n_dev == 0, (num_views, n_dev)

    def local(q_blk, k_blk, v_blk):
        # blocks: (Vl, B, S, H, D) — Vl contiguous views per device
        vl, b, s, h, d = q_blk.shape
        perm_r = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        perm_l = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        if n_dev > 1:
            # halo exchange: only the boundary views cross devices
            from_left = [
                jax.lax.ppermute(x[-1:], axis_name, perm_r)
                for x in (k_blk, v_blk)
            ]
            from_right = [
                jax.lax.ppermute(x[:1], axis_name, perm_l)
                for x in (k_blk, v_blk)
            ]
        else:
            from_left = [x[-1:] for x in (k_blk, v_blk)]
            from_right = [x[:1] for x in (k_blk, v_blk)]
        k_left = jnp.concatenate([from_left[0], k_blk[:-1]], axis=0)
        v_left = jnp.concatenate([from_left[1], v_blk[:-1]], axis=0)
        k_right = jnp.concatenate([k_blk[1:], from_right[0]], axis=0)
        v_right = jnp.concatenate([v_blk[1:], from_right[1]], axis=0)

        # Backend-dispatched local attention (cannot A/B multi-chip in this
        # environment, so the single-chip inter-view A/B is the evidence —
        # docs/PERF.md round-3):
        #  * TPU: concat-[left,right] + ragged-kv_lens -> the Pallas flash
        #    kernel (Skv > Sq). The Skv==Sq partial + online-softmax-merge
        #    form measured ~4x slower for this stage on v5e (defeats XLA's
        #    attention fusion; f32 merge traffic).
        #  * other backends (CPU dryruns / tests): partial blocks + merge —
        #    the ragged form would materialize the f32 (.., S, 2S) score
        #    tensor (1.9 GiB/buffer at production shape in the CPU
        #    partitioner's estimate).
        use_ragged = (impl == "ragged" or
                      (impl == "auto" and jax.default_backend() == "tpu"))
        if use_ragged:
            kk = jnp.concatenate([k_left, k_right], axis=2)   # left FIRST
            vv = jnp.concatenate([v_left, v_right], axis=2)
            gidx = jax.lax.axis_index(axis_name) * vl + jnp.arange(vl)
            if last_view_left_only:
                lens = jnp.where(gidx == num_views - 1, s,
                                 2 * s).astype(jnp.int32)
            else:
                lens = jnp.full((vl,), 2 * s, jnp.int32)
            out = attention(
                q_blk.reshape(vl * b, s, h, d),
                kk.reshape(vl * b, 2 * s, h, d),
                vv.reshape(vl * b, 2 * s, h, d),
                kv_lens=jnp.repeat(lens, b),
            )
            return out.reshape(vl, b, s, h, d)

        def flat(z):
            return z.reshape(vl * b, s, h, d)

        qf = flat(q_blk)
        # streamed per-block partials: same merge contract, no materialized
        # (.., S, S) f32 scores (0.94 GiB each at production shape) — keeps
        # the CPU compile's memory estimate representative of the TPU path
        part_l = attention_partial_streamed(qf, flat(k_left), flat(v_left))
        part_r = attention_partial_streamed(qf, flat(k_right), flat(v_right))
        both = merge_attention_partials(part_l, part_r)
        if last_view_left_only:
            # reference quirk: global last view sees only its left neighbor
            gidx = jax.lax.axis_index(axis_name) * vl + jnp.arange(vl)
            left_only = merge_attention_partials(part_l)
            sel = (gidx == num_views - 1).reshape(vl, 1, 1, 1, 1)
            out = jnp.where(sel, left_only.reshape(vl, b, s, h, d),
                            both.reshape(vl, b, s, h, d))
        else:
            out = both.reshape(vl, b, s, h, d)
        return out

    spec = P(axis_name, tuple(batch_axes) if batch_axes else None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
