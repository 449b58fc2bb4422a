"""Ring cross-view attention over a view-sharded mesh.

The decomposed 4D attention's cross-view stage needs only the two neighbor
views' K/V (with wraparound) — a natural ring over the 6 cameras
(SURVEY.md §2.4/§5). When the view axis is sharded over devices, each device
ppermutes its K/V one hop left and right over ICI (a halo exchange, NOT an
all-gather) and attends locally — ring-attention-lite with O(1) communication
per device regardless of view count.

Used when a mesh has a 'view' axis (e.g. 6 or 12 chips per clip); the
single-chip / frame-sharded paths use the jnp.roll formulation in
ops/panorama.py instead.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from panacea_tpu.ops.attention import attention


def ring_cross_view_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "view",
) -> jnp.ndarray:
    """q/k/v: (V, B, S, H, D) with the leading view axis sharded over
    ``axis_name``. Each view's queries attend to the [left, right] neighbors'
    K/V (reference order: left first, attention.py:545-559).
    Returns (V, B, S, H, D)."""

    n_dev = mesh.shape[axis_name]

    def local(q_blk, k_blk, v_blk):
        # blocks: (V_local, B, S, H, D); with one view per device V_local=1
        # send K/V to the RIGHT neighbor => each device receives its LEFT
        # neighbor's K/V, and vice versa (static ring permutations over ICI)
        perm_r = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        perm_l = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        k_from_left = jax.lax.ppermute(k_blk, axis_name, perm_r)
        v_from_left = jax.lax.ppermute(v_blk, axis_name, perm_r)
        k_from_right = jax.lax.ppermute(k_blk, axis_name, perm_l)
        v_from_right = jax.lax.ppermute(v_blk, axis_name, perm_l)
        kk = jnp.concatenate([k_from_left, k_from_right], axis=2)
        vv = jnp.concatenate([v_from_left, v_from_right], axis=2)

        vl, b, s, h, d = q_blk.shape
        out = attention(
            q_blk.reshape(vl * b, s, h, d),
            kk.reshape(vl * b, 2 * s, h, d),
            vv.reshape(vl * b, 2 * s, h, d),
        )
        return out.reshape(vl, b, s, h, d)

    spec = P(axis_name)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)
