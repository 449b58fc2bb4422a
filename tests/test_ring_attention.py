"""Ring cross-view attention (shard_map + ppermute) vs the single-device
neighbor_kv formulation."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from panacea_tpu.ops.attention import attention_xla
from panacea_tpu.ops.panorama import neighbor_kv
from panacea_tpu.parallel.ring_attention import ring_cross_view_attention


def test_ring_matches_roll_formulation():
    assert len(jax.devices()) >= 6
    mesh = Mesh(np.array(jax.devices()[:6]), ("view",))
    v_, b, s, h, d = 6, 2, 16, 2, 8
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (v_, b, s, h, d))
    k = jax.random.normal(kk, (v_, b, s, h, d))
    v = jax.random.normal(kv, (v_, b, s, h, d))

    out_ring = ring_cross_view_attention(q, k, v, mesh)

    # reference: neighbor_kv roll on (B, V, S, ...) layout
    kv_k = neighbor_kv(k.transpose(1, 0, 2, 3, 4).reshape(b, v_, s, h * d))
    kv_v = neighbor_kv(v.transpose(1, 0, 2, 3, 4).reshape(b, v_, s, h * d))
    q_t = q.transpose(1, 0, 2, 3, 4).reshape(b * v_, s, h, d)
    ref = attention_xla(
        q_t,
        kv_k.reshape(b * v_, 2 * s, h, d),
        kv_v.reshape(b * v_, 2 * s, h, d),
    ).reshape(b, v_, s, h, d).transpose(1, 0, 2, 3, 4)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(ref), atol=2e-5
    )
