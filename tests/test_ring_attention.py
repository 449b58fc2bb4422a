"""Ring cross-view attention (shard_map + ppermute halo exchange) vs the
single-device neighbor_kv roll formulation, including the reference's
dead-wraparound quirk (last view attends left only) and multi-view-per-device
sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from panacea_tpu.ops.attention import attention_xla
from panacea_tpu.ops.panorama import neighbor_kv
from panacea_tpu.parallel.ring_attention import ring_cross_view_attention


def _roll_reference(q, k, v, last_view_left_only):
    v_, b, s, h, d = q.shape
    kv_k = neighbor_kv(k.transpose(1, 0, 2, 3, 4).reshape(b, v_, s, h * d))
    kv_v = neighbor_kv(v.transpose(1, 0, 2, 3, 4).reshape(b, v_, s, h * d))
    q_t = q.transpose(1, 0, 2, 3, 4).reshape(b * v_, s, h, d)
    if last_view_left_only:
        lens = jnp.tile(
            jnp.asarray([2 * s] * (v_ - 1) + [s], jnp.int32), b)
    else:
        lens = jnp.full((b * v_,), 2 * s, jnp.int32)
    ref = attention_xla(
        q_t,
        kv_k.reshape(b * v_, 2 * s, h, d),
        kv_v.reshape(b * v_, 2 * s, h, d),
        kv_lens=lens,
    ).reshape(b, v_, s, h, d).transpose(1, 0, 2, 3, 4)
    return ref


@pytest.mark.parametrize("n_dev", [1, 2, 3, 6])
@pytest.mark.parametrize("ragged", [True, False])
@pytest.mark.parametrize("impl", ["partial", "ragged"])
def test_ring_matches_roll_formulation(n_dev, ragged, impl):
    """Both local-attention branches: 'partial' (the non-TPU default) and
    'ragged' (the TPU default — its lens/axis-offset/reshape math runs here
    via the masked XLA attention fallback, since the backend fork itself
    picks by jax.default_backend() and tests are pinned to CPU)."""
    assert len(jax.devices()) >= n_dev
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("view",))
    v_, b, s, h, d = 6, 2, 16, 2, 8
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (v_, b, s, h, d))
    k = jax.random.normal(kk, (v_, b, s, h, d))
    v = jax.random.normal(kv, (v_, b, s, h, d))

    out_ring = ring_cross_view_attention(
        q, k, v, mesh, last_view_left_only=ragged, impl=impl)
    ref = _roll_reference(q, k, v, last_view_left_only=ragged)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(ref), atol=2e-5
    )
