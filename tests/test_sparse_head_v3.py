"""SparseHeadv3/v4 proposal-query variants (perception/sparse_head_v3.py vs
reference sparse_head_v3.py:503-519 / sparse_head_v4.py:512-527)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.perception.head import init_memory
from panacea_tpu.perception.sparse_head_v3 import (
    SparseHeadProposal,
    SparseHeadv4,
)

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _inputs(b=1, n=2, c=32, p=6):
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    feats = [jax.random.normal(ks[0], (b, n, 8 // (2**i), 16 // (2**i), c))
             for i in range(2)]
    eye = jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4))
    data = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "lidar2img": eye, "intrinsics": eye, "extrinsics": eye,
        "proposal_positions": jax.random.uniform(
            ks[1], (b, p, 3), minval=-40, maxval=40),
        "proposal_features": jax.random.normal(ks[2], (b, p, 2 * c)),
    }
    return feats, data


def _head(cls, c=32, q=12, **kw):
    return cls(num_classes=10, embed_dims=c, num_query=q, memory_len=24,
               topk_proposals=8, num_propagated=8, num_decoder_layers=2,
               num_levels=2, num_cams=2, pc_range=PC, **kw)


def test_v3_context_queries_use_proposal_count():
    c, p = 32, 6
    head = _head(SparseHeadProposal)
    feats, data = _inputs(c=c, p=p)
    mem = init_memory(1, 24, c)
    params = head.init(jax.random.PRNGKey(1), feats, mem, data,
                       (8, 16))["params"]
    assert "input_proj" in params and "context_embedding" in params
    outs, new_mem = head.apply({"params": params}, feats, mem, data, (8, 16))
    # v3: query count == proposal count + propagated memory queries
    # (sparse_head_v3.py:510-511, temporal_alignment :322-329)
    assert outs["all_cls_scores"].shape == (2, 1, p + 8, 10)
    assert outs["all_bbox_preds"].shape == (2, 1, p + 8, 10)
    assert np.isfinite(np.asarray(outs["all_cls_scores"])).all()
    assert new_mem.embedding.shape == mem.embedding.shape


def test_v4_seed_queries_pad_to_num_query():
    c, q, p = 32, 12, 6
    head = _head(SparseHeadv4)
    feats, data = _inputs(c=c, p=p)
    mem = init_memory(1, 24, c)
    params = head.init(jax.random.PRNGKey(1), feats, mem, data,
                       (8, 16))["params"]
    assert "input_proj" not in params  # v4 keeps zero content (v4:254-274)
    outs, _ = head.apply({"params": params}, feats, mem, data, (8, 16))
    # proposals seed the head of the learned table, padded to num_query
    # (+ propagated queries)
    assert outs["all_cls_scores"].shape == (2, 1, q + 8, 10)


def test_fallback_to_learned_queries_without_proposals():
    c = 32
    head = _head(SparseHeadProposal)
    feats, data = _inputs(c=c)
    data.pop("proposal_positions")
    data.pop("proposal_features")
    mem = init_memory(1, 24, c)
    params = head.init(jax.random.PRNGKey(1), feats, mem, data,
                       (8, 16))["params"]
    outs, _ = head.apply({"params": params}, feats, mem, data, (8, 16))
    assert outs["all_cls_scores"].shape == (2, 1, 12 + 8, 10)
