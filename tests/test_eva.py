"""EVA-02 ViT backbone tests (reference-faithful variant)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_eva_vit_pyramid_shapes():
    from panacea_tpu.perception.eva import EVAViT

    model = EVAViT(width=32, heads=4, layers=2, window_size=4,
                   window_block_indexes=(0,), residual_block_indexes=(1,),
                   out_channels=16)
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert [o.shape for o in outs] == [
        (1, 16, 32, 16), (1, 8, 16, 16), (1, 4, 8, 16), (1, 2, 4, 16)
    ]


def test_window_partition_roundtrip():
    from panacea_tpu.perception.eva import (
        _window_partition,
        _window_unpartition,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 5))
    w, padded = _window_partition(x, 4)
    back = _window_unpartition(w, 4, padded, (7, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_rope_matches_reference_formula():
    """rope tables vs an independent transcription of
    VisionRotaryEmbeddingFast (blocks.py:326-365) for a square grid."""
    from panacea_tpu.perception.eva import rope_cos_sin

    ft, pt, head_dim = 8, 16, 16
    dim = head_dim // 2  # reference passes half_head_dim
    freqs = 1.0 / (10000 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(ft) / ft * pt
    fr = np.einsum("i,f->if", t, freqs)
    fr = np.repeat(fr, 2, axis=-1)  # '... n -> ... (n r)', r=2
    full = np.concatenate(
        [np.broadcast_to(fr[:, None, :], (ft, ft, dim)),
         np.broadcast_to(fr[None, :, :], (ft, ft, dim))], axis=-1
    ).reshape(ft * ft, head_dim)
    cos, sin = rope_cos_sin((ft, ft), head_dim, pt_seq_len=pt)
    np.testing.assert_allclose(cos, np.cos(full), rtol=1e-12)
    np.testing.assert_allclose(sin, np.sin(full), rtol=1e-12)


def test_rope_rotation_preserves_norm():
    from panacea_tpu.perception.eva import apply_rope, rope_cos_sin

    cos, sin = rope_cos_sin((4, 4), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
