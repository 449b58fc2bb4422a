"""EVA-ViT backbone tests."""

import jax
import jax.numpy as jnp


def test_eva_vit_pyramid_shapes():
    from panacea_tpu.perception.eva import EVAViT

    model = EVAViT(width=32, heads=4, layers=2, window_size=4,
                   global_indices=(1,), out_channels=16)
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert [o.shape for o in outs] == [
        (1, 16, 32, 16), (1, 8, 16, 16), (1, 4, 8, 16), (1, 2, 4, 16)
    ]


def test_window_partition_roundtrip():
    import numpy as np

    from panacea_tpu.perception.eva import (
        _window_partition,
        _window_unpartition,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 5))
    w, padded = _window_partition(x, 4)
    back = _window_unpartition(w, 4, padded, (7, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)
