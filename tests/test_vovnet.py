"""VoVNet backbone + DownSampler embedder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_vovnet_tiny_shapes():
    from panacea_tpu.perception.vovnet import VoVNet

    model = VoVNet(stage_ch=(16, 16, 16, 16), concat_ch=(32, 32, 64, 64),
                   num_blocks=(1, 1, 2, 1), num_layers=2)
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert [o.shape for o in outs] == [
        (1, 16, 32, 32), (1, 8, 16, 32), (1, 4, 8, 64), (1, 2, 4, 64)
    ]


@pytest.mark.slow
def test_vovnet_checkpoint_variant_same_output():
    from panacea_tpu.perception.vovnet import VoVNet

    kw = dict(stage_ch=(8, 8, 8, 8), concat_ch=(16, 16, 16, 16),
              num_blocks=(1, 1, 1, 1), num_layers=2)
    a = VoVNet(**kw)
    b = VoVNet(use_checkpoint=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    pa = a.init(jax.random.PRNGKey(0), x)["params"]
    outs_a = a.apply({"params": pa}, x)
    outs_b = b.apply({"params": pa}, x)
    for oa, ob in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)


def test_downsampler_embedder():
    from panacea_tpu.models.conditioner import DownSampler

    ds = DownSampler(model_input_channels=4, in_channels=13)
    x = np.random.RandomState(0).rand(2, 32, 64, 13).astype(np.float32)
    out = ds(x)
    assert out.shape == (2, 4, 8, 4)
    # zero-init final conv -> zero output at init
    assert float(jnp.abs(out).max()) == 0.0
