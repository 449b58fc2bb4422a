"""Temporal VAE block variants (reference model.py:79-366, 479-541)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.RandomState(0).randn(8, 6, 10, 16), jnp.float32)


def test_upsample1d_doubles_frames(x):
    from panacea_tpu.models.vae_temporal import Upsample1D

    m = Upsample1D(num_frames=4)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == (16, 6, 10, 16)  # B*T doubled along T


def test_downsample1d_halves_frames(x):
    from panacea_tpu.models.vae_temporal import Downsample1D

    m = Downsample1D(num_frames=4)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == (4, 6, 10, 16)


def test_resnet_block1d_zero_init_identityish(x):
    """conv1 zero-init: at init the temporal residual is conv2(norm2(0)) —
    finite and shape-preserving; with channel change the shortcut applies."""
    from panacea_tpu.models.vae_temporal import ResnetBlock1D

    m = ResnetBlock1D(out_channels=24, num_frames=4)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == (8, 6, 10, 24)
    assert np.isfinite(np.asarray(y)).all()
    assert float(np.abs(np.asarray(p["conv1"]["kernel"])).max()) == 0.0


def test_resnet_block3d_dead_temporal_params(x):
    """Spatial forward == plain ResnetBlock; temporal towers exist as
    zero-init params but never contribute (reference model.py:338-366)."""
    from panacea_tpu.models.vae_temporal import ResnetBlock3D

    m = ResnetBlock3D()
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    assert "conv1_temporal_kernel" in p
    assert p["conv1_temporal_kernel"].shape == (3, 3, 3, 16, 16)
    y = m.apply({"params": p}, x)
    # bumping the dead temporal params must not change the output
    p2 = jax.tree.map(lambda a: a, p)
    p2["conv1_temporal_kernel"] = jnp.ones_like(p2["conv1_temporal_kernel"])
    y2 = m.apply({"params": p2}, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_attn_block_temporal_shape(x):
    from panacea_tpu.models.vae_temporal import AttnBlockTemporal

    m = AttnBlockTemporal(num_frames=4)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
