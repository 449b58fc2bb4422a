"""Model structure tests: UNet3D, ControlNet zero-residual invariant, the
zero-init temporal-independence property, VAE shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.models.controlnet import ControlNet3D, ControlledUNetModel3D
from panacea_tpu.models.unet import UNetModel3D
from panacea_tpu.models.vae import AutoencoderKL

TINY = dict(
    in_channels=8,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(1,),
    channel_mult=(1, 2),
    num_head_channels=16,
    transformer_depth=1,
    context_dim=48,
    num_frames=2,
    spatial_only_attn_type="intra-view",
    insert_crossview=True,
)


def make_inputs(t=2, h=4, wv=8, cin=8, ctx_dim=48):
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (t, h, 6 * wv, cin))
    ts = jnp.asarray([500] * t)
    ctx = jax.random.normal(k2, (1, 7, ctx_dim))
    return x, ts, ctx


@pytest.mark.slow
def test_unet_forward_shape_and_finite():
    model = UNetModel3D(out_channels=4, **TINY)
    x, ts, ctx = make_inputs()
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx)["params"]
    out = model.apply({"params": params}, x, ts, ctx)
    assert out.shape == (2, 4, 48, 4)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_unet_zero_init_temporal_independence():
    """All temporal paths are zero-init (openaimodel.py:415-419; zero proj_out
    in the temporal transformer stage, attention.py:1035-1059), so at init
    frame 0's output must not depend on frame 1's input."""
    model = UNetModel3D(out_channels=4, **TINY)
    x, ts, ctx = make_inputs()
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx)["params"]
    # the final out conv is zero-init too -> outputs identically zero; give it
    # random weights so the test observes the interior of the network
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["out_conv"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(7), params["out_conv"]["kernel"].shape
    ) * 0.1
    out1 = model.apply({"params": params}, x, ts, ctx)
    x2 = x.at[1].set(jax.random.normal(jax.random.PRNGKey(9), x[1].shape))
    out2 = model.apply({"params": params}, x2, ts, ctx)
    np.testing.assert_allclose(
        np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5
    )
    # frame 1 output must change (sanity that the perturbation mattered)
    assert np.abs(np.asarray(out1[1]) - np.asarray(out2[1])).max() > 1e-4


def test_controlnet_zero_residuals_at_init():
    """Every ControlNet output goes through a zero conv (controlmodel.py:61-75),
    so residuals at init are exactly zero."""
    cn = ControlNet3D(
        hint_channels=5, control_scales=1.0, **TINY
    )
    x, ts, ctx = make_inputs()
    hint = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 384, 5))
    params = cn.init(jax.random.PRNGKey(0), x, hint, ts, ctx)["params"]
    outs = cn.apply({"params": params}, x, hint, ts, ctx)
    assert len(outs) == 5  # conv, res, down, res input blocks + middle
    for o in outs:
        assert float(jnp.abs(o).max()) == 0.0


def test_controlled_unet_runs():
    cfg = dict(TINY)
    model = ControlledUNetModel3D(
        out_channels=4,
        controlnet_config={
            "target": "x",
            "params": dict(TINY, hint_channels=5, control_scales=1.0),
        },
        **cfg,
    )
    x, ts, ctx = make_inputs()
    hint = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 384, 5))
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, hint=hint)["params"]
    out = model.apply({"params": params}, x, ts, ctx, hint=hint)
    assert out.shape == (2, 4, 48, 4)
    # zero-init controlnet -> identical to no-hint run at init
    out_nohint = model.apply({"params": params}, x, ts, ctx, hint=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_nohint), atol=1e-6)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(
        embed_dim=4,
        ddconfig=dict(double_z=True, z_channels=4, in_channels=3, out_ch=3,
                      ch=16, ch_mult=[1, 2], num_res_blocks=1,
                      attn_resolutions=[], resolution=32),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode)
    assert z.shape == (2, 16, 16, 4)
    rec = vae.apply({"params": params}, z, method=vae.decode)
    assert rec.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(rec)))


def test_clip_text_tower():
    from panacea_tpu.models.clip import CLIPTextTransformer

    model = CLIPTextTransformer(vocab_size=100, width=32, heads=4, layers=3,
                                context_length=10, penultimate=True)
    tokens = jnp.asarray([[98, 5, 7, 99, 0, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    out = model.apply({"params": params}, tokens)
    assert out.shape == (1, 10, 32)
    # causal mask: output at position 1 must not depend on later tokens
    tokens2 = tokens.at[0, 3].set(42)
    out2 = model.apply({"params": params}, tokens2)
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(out2[0, :3]),
                               atol=1e-5)
    assert np.abs(np.asarray(out[0, 3]) - np.asarray(out2[0, 3])).max() > 1e-4
    # param tree contains all 3 layers (penultimate skips compute, not params)
    assert "resblock_2" in params


def test_temporal_conv_matches_conv1d():
    """Shift+matmul temporal conv == flax nn.Conv over (BHW, T, C)."""
    import flax.linen as nn

    from panacea_tpu.models.layers import TemporalConv

    t, h, w, c = 4, 3, 5, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c))
    tc = TemporalConv(num_frames=t, zero_init=False)
    params = tc.init(jax.random.PRNGKey(1), x)["params"]
    out = tc.apply({"params": params}, x)

    # reference formulation via nn.Conv on transposed layout
    ref_conv = nn.Conv(c, (3,), padding=1)
    ref_params = {"kernel": params["conv_kernel"], "bias": params["conv_bias"]}
    xt = x.reshape(1, t, h, w, c).transpose(0, 2, 3, 1, 4).reshape(h * w, t, c)
    ref = ref_conv.apply({"params": ref_params}, xt)
    ref = ref.reshape(1, h, w, t, c).transpose(0, 3, 1, 2, 4).reshape(t, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
