"""Golden numerical parity vs the ACTUAL reference torch modules.

Loads the reference sgm module files from /root/reference (see
reference_loader.py), instantiates tiny-but-structurally-complete configs,
randomizes every torch parameter (including zero-inits), converts the torch
state dict through panacea_tpu.utils.convert, and asserts the flax modules
reproduce the torch outputs. This is the de-risking layer for real checkpoint
conversion (panaceaplus_40k_deepspeed.ckpt): if these pass, the converter's
layout transforms and the architecture are jointly correct.

Reference anchors: ResBlock3D openaimodel.py:356-542, attention variants
attention.py:203-610, SpatialTemporalTransformer attention.py:898-1134,
ControlNet3D controlmodel.py:19-142, wrapper semantics wrappers.py:37-70,
VAE model.py:479-1010.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_loader import load_reference, randomize_, state_dict_numpy

REF = load_reference()

# tiny geometry: 2 frames, panorama H=4 W=48 (the intra/inter-view code derives
# per-view H as sqrt(tokens/12), attention.py:428 — so W must equal 12*H)
T = 2
H, W = 4, 48
CH = 64            # divisible by 32 (GroupNorm groups)
HEADS, DHEAD = 2, 32   # inner == CH so the temporal PE dims line up
CTX = 48
ATOL = 1e-4


def _to_jax_nhwc(x_t):
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


def _from_jax_nhwc(x_j):
    return np.asarray(x_j).transpose(0, 3, 1, 2)


def _convert(sd, mapping):
    from panacea_tpu.utils.convert import convert_state_dict

    params, missing, unexpected = convert_state_dict(sd, mapping)
    # skip_connection / nin_shortcut are nn.Identity (no weights) when
    # channels match; the mapping lists them unconditionally
    missing = [k for k in missing
               if "skip_connection" not in k and "nin_shortcut" not in k]
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]
    return params


def test_resblock3d_parity():
    from panacea_tpu.models.layers import ResBlock3D
    from panacea_tpu.utils.convert import _resblock3d

    ref = REF["openaimodel"].ResBlock3D(
        channels=CH, emb_channels=2 * CH, dropout=0.0, out_channels=96,
        num_frames=T, use_checkpoint=False,
    )
    randomize_(ref, seed=1)
    rs = np.random.RandomState(0)
    x = torch.from_numpy(rs.randn(2 * T, CH, H, W).astype(np.float32))
    emb = torch.from_numpy(rs.randn(2 * T, 2 * CH).astype(np.float32))
    with torch.no_grad():
        out_ref = ref(x, emb).numpy()

    params = _convert(state_dict_numpy(ref, "m"), _resblock3d("m", ()))
    mod = ResBlock3D(channels=CH, emb_channels=2 * CH, out_channels=96,
                     num_frames=T)
    out = mod.apply({"params": params}, _to_jax_nhwc(x), jnp.asarray(emb.numpy()))
    np.testing.assert_allclose(_from_jax_nhwc(out), out_ref, atol=ATOL)


@pytest.mark.parametrize("mode", ["intra-view", "inter-view", "full"])
def test_basic_block_spatial_parity(mode):
    """BasicTransformerBlock: attn1 (spatial variant) + attn2 (text cross) + FF
    (attention.py:613-747); all three spatial attn1 variants."""
    from panacea_tpu.models.transformer import BasicTransformerBlock
    from panacea_tpu.utils.convert import _basic_block

    ref = REF["attention"].BasicTransformerBlock(
        CH, HEADS, DHEAD, context_dim=CTX, attn_mode="softmax-xformers",
        checkpoint=False,
        spatial_only_attn_type=None if mode == "full" else mode,
    )
    randomize_(ref, seed=2)
    rs = np.random.RandomState(1)
    b = 1
    x = rs.randn(b * T, H * W, CH).astype(np.float32)
    ctx = rs.randn(b, 7, CTX).astype(np.float32)
    # reference receives per-frame repeated context (openaimodel.py:1304-1305)
    ctx_rep = np.repeat(ctx, T, axis=0)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), context=torch.from_numpy(ctx_rep)).numpy()

    params = _convert(state_dict_numpy(ref, "m"), _basic_block("m", ()))
    mod = BasicTransformerBlock(HEADS, DHEAD, CTX, mode=mode)
    x_img = jnp.asarray(x.reshape(b * T, H, W, CH))
    out = mod.apply({"params": params}, x_img, context=jnp.asarray(ctx))
    np.testing.assert_allclose(
        np.asarray(out).reshape(b * T, H * W, CH), out_ref, atol=ATOL)


@pytest.mark.parametrize("insert_crossview", [True, False])
def test_spatial_temporal_transformer_parity(insert_crossview):
    """Full SpatialTemporalTransformer: spatial -> (cross-view) -> temporal with
    the legacy int-truncated sin-cos PE (attention.py:898-1134)."""
    from panacea_tpu.models.transformer import SpatialTemporalTransformer
    from panacea_tpu.utils.convert import _st_transformer

    ref = REF["attention"].SpatialTemporalTransformer(
        CH, HEADS, DHEAD, depth=1, context_dim=CTX, use_linear=True,
        attn_type="softmax-xformers", use_checkpoint=False, num_frames=T,
        spatial_only_attn_type="intra-view", insert_crossview=insert_crossview,
    )
    randomize_(ref, seed=3)
    rs = np.random.RandomState(2)
    b = 1
    x = rs.randn(b * T, CH, H, W).astype(np.float32)
    ctx = rs.randn(b, 7, CTX).astype(np.float32)
    ctx_rep = np.repeat(ctx, T, axis=0)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), context=torch.from_numpy(ctx_rep)).numpy()

    params = _convert(
        state_dict_numpy(ref, "m"),
        _st_transformer("m", (), depth=1, insert_crossview=insert_crossview),
    )
    mod = SpatialTemporalTransformer(
        channels=CH, num_heads=HEADS, head_dim=DHEAD, context_dim=CTX,
        num_frames=T, spatial_attn_mode="intra-view",
        insert_crossview=insert_crossview,
    )
    out = mod.apply({"params": params},
                    jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ctx))
    np.testing.assert_allclose(_from_jax_nhwc(out), out_ref, atol=ATOL)


def _tiny_unet_kwargs():
    return dict(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1, 2), transformer_depth=1,
        insert_crossview=True,
    )


def _ref_controlled_unet():
    """Reference ControlledUNetModel3D + nested ControlNet3D at tiny config."""
    common = dict(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], num_head_channels=16,
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, context_dim=CTX, num_frames=T,
        spatial_transformer_attn_type="softmax-xformers",
        spatial_only_attn_type="intra-view", insert_crossview=True,
        use_checkpoint=False, legacy=False,
    )
    controlnet_config = {
        "target": "sgm.modules.diffusionmodules.controlmodel.ControlNet3D",
        "params": {"hint_channels": 19, "control_scales": 1.0, **common},
    }
    model = REF["openaimodel"].__dict__  # noqa: F841 (keep namespace alive)
    ControlledUNetModel3D = REF["controlmodel"].ControlledUNetModel3D
    return ControlledUNetModel3D(controlnet_config=controlnet_config, **common)


def test_controlled_unet_parity():
    """Full UNet + ControlNet forward with wrapper semantics (wrappers.py:37-70):
    control residuals from the ControlNet added to middle + skips."""
    from panacea_tpu.models.controlnet import ControlledUNetModel3D
    from panacea_tpu.utils.convert import (
        build_controlnet_mapping,
        build_unet_mapping,
    )

    ref = _ref_controlled_unet()
    randomize_(ref, seed=4)
    ref.eval()

    rs = np.random.RandomState(3)
    x = rs.randn(T, 8, H, W).astype(np.float32)
    hint = rs.randn(T, 19, 8 * H, 8 * W).astype(np.float32)
    ctx = rs.randn(1, 7, CTX).astype(np.float32)
    ts = np.array([3, 500][:T], dtype=np.int64)

    xt = torch.from_numpy(x)
    with torch.no_grad():
        control = ref.controlnet(
            x=xt, hint=torch.from_numpy(hint),
            timesteps=torch.from_numpy(ts), context=torch.from_numpy(ctx))
        out_ref = ref(
            xt, timesteps=torch.from_numpy(ts),
            context=torch.from_numpy(ctx), control=control).numpy()

    kwargs = _tiny_unet_kwargs()
    sd = state_dict_numpy(ref, "md")
    mapping = {}
    mapping.update(build_unet_mapping("md", ("unet",), **kwargs))
    mapping.update(build_controlnet_mapping("md.controlnet", ("controlnet",),
                                            **kwargs))
    params = _convert(sd, mapping)

    common = dict(
        in_channels=8, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=CTX, num_frames=T,
        spatial_only_attn_type="intra-view", insert_crossview=True,
        use_checkpoint=False,
    )
    mod = ControlledUNetModel3D(
        controlnet_config={"params": {"hint_channels": 19, **common}},
        out_channels=4, **common,
    )
    out = mod.apply(
        {"params": params}, _to_jax_nhwc(torch.from_numpy(x)),
        jnp.asarray(ts), jnp.asarray(ctx),
        hint=_to_jax_nhwc(torch.from_numpy(hint)),
    )
    np.testing.assert_allclose(_from_jax_nhwc(out), out_ref, atol=2e-4)


def test_controlnet_multiframe_hint_label_emb_parity():
    """Panacea+ branches of ControlNet3D: the multi-frame hint fold for
    hint_channels>19 (controlmodel.py:108-117, '(t m) c -> t (m c)') and the
    class-conditional label_emb add (controlmodel.py:104-107 +
    openaimodel.py:962-968 'sequential' MLP). torch runs in .train() so the
    single-reshape training branch is exercised (dropout=0, so train/eval
    are numerically identical)."""
    from panacea_tpu.models.controlnet import ControlNet3D
    from panacea_tpu.utils.convert import build_controlnet_mapping

    m_frames = 2
    hint_ch = 19 * m_frames
    common = dict(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], num_head_channels=16,
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, context_dim=CTX, num_frames=T,
        spatial_transformer_attn_type="softmax-xformers",
        spatial_only_attn_type="intra-view", insert_crossview=True,
        use_checkpoint=False, legacy=False,
        num_classes="sequential", adm_in_channels=6,
    )
    ref = REF["controlmodel"].ControlNet3D(
        hint_channels=hint_ch, control_scales=1.0, **common)
    # std 0.05: the 38-ch hint stack amplifies std-0.2 weights into 1e4-scale
    # activations where fp32 accumulation-order noise swamps atol
    randomize_(ref, seed=11, std=0.05)
    ref.train()

    rs = np.random.RandomState(7)
    x = rs.randn(T, 8, H, W).astype(np.float32)
    hint = rs.randn(T * m_frames, 19, 8 * H, 8 * W).astype(np.float32)
    ctx = rs.randn(1, 7, CTX).astype(np.float32)
    y = rs.randn(1, 6).astype(np.float32)
    ts = np.array([3, 500][:T], dtype=np.int64)

    with torch.no_grad():
        control_ref = ref(
            x=torch.from_numpy(x), hint=torch.from_numpy(hint),
            timesteps=torch.from_numpy(ts), context=torch.from_numpy(ctx),
            y=torch.from_numpy(y))

    kwargs = dict(_tiny_unet_kwargs(), num_classes="sequential")
    params = _convert(
        state_dict_numpy(ref, "m"),
        build_controlnet_mapping("m", (), **kwargs))
    mod = ControlNet3D(
        hint_channels=hint_ch, in_channels=8, model_channels=32,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=16, transformer_depth=1, context_dim=CTX,
        num_frames=T, spatial_only_attn_type="intra-view",
        insert_crossview=True, use_checkpoint=False,
        num_classes="sequential", adm_in_channels=6,
    )
    control = mod.apply(
        {"params": params}, _to_jax_nhwc(torch.from_numpy(x)),
        _to_jax_nhwc(torch.from_numpy(hint)),
        jnp.asarray(ts), jnp.asarray(ctx), y=jnp.asarray(y))
    assert len(control) == len(control_ref)
    for ours, theirs in zip(control, control_ref):
        np.testing.assert_allclose(_from_jax_nhwc(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-3)


def test_sampler_trajectory_parity():
    """Fixed-seed 4-step Euler-EDM CFG trajectory: repo engine.sample vs the
    reference sampler/denoiser/guider/wrapper stack (sampling.py:112-133,
    denoiser.py:22-63, guiders.py:8-40, wrappers.py:37-70, shared-noise init
    diffusion.py:244-249) driving the reference torch ControlledUNetModel3D,
    both through identical converted weights and identical base noise."""
    import os

    from panacea_tpu.config import load_config
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.convert import (
        build_controlnet_mapping,
        build_unet_mapping,
    )

    CTX64 = 64
    common = dict(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], num_head_channels=16,
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, context_dim=CTX64, num_frames=T,
        spatial_transformer_attn_type="softmax-xformers",
        spatial_only_attn_type="intra-view", insert_crossview=True,
        use_checkpoint=False, legacy=False,
    )
    controlnet_config = {
        "target": "sgm.modules.diffusionmodules.controlmodel.ControlNet3D",
        "params": {"hint_channels": 19, "control_scales": 1.0, **common},
    }
    ref_net = REF["controlmodel"].ControlledUNetModel3D(
        controlnet_config=controlnet_config, **common)
    randomize_(ref_net, seed=7, std=0.05)
    ref_net.eval()

    disc_cfg = {"target":
                "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"}
    ref_denoiser = REF["denoiser"].DiscreteDenoiser(
        weighting_config={"target":
            "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={"target":
            "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"},
        num_idx=1000, discretization_config=disc_cfg,
    )
    ref_sampler = REF["sampling"].EulerEDMSampler(
        num_steps=4, discretization_config=disc_cfg,
        guider_config={"target":
            "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 5.0}},
        verbose=False, device="cpu",
    )
    wrapper = REF["wrappers"].OpenAIWrapperControlLDM3D(ref_net)

    rs = np.random.RandomState(5)
    lat_h, lat_w = H, W
    concat = rs.randn(T, 4, lat_h, lat_w).astype(np.float32) * 0.3
    cond_feat = rs.randn(T, 19, 8 * lat_h, 8 * lat_w).astype(np.float32) * 0.2
    crossattn_c = rs.randn(1, 7, CTX64).astype(np.float32)
    crossattn_uc = rs.randn(1, 7, CTX64).astype(np.float32)
    randn = rs.randn(T, 4, lat_h, lat_w).astype(np.float32)

    share = 0.07
    cond_t = {
        "crossattn": torch.from_numpy(crossattn_c),
        "concat": torch.from_numpy(concat),
        "cond_feat": torch.from_numpy(cond_feat),
    }
    uc_t = {
        "crossattn": torch.from_numpy(crossattn_uc),
        "concat": torch.from_numpy(concat),
        "cond_feat": torch.from_numpy(cond_feat),
    }
    with torch.no_grad():
        x0 = torch.from_numpy(randn.copy())
        x0 = x0 + cond_t["concat"][-1] * share  # diffusion.py:244-249
        den = lambda input, sigma, c: ref_denoiser(wrapper, input, sigma, c)
        ref_samples = ref_sampler(den, x0, cond_t, uc=uc_t).numpy()

    # --- repo engine with converted weights --------------------------------
    cfg = load_config(os.path.join(
        os.path.dirname(__file__), "..", "panacea_tpu", "configs",
        "tiny_cpu.yaml"))
    eng = instantiate_from_config(cfg["model"])
    assert eng.share_noise_level == share and eng.num_frames == T

    kwargs = dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                  attention_resolutions=(1, 2), transformer_depth=1,
                  insert_crossview=True)
    sd = state_dict_numpy(ref_net, "model.diffusion_model")
    mapping = {}
    mapping.update(build_unet_mapping(
        "model.diffusion_model", ("unet",), **kwargs))
    mapping.update(build_controlnet_mapping(
        "model.diffusion_model.controlnet", ("controlnet",), **kwargs))
    eng.params = {"model": _convert(sd, mapping)}

    cond_j = {
        "crossattn": jnp.asarray(crossattn_c),
        "concat": jnp.asarray(concat.transpose(0, 2, 3, 1)),
        "cond_feat": jnp.asarray(cond_feat.transpose(0, 2, 3, 1)),
    }
    uc_j = dict(cond_j, crossattn=jnp.asarray(crossattn_uc))
    samples = eng.sample(
        cond_j, uc=uc_j, batch_size=T, shape=(lat_h, lat_w, 4),
        noise=jnp.asarray(randn.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        _from_jax_nhwc(samples), ref_samples, atol=5e-3)


def test_vae_parity():
    """Encoder/Decoder + quant convs vs reference model.py:479-1010 through
    build_vae_mapping, incl. the asymmetric-pad downsample."""
    from panacea_tpu.models.vae import AutoencoderKL
    from panacea_tpu.utils.convert import build_vae_mapping

    dd = dict(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], in_channels=3, resolution=32, z_channels=4,
              double_z=True, dropout=0.0)
    enc = REF["model"].Encoder(**dd)
    dec = REF["model"].Decoder(**dd)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    for i, m in enumerate((enc, dec, quant, post_quant)):
        randomize_(m, seed=10 + i)

    rs = np.random.RandomState(4)
    img = rs.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments_ref = quant(enc(torch.from_numpy(img)))
        mean_ref = moments_ref[:, :4]
        dec_ref = dec(post_quant(mean_ref)).numpy()

    sd = {}
    sd.update(state_dict_numpy(enc, "fs.encoder"))
    sd.update(state_dict_numpy(dec, "fs.decoder"))
    sd.update(state_dict_numpy(quant, "fs.quant_conv"))
    sd.update(state_dict_numpy(post_quant, "fs.post_quant_conv"))
    params = _convert(sd, build_vae_mapping("fs", (), ch_mult=(1, 2),
                                            num_res_blocks=1))

    vae = AutoencoderKL(embed_dim=4, ddconfig=dd)
    mean = vae.apply({"params": params}, _to_jax_nhwc(torch.from_numpy(img)),
                     sample=False, method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        _from_jax_nhwc(mean), mean_ref.numpy(), atol=ATOL)
    dec_out = vae.apply({"params": params}, mean, method=AutoencoderKL.decode)
    np.testing.assert_allclose(_from_jax_nhwc(dec_out), dec_ref, atol=ATOL)
