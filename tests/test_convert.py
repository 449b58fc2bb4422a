"""Checkpoint conversion tests.

1. Primitive layout transforms validated numerically against torch (cpu).
2. Full-tree mapping for the tiny engine: synthesized torch-style state dict
   -> converted tree must cover the engine's param tree exactly.
3. CLIP attention (packed qkv split) vs torch nn.MultiheadAttention.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_conv2d_transform_matches_torch():
    import flax.linen as fnn

    from panacea_tpu.utils.convert import _t_conv2d

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    fl = fnn.Conv(5, (3, 3), padding=1)
    params = {
        "kernel": jnp.asarray(_t_conv2d(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    out = fl.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_conv1d_transform_matches_torch():
    import flax.linen as fnn

    from panacea_tpu.utils.convert import _t_conv1d

    tconv = torch.nn.Conv1d(4, 4, 3, padding=1)
    x = np.random.RandomState(0).randn(2, 4, 8).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    fl = fnn.Conv(4, (3,), padding=1)
    params = {
        "kernel": jnp.asarray(_t_conv1d(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    out = fl.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, atol=1e-5
    )


def test_groupnorm_matches_torch():
    from panacea_tpu.models.layers import GroupNorm

    tgn = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.randn(8))
        tgn.bias.copy_(torch.randn(8))
    x = np.random.RandomState(1).randn(2, 8, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref = tgn(torch.from_numpy(x)).numpy()
    gn = GroupNorm(num_groups=4)
    params = {"GroupNorm_0": {
        "scale": jnp.asarray(tgn.weight.detach().numpy()),
        "bias": jnp.asarray(tgn.bias.detach().numpy()),
    }}
    out = gn.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_clip_attention_matches_torch_mha():
    from panacea_tpu.models.clip import CLIPAttention

    width, heads, seq = 32, 4, 10
    mha = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    x = np.random.RandomState(2).randn(2, seq, width).astype(np.float32)
    mask = torch.triu(torch.full((seq, seq), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(x), torch.from_numpy(x),
                     torch.from_numpy(x), attn_mask=mask, need_weights=False)
        ref = ref.numpy()

    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    c = width
    params = {
        "out_proj": {
            "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }
    for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
        params[name] = {
            "kernel": jnp.asarray(w[j * c:(j + 1) * c].T),
            "bias": jnp.asarray(b[j * c:(j + 1) * c]),
        }
    attn = CLIPAttention(width, heads)
    causal = jnp.triu(jnp.full((seq, seq), -jnp.inf, dtype=jnp.float32), k=1)
    out = attn.apply({"params": params}, jnp.asarray(x), causal)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_full_tree_mapping_covers_engine():
    import os

    import flax

    from panacea_tpu.config import load_config
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.convert import (
        build_controlnet_mapping,
        build_unet_mapping,
        build_vae_mapping,
        convert_state_dict,
    )

    cfg = load_config(os.path.join(
        os.path.dirname(__file__), "..", "panacea_tpu", "configs",
        "tiny_cpu.yaml",
    ))
    eng = instantiate_from_config(cfg["model"])
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(2, 24),
                    image_hw=(16, 192), abstract=True)
    target_flat = flax.traverse_util.flatten_dict(eng.params)

    m = eng.model
    kwargs = dict(
        model_channels=m.model_channels,
        channel_mult=tuple(m.channel_mult),
        num_res_blocks=m.num_res_blocks,
        attention_resolutions=tuple(m.attention_resolutions),
        transformer_depth=m.transformer_depth,
        insert_crossview=m.insert_crossview,
    )
    mapping = {}
    mapping.update(build_unet_mapping(
        "model.diffusion_model", ("model", "unet"), **kwargs))
    mapping.update(build_controlnet_mapping(
        "model.diffusion_model.controlnet", ("model", "controlnet"), **kwargs))
    dd = eng.first_stage_model.ddconfig
    mapping.update(build_vae_mapping(
        "first_stage_model", ("first_stage",),
        ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"]))

    # mapping must target exactly the engine's param paths (skip_conv and
    # nin_shortcut entries may be absent in the tree when channels match)
    mapped_paths = {path for path, _ in mapping.values()}
    target_paths = set(target_flat.keys())
    extra = {
        p for p in mapped_paths - target_paths
        if "skip_conv" not in p and "nin_shortcut" not in p
    }
    assert not extra, f"mapping targets nonexistent params: {sorted(extra)[:10]}"
    not_covered = target_paths - mapped_paths
    assert not not_covered, f"engine params not covered: {sorted(not_covered)[:10]}"

    # synthesize torch-layout state dict and convert
    inv = {
        "kernel-4": lambda a: np.transpose(a, (3, 2, 0, 1)),
        "kernel-3": lambda a: np.transpose(a, (2, 1, 0)),
        "kernel-2": lambda a: np.transpose(a),
    }
    sd = {}
    rs = np.random.RandomState(0)
    for ref_key, (path, _) in mapping.items():
        if path not in target_flat:
            continue
        arr = rs.randn(*target_flat[path].shape).astype(np.float32)
        if path[-1] in ("kernel", "conv_kernel"):
            arr_t = inv[f"kernel-{arr.ndim}"](arr)
        else:
            arr_t = arr
        sd[ref_key] = arr_t
    params, missing, unexpected = convert_state_dict(sd, mapping)
    assert not unexpected
    got_flat = flax.traverse_util.flatten_dict(params)
    for path in target_paths:
        assert path in got_flat, path
        assert got_flat[path].shape == target_flat[path].shape, path


def test_ema_weight_selection():
    """Checkpoints carry EMA shadows as model_ema.<dedotted-name> buffers
    (reference ema.py:5-26); apply_ema_weights must substitute them for the
    raw model.* weights and nothing else."""
    from panacea_tpu.utils.convert import apply_ema_weights, has_ema_weights

    rs = np.random.RandomState(0)
    raw = rs.randn(4, 3).astype(np.float32)
    ema = rs.randn(4, 3).astype(np.float32)
    other = rs.randn(2,).astype(np.float32)
    sd = {
        "model.diffusion_model.input_blocks.0.0.weight": raw,
        "model_ema.diffusion_modelinput_blocks00weight": ema,
        "model_ema.decay": np.float32(0.9999),
        "model_ema.num_updates": np.int32(40000),
        "first_stage_model.encoder.conv_in.weight": other,
    }
    assert has_ema_weights(sd)
    out, n = apply_ema_weights(sd)
    assert n == 1
    np.testing.assert_array_equal(
        out["model.diffusion_model.input_blocks.0.0.weight"], ema)
    np.testing.assert_array_equal(
        out["first_stage_model.encoder.conv_in.weight"], other)
    # no-EMA checkpoint: nothing swapped, detection false
    sd_plain = {"model.diffusion_model.x.weight": raw}
    assert not has_ema_weights(sd_plain)
    out2, n2 = apply_ema_weights(sd_plain)
    assert n2 == 0 and out2["model.diffusion_model.x.weight"] is raw


@pytest.mark.slow
def test_streampetr_mapping_covers_detector():
    """Detector mapping targets exactly the StreamPETRWindow param tree
    (2 decoder layers, tiny dims); synthesized torch sd converts cleanly."""
    import flax
    import jax.numpy as jnp

    from panacea_tpu.perception.detector import StreamPETRWindow
    from panacea_tpu.utils.convert import (
        build_fpn_mapping,
        build_resnet50_mapping,
        build_sparse_head_mapping,
        convert_state_dict,
    )

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2,
    )
    b, n = 1, 2
    imgs = jnp.zeros((b, 2, n, 64, 128, 3))
    data_seq = {
        "prev_exists": jnp.zeros((b, 2)),
        "timestamp": jnp.zeros((b, 2)),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
        "lidar2img": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    target = flax.traverse_util.flatten_dict(params)

    mapping = {}
    mapping.update(build_resnet50_mapping())
    mapping.update(build_fpn_mapping())
    mapping.update(build_sparse_head_mapping(num_layers=2))
    mapped = {path for path, _ in mapping.values()}
    target_paths = set(target.keys())

    # self-attn q/k/v come from the packed in_proj (handled separately);
    # FPN scales/neck extras may not exist at this tiny config
    not_covered = {
        p for p in target_paths - mapped
        if not (p[1].startswith("self_attn") and p[2] in
                ("q_proj", "k_proj", "v_proj"))
    }
    assert not not_covered, sorted(not_covered)[:8]
    extra = {p for p in mapped - target_paths}
    assert not extra, sorted(extra)[:8]


def test_vovnet_mapping_covers_backbone():
    """VoVNet mapping targets exactly the flax VoVNet tree (tiny V2-99-shaped
    config) and a synthesized mmdet-named torch sd converts cleanly."""
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.perception.vovnet import VoVNet
    from panacea_tpu.utils.convert import (
        build_vovnet_mapping,
        convert_state_dict,
    )

    nb, nl = (1, 2, 2, 1), 3
    model = VoVNet(stage_ch=(8, 8, 8, 8), concat_ch=(16, 16, 32, 32),
                   num_blocks=nb, num_layers=nl)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[
        "params"]
    target = flax.traverse_util.flatten_dict(params)
    mapping = build_vovnet_mapping(path_prefix=(), num_blocks=nb,
                                   num_layers=nl)
    mapped = {path for path, _ in mapping.values()}
    assert mapped == set(target.keys()), (
        sorted(mapped - set(target.keys()))[:5],
        sorted(set(target.keys()) - mapped)[:5])

    # synthesize a torch-shaped sd (invert the layout transforms) and convert
    rs = np.random.RandomState(0)
    sd = {}
    for ref, (path, _t) in mapping.items():
        shp = target[path].shape
        if ref.endswith("conv.weight") or ref.endswith("fc.weight"):
            shp = (shp[3], shp[2], shp[0], shp[1])  # flax conv -> torch
        sd[ref] = rs.randn(*shp).astype(np.float32)
    conv, missing, unexpected = convert_state_dict(sd, mapping)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    got = flax.traverse_util.flatten_dict(conv)
    assert all(got[p].shape == target[p].shape for p in target)


def test_vovnet_detector_wiring():
    """backbone_type='vovnet' builds and runs through the full detector."""
    import jax
    import jax.numpy as jnp

    from panacea_tpu.perception.detector import StreamPETRWindow

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2,
        backbone_type="vovnet", neck_start_level=2,
        backbone_cfg={"stage_ch": (8, 8, 8, 8), "concat_ch": (16, 16, 32, 32),
                      "num_blocks": (1, 1, 1, 1), "num_layers": 2},
    )
    b, n = 1, 2
    imgs = jnp.zeros((b, 2, n, 64, 128, 3))
    eye = jnp.eye(4)
    data_seq = {
        "prev_exists": jnp.zeros((b, 2)),
        "timestamp": jnp.zeros((b, 2)),
        "ego_pose": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "lidar2img": jnp.broadcast_to(eye, (b, 2, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(eye, (b, 2, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(eye, (b, 2, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    outs, memory = model.apply({"params": params}, imgs, data_seq)
    assert outs["all_cls_scores"].shape[-1] == 10


def test_petr_head_mapping_covers_detector():
    """PETR-head mapping + packed-qkv handling target exactly the
    StreamPETRWindow(head_type='petr') param tree."""
    import flax
    import jax
    import jax.numpy as jnp

    from panacea_tpu.perception.detector import StreamPETRWindow
    from panacea_tpu.utils.convert import (
        build_fpn_mapping,
        build_petr_head_mapping,
        build_resnet50_mapping,
    )

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2,
        head_type="petr", head_cfg={"depth_num": 8},
    )
    b, n = 1, 2
    imgs = jnp.zeros((b, 2, n, 64, 128, 3))
    eye = jnp.eye(4)
    l2i = jnp.broadcast_to(jnp.diag(jnp.asarray([100.0, 100.0, 1.0, 1.0])),
                           (b, 2, n, 4, 4))
    data_seq = {
        "prev_exists": jnp.zeros((b, 2)),
        "timestamp": jnp.zeros((b, 2)),
        "ego_pose": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(eye, (b, 2, 4, 4)),
        "lidar2img": l2i,
        "intrinsics": l2i,
        "extrinsics": jnp.broadcast_to(eye, (b, 2, n, 4, 4)),
    }
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    target = set(flax.traverse_util.flatten_dict(params).keys())

    mapping = {}
    mapping.update(build_resnet50_mapping())
    mapping.update(build_fpn_mapping())
    mapping.update(build_petr_head_mapping(num_layers=2))
    mapped = {path for path, _ in mapping.values()}

    # q/k/v of BOTH attentions come from packed in_proj (handled separately)
    not_covered = {
        p for p in target - mapped
        if not (p[1].startswith(("self_attn", "cross_attn")) and p[2] in
                ("q_proj", "k_proj", "v_proj"))
    }
    assert not not_covered, sorted(not_covered)[:8]
    extra = mapped - target
    assert not extra, sorted(extra)[:8]


@pytest.mark.slow
def test_panaceaplus_key_coverage():
    """Whole-checkpoint name-coverage proof (--dry_convert): every key of the
    panaceaplus state dict (fixture from scripts/dump_reference_keys.py,
    generated from the reference torch modules on the meta device) maps onto
    an existing flax param with the transformed shape — 0 unmapped, 0
    missing, 0 shape mismatches."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "inference.py", "--dry_convert"],
        capture_output=True, text=True, timeout=900, cwd=".",
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["ok"], rep
    assert rep["total_keys"] > 3000


def test_focal_and_yolox_mappings_cover_param_trees():
    """New aux-head converters map exactly onto the flax trees (same style
    as the petr coverage test)."""
    import flax

    from panacea_tpu.perception.focal_head import FocalHead
    from panacea_tpu.perception.yolox_head import YOLOXHead
    from panacea_tpu.utils.convert import (
        build_focal_head_mapping,
        build_yolox_head_mapping,
    )

    fh = FocalHead(embed_dims=32)
    p = fh.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 8, 16, 32)))["params"]
    target = set(flax.traverse_util.flatten_dict(p).keys())
    mapped = {path for path, _ in build_focal_head_mapping(
        path_prefix=()).values()}
    assert not (target - mapped), sorted(target - mapped)[:8]
    assert not (mapped - target), sorted(mapped - target)[:8]

    yh = YOLOXHead(num_classes=10, in_channels=32, feat_channels=32,
                   stacked_convs=2, strides=(8, 16, 32))
    feats = [jnp.ones((1, 8 // (2**i), 16 // (2**i), 32)) for i in range(3)]
    p = yh.init(jax.random.PRNGKey(0), feats)["params"]
    target = set(flax.traverse_util.flatten_dict(p).keys())
    mapped = {path for path, _ in build_yolox_head_mapping(
        path_prefix=(), num_levels=3, stacked_convs=2).values()}
    assert not (target - mapped), sorted(target - mapped)[:8]
    assert not (mapped - target), sorted(mapped - target)[:8]


def test_export_roundtrip_identity():
    """export_panacea_checkpoint is the exact inverse of
    convert_panacea_checkpoint: tiny engine -> torch state dict -> second
    engine; every param leaf (UNet/ControlNet/VAE + CLIP incl. re-packed
    qkv) must come back bit-identical, and the EMA shadow buffers must
    survive a prefer_ema=True reimport."""
    import os

    import flax

    from panacea_tpu.config import load_config
    from panacea_tpu.registry import instantiate_from_config
    from panacea_tpu.utils.convert import (
        convert_panacea_checkpoint,
        export_panacea_checkpoint,
    )

    def make_engine(seed):
        cfg = load_config(os.path.join(
            os.path.dirname(__file__), "..", "panacea_tpu", "configs",
            "tiny_cpu.yaml"))
        eng = instantiate_from_config(cfg["model"])
        eng.init_params(jax.random.PRNGKey(seed), latent_hw=(2, 24),
                        image_hw=(16, 192))
        return eng

    eng_a = make_engine(0)
    # a distinguishable EMA tree: params + 1
    ema = jax.tree.map(lambda x: x + 1.0, eng_a.params["model"])
    sd, skipped = export_panacea_checkpoint(eng_a, ema_params=ema)
    assert all("skip_connection" in k or "nin_shortcut" in k
               for k in skipped), skipped[:5]
    assert any(k.startswith("model_ema.") for k in sd)

    eng_b = make_engine(1)  # different init everywhere
    report = convert_panacea_checkpoint(dict(sd), eng_b)
    assert not report["unexpected"], report["unexpected"][:5]
    assert set(report["missing"]) == set(skipped)

    flat_a = flax.traverse_util.flatten_dict(eng_a.params)
    flat_b = flax.traverse_util.flatten_dict(eng_b.params)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[k], np.float32),
            np.asarray(flat_b[k], np.float32), err_msg=str(k))

    def clip_params(eng):
        for emb in eng.conditioner.embedders:
            if hasattr(emb, "model") and hasattr(emb, "tokenizer"):
                return emb.params
        return None

    ca, cb = clip_params(eng_a), clip_params(eng_b)
    if ca is not None:
        fa = flax.traverse_util.flatten_dict(ca)
        fb = flax.traverse_util.flatten_dict(cb)
        assert set(fa) == set(fb)
        for k in fa:
            np.testing.assert_array_equal(
                np.asarray(fa[k], np.float32),
                np.asarray(fb[k], np.float32), err_msg=str(k))

    # EMA path: prefer_ema swaps in the +1 shadows
    eng_c = make_engine(2)
    convert_panacea_checkpoint(dict(sd), eng_c, prefer_ema=True)
    fa = flax.traverse_util.flatten_dict(eng_a.params["model"])
    fc = flax.traverse_util.flatten_dict(eng_c.params["model"])
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fc[k], np.float32),
            np.asarray(fa[k], np.float32) + 1.0, atol=1e-6, err_msg=str(k))

    # EmaState / saved-EmaState-dict wrappers unwrap to the same shadows
    from panacea_tpu.utils.convert import export_model_ema_buffers
    from panacea_tpu.utils.ema import ema_init

    direct, _ = export_model_ema_buffers(eng_a, ema)
    for wrapped in (ema_init(ema),
                    {"ema_params": ema, "num_updates": np.int32(0)}):
        sd_w, _ = export_model_ema_buffers(eng_a, wrapped)
        assert set(sd_w) == set(direct)

    # a tree that does NOT mirror params['model'] must fail loudly,
    # not export a checkpoint with zero model_ema.* buffers
    with pytest.raises(ValueError, match="0 model_ema"):
        export_panacea_checkpoint(
            eng_a, ema_params={"bogus": np.zeros((2,), np.float32)})
