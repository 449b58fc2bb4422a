"""Golden parity: flax EVA-02 backbone vs the reference torch EVAViT
(metrics/StreamPETR/projects/mmdet3d_plugin/models/backbones/eva.py) through
the weight converter — rope tables, q/v-bias attention, sub-LN SwiGLU,
residual bottleneck, and the SimpleFeaturePyramid adapter all covered by one
forward comparison."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_loader import load_reference_eva, randomize_, state_dict_numpy

ATOL = 2e-4


@pytest.mark.slow
def test_eva_backbone_parity():
    ref_eva = load_reference_eva()

    width, heads, depth = 32, 2, 3
    img = 64  # 4x4 token grid at patch 16
    win = 2
    window_idx = (0, 2)
    residual_idx = (1,)

    tm = ref_eva.EVAViT(
        img_size=img,
        patch_size=16,
        embed_dim=width,
        depth=depth,
        num_heads=heads,
        window_size=win,
        global_window_size=0,
        window_block_indexes=window_idx,
        residual_block_indexes=residual_idx,
        drop_path_rate=0.0,
        use_abs_pos=True,
        pretrain_img_size=img,
        pt_hw_seq_len=16,
        intp_freq=True,
        xattn=False,
        sim_fpn=dict(scale_factors=[4.0, 2.0, 1.0, 0.5],
                     in_channels=width, out_channels=16,
                     out_indices=[2, 3, 4, 5]),
    )
    tm.eval()
    randomize_(tm, seed=3)

    from panacea_tpu.perception.eva import EVAViT
    from panacea_tpu.utils.convert import (
        build_eva_mapping,
        convert_eva_pos_embed,
        convert_state_dict,
    )

    fm = EVAViT(width=width, heads=heads, layers=depth, window_size=win,
                window_block_indexes=window_idx,
                residual_block_indexes=residual_idx,
                pt_hw_seq_len=16, out_channels=16)

    sd = state_dict_numpy(tm)
    mapping = build_eva_mapping(prefix="", path_prefix=(), depth=depth,
                                residual_block_indexes=residual_idx)
    mapping = {k.lstrip("."): v for k, v in mapping.items()}
    params, missing, unexpected = convert_state_dict(sd, mapping)
    unexpected = [k for k in unexpected if "freqs_" not in k]  # rope buffers
    assert not missing, missing[:8]
    assert [k for k in unexpected if k != "pos_embed"] == [], unexpected[:8]
    params["pos_embed"] = convert_eva_pos_embed(
        sd["pos_embed"], (img // 16, img // 16), use_cls_token=True)

    x = np.random.RandomState(0).randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    outs_j = fm.apply({"params": params}, jnp.asarray(x))

    assert len(outs_t) == len(outs_j) == 4
    for ot, oj in zip(outs_t, outs_j):
        np.testing.assert_allclose(
            np.asarray(oj).transpose(0, 3, 1, 2), ot.numpy(), atol=ATOL)
