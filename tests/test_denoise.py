"""DN (denoising) training branch: mask construction, isolation semantics
(match queries blind to DN queries), dn loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.perception.denoise import (
    build_dn_attn_mask,
    dn_loss,
    prepare_dn,
)
from panacea_tpu.perception.detector import StreamPETRWindow
from panacea_tpu.perception.head import init_memory

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_dn_mask_structure():
    m = build_dn_attn_mask(pad_size=6, num_query=4, num_propagated=2,
                           memory_len=5, scalar=3)
    assert m.shape == (6 + 4 + 2, 6 + 4 + 5)
    # match queries blocked from dn columns
    assert (m[6:, :6] < -1e8).all()
    # dn group 0 blocked from groups 1,2 but sees itself
    assert (m[0:2, 2:6] < -1e8).all()
    assert (m[0:2, 0:2] == 0).all()
    # group 1 blocked from 0 and 2
    assert (m[2:4, 0:2] < -1e8).all()
    assert (m[2:4, 4:6] < -1e8).all()
    # everyone sees match queries and memory
    assert (m[:, 6:] == 0).all()


def _setup(dn_pack):
    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2, pc_range=PC,
    )
    b, n, h, w = 1, 2, 64, 128
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, n, h, w, 3))
    data = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "lidar2img": jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4)),
    }
    mem = init_memory(b, 24, 32)
    params = model.init(jax.random.PRNGKey(0), imgs, mem, data,
                        method=model.forward_frame, dn=dn_pack)["params"]
    return model, params, imgs, mem, data


def make_pack(seed=0, gmax=3, scalar=2):
    rs = np.random.RandomState(seed)
    boxes = np.zeros((1, gmax, 9), dtype=np.float32)
    boxes[0, :2, :2] = rs.uniform(-20, 20, (2, 2))
    boxes[0, :2, 3:6] = 2.0
    boxes[0, 2, 3:6] = 1.0  # padded slot still needs nonzero size for log
    labels = np.array([[1, 4, -1]])
    return prepare_dn(
        jax.random.PRNGKey(seed), jnp.asarray(boxes), jnp.asarray(labels),
        num_query=12, num_propagated=8, memory_len=24, pc_range=PC,
        scalar=scalar, num_classes=10,
    )


@pytest.mark.slow
def test_dn_forward_and_isolation():
    pack = make_pack(0)
    model, params, imgs, mem, data = _setup(pack)
    outs, _ = model.apply({"params": params}, imgs, mem, data,
                          method=model.forward_frame, dn=pack)
    assert outs["dn_cls_scores"].shape[2] == pack.pad_size
    assert outs["all_cls_scores"].shape[2] == 12 + 8

    # perturb the DN references: match-query outputs must NOT change
    pack2 = pack._replace(ref=jnp.clip(pack.ref + 0.3, 0, 1))
    outs2, _ = model.apply({"params": params}, imgs, mem, data,
                           method=model.forward_frame, dn=pack2)
    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        np.asarray(outs2["all_cls_scores"]), atol=1e-5,
    )
    # while DN outputs DO change
    assert np.abs(
        np.asarray(outs["dn_cls_scores"]) - np.asarray(outs2["dn_cls_scores"])
    ).max() > 1e-4


@pytest.mark.slow
def test_dn_loss_finite_and_grads():
    pack = make_pack(1)
    model, params, imgs, mem, data = _setup(pack)

    def loss_fn(p):
        outs, _ = model.apply({"params": p}, imgs, mem, data,
                              method=model.forward_frame, dn=pack)
        return dn_loss(outs["dn_cls_scores"], outs["dn_bbox_preds"], pack, PC)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_dn_forward_petr_head():
    """The DN branch runs through the PETR head too: same isolation
    semantics (the dense cross-attn ignores the DN mask; only the self-attn
    applies it, as in the reference PETRTemporalDecoderLayer
    attn_masks=[mask, None])."""
    pack = make_pack(0)
    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2, pc_range=PC,
        head_type="petr", head_cfg={"depth_num": 8},
    )
    b, n, h, w = 1, 2, 64, 128
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, n, h, w, 3))
    l2i = jnp.broadcast_to(jnp.diag(jnp.asarray([100.0, 100.0, 1.0, 1.0])),
                           (b, n, 4, 4))
    data = {
        "prev_exists": jnp.zeros((b,)),
        "timestamp": jnp.zeros((b,)),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
        "lidar2img": l2i,
        "intrinsics": l2i,
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4)),
    }
    mem = init_memory(b, 24, 32)
    params = model.init(jax.random.PRNGKey(0), imgs, mem, data,
                        method=model.forward_frame, dn=pack)["params"]
    outs, _ = model.apply({"params": params}, imgs, mem, data,
                          method=model.forward_frame, dn=pack)
    assert outs["dn_cls_scores"].shape[2] == pack.pad_size
    assert outs["all_cls_scores"].shape[2] == 12 + 8

    pack2 = pack._replace(ref=jnp.clip(pack.ref + 0.3, 0, 1))
    outs2, _ = model.apply({"params": params}, imgs, mem, data,
                           method=model.forward_frame, dn=pack2)
    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        np.asarray(outs2["all_cls_scores"]), atol=1e-5,
    )
    assert np.abs(
        np.asarray(outs["dn_cls_scores"]) - np.asarray(outs2["dn_cls_scores"])
    ).max() > 1e-4
