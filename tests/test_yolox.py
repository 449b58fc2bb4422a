"""YOLOXHeadCustom port tests (perception/yolox_head.py vs reference
dense_heads/yolox_head.py:21-615)."""

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.perception.yolox_head import (
    YOLOXHead,
    bbox_decode,
    centers2d_decode,
    mlvl_priors,
    simota_assign,
    yolox_loss,
    yolox_targets,
)


def test_mlvl_priors():
    p = mlvl_priors([(2, 3), (1, 2)], [8, 16])
    assert p.shape == (8, 4)
    # first level: grid * stride, offset 0 (MlvlPointGenerator offset=0)
    np.testing.assert_allclose(p[0], [0, 0, 8, 8])
    np.testing.assert_allclose(p[5], [16, 8, 8, 8])
    np.testing.assert_allclose(p[6], [0, 0, 16, 16])


def test_bbox_decode_roundtrip():
    priors = mlvl_priors([(2, 2)], [8])
    # encode a known box: center (12, 4), wh (16, 8) at prior (8, 0, 8, 8)
    pred = np.zeros((1, 4, 4), np.float32)
    pred[0, 1] = [(12 - 8) / 8, (4 - 0) / 8, np.log(16 / 8), np.log(8 / 8)]
    out = np.asarray(bbox_decode(priors, jnp.asarray(pred)))
    np.testing.assert_allclose(out[0, 1], [4, 0, 20, 8], atol=1e-5)
    ctr = np.asarray(centers2d_decode(priors, jnp.asarray(pred[..., :2])))
    np.testing.assert_allclose(ctr[0, 1], [12, 4], atol=1e-5)


def test_simota_assigns_perfect_predictions():
    priors = mlvl_priors([(8, 8)], [8])
    g = np.array([[8.0, 8.0, 40.0, 40.0], [24.0, 24.0, 56.0, 56.0]],
                 np.float32)
    labels = np.array([1, 3])
    p = len(priors)
    decoded = np.tile(g[0], (p, 1))
    # half the priors predict gt0 perfectly, half gt1
    decoded[p // 2:] = g[1]
    cls = np.full((p, 10), -4.0, np.float32)
    cls[: p // 2, 1] = 4.0
    cls[p // 2:, 3] = 4.0
    obj = np.full(p, 4.0, np.float32)
    assigned, ious = simota_assign(cls, obj, priors, decoded, g, labels)
    pos = assigned >= 0
    assert pos.sum() >= 2
    assert set(np.unique(assigned[pos])) <= {0, 1}
    # matched priors predict their gt exactly -> iou 1
    np.testing.assert_allclose(ious[pos], 1.0, atol=1e-5)
    # each matched prior's offset center lies in its assigned gt box
    centers = priors[:, :2] + priors[:, 2:] * 0.5
    for i in np.where(pos)[0]:
        b = g[assigned[i]]
        r = 2.5 * priors[i, 2]
        gc = (b[:2] + b[2:]) / 2
        in_box = (b[0] <= centers[i, 0] <= b[2]
                  and b[1] <= centers[i, 1] <= b[3])
        in_ctr = (abs(centers[i] - gc) <= r).all()
        assert in_box or in_ctr


def test_head_forward_and_loss():
    head = YOLOXHead(num_classes=10, in_channels=32, feat_channels=32,
                     stacked_convs=1, strides=(8, 16, 32))
    feats = [jnp.ones((2, 8, 8, 32)), jnp.ones((2, 4, 4, 32)),
             jnp.ones((2, 2, 2, 32))]
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    outs = head.apply({"params": params}, feats)
    p = 8 * 8 + 4 * 4 + 2 * 2
    assert outs["enc_cls_scores"].shape == (2, p, 10)
    assert outs["enc_bbox_preds"].shape == (2, p, 4)
    assert outs["objectnesses"].shape == (2, p)
    assert outs["pred_centers2d_offset"].shape == (2, p, 2)

    priors = mlvl_priors([(8, 8), (4, 4), (2, 2)], [8, 16, 32])
    gt_b = [np.array([[8.0, 8.0, 40.0, 40.0]], np.float32),
            np.zeros((0, 4), np.float32)]
    gt_l = [np.array([2]), np.zeros((0,), np.int64)]
    ctrs = [np.array([[24.0, 24.0]], np.float32),
            np.zeros((0, 2), np.float32)]
    decoded = np.asarray(bbox_decode(priors, outs["enc_bbox_preds"]))
    tgt = yolox_targets(priors, np.asarray(outs["enc_cls_scores"]),
                        np.asarray(outs["objectnesses"]), decoded,
                        gt_b, gt_l, ctrs)
    assert tgt[-1] > 0  # some positives
    losses = yolox_loss(outs, priors, tgt, use_l1=True)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    # gradients flow through every loss term
    def total(params):
        o = head.apply({"params": params}, feats)
        return sum(yolox_loss(o, priors, tgt, use_l1=True).values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
