"""Detection training loss tests: focal loss math, Hungarian matching,
end-to-end loss on tiny head outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.perception.train_losses import (
    detection_loss_single,
    focal_cls_cost,
    hungarian_assign,
    sigmoid_focal_loss,
)

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_focal_loss_background_low_for_negative_logits():
    logits = jnp.full((4, 10), -10.0)
    labels = jnp.full((4,), 10)  # background
    l = sigmoid_focal_loss(logits, labels, 10)
    assert float(l.max()) < 1e-3
    # confident wrong prediction is penalized
    logits = logits.at[0, 3].set(10.0)
    l2 = sigmoid_focal_loss(logits, labels, 10)
    assert float(l2[0]) > 1.0


def test_hungarian_assign_prefers_low_cost():
    cost = np.array([[0.1, 5.0], [5.0, 0.2], [3.0, 3.0]])
    rows, cols = hungarian_assign(cost)
    pairs = dict(zip(rows.tolist(), cols.tolist()))
    assert pairs[0] == 0 and pairs[1] == 1


def test_detection_loss_perfect_predictions_small():
    rs = np.random.RandomState(0)
    g = 5
    gt_boxes = np.zeros((g, 9))
    gt_boxes[:, :2] = rs.uniform(-30, 30, (g, 2))
    gt_boxes[:, 3:6] = rs.uniform(1, 3, (g, 3))
    gt_boxes[:, 6] = rs.uniform(-3, 3, g)
    gt_labels = rs.randint(0, 10, g)

    q = 20
    logits = np.full((q, 10), -8.0, dtype=np.float32)
    preds = np.zeros((q, 10), dtype=np.float32)
    preds[:, 3:6] = 0.5
    # first g queries predict the gt perfectly
    from panacea_tpu.perception.coder import normalize_bbox

    gt_norm = np.asarray(normalize_bbox(jnp.asarray(gt_boxes)))
    preds[:g] = gt_norm
    for i in range(g):
        logits[i, gt_labels[i]] = 8.0

    out = detection_loss_single(
        jnp.asarray(logits), jnp.asarray(preds), gt_boxes, gt_labels, PC
    )
    assert float(out["loss_bbox"]) < 1e-3
    assert float(out["loss_cls"]) < 0.05

    # scrambled predictions cost more
    out_bad = detection_loss_single(
        jnp.asarray(logits),
        jnp.asarray(preds + rs.normal(0, 1, preds.shape).astype(np.float32)),
        gt_boxes, gt_labels, PC,
    )
    assert float(out_bad["loss_bbox"]) > float(out["loss_bbox"])


def test_detection_loss_empty_gt():
    out = detection_loss_single(
        jnp.zeros((8, 10)), jnp.zeros((8, 10)),
        np.zeros((0, 9)), np.zeros((0,), dtype=int), PC,
    )
    assert np.isfinite(float(out["loss_cls"]))
    assert float(out["loss_bbox"]) == 0.0


def _tiny_setup(with_atss=False, b=1):
    from panacea_tpu.perception.detector import StreamPETRWindow

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=2, pc_range=PC,
        with_atss=with_atss, atss_stacked_convs=1,
    )
    n, h, w = 2, 64, 128
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 2, n, h, w, 3))
    ones = jnp.ones((b, 2))
    data_seq = {
        "prev_exists": ones * jnp.asarray([0.0, 1.0]),
        "timestamp": ones * jnp.asarray([0.0, 0.5]),
        "ego_pose": jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
        "ego_pose_inv": jnp.broadcast_to(jnp.eye(4), (b, 2, 4, 4)),
        "lidar2img": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
        "intrinsics": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, 2, n, 4, 4)),
    }
    # with_atss params only materialize on the training path
    method = model.train_window if with_atss else None
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq,
                        method=method)["params"]

    rs = np.random.RandomState(0)
    g = 3
    gt_boxes = np.zeros((b, g, 9), np.float32)
    gt_boxes[..., :2] = rs.uniform(-20, 20, (b, g, 2))
    gt_boxes[..., 3:6] = rs.uniform(1, 3, (b, g, 3))
    gt_labels = rs.randint(0, 10, (b, g))
    return model, imgs, data_seq, params, gt_boxes, gt_labels


def test_detector_train_step_reduces_loss():
    import optax

    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    model, imgs, data_seq, params, gt_boxes, gt_labels = _tiny_setup()
    # per-layer Hungarian re-matching makes single-step losses noisy;
    # compare window means (the 150-step overfit test is the strong
    # convergence check)
    opt = optax.chain(optax.clip_by_global_norm(35.0), optax.adam(1e-3))
    _, train_step = make_detector_train(model, opt, PC, use_grid_mask=False,
                                        with_dn=False)
    state = init_detector_train(model, opt, params)
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(10):
        state, m = train_step(state, jax.random.fold_in(rng, i), imgs,
                              data_seq, gt_boxes, gt_labels)
        losses.append(m["loss"])
    assert np.isfinite(losses).all()
    assert np.mean(losses[5:]) < np.mean(losses[:5]), losses


@pytest.mark.slow
def test_full_recipe_all_loss_terms_nonzero():
    """3-step smoke of the complete experiment recipe: GridMask + DN branch +
    ATSS aux head + batched (B=2) Hungarian assignment, one forward per step
    (streampetr_r50_atss_512x256_window.py:36-276)."""
    from panacea_tpu.perception.atss import fpn_shapes, grid_anchors
    from panacea_tpu.perception.train import (
        atss_targets,
        cosine_schedule,
        init_detector_train,
        make_detector_optimizer,
        make_detector_train,
    )

    b = 2
    model, imgs, data_seq, params, gt_boxes, gt_labels = _tiny_setup(
        with_atss=True, b=b)
    # second sample: one fewer gt (tests -1 padding in batched assignment)
    gt_labels[1, -1] = -1

    h, w, n = 64, 128, 2
    anchors = grid_anchors(fpn_shapes((h, w)))
    rs = np.random.RandomState(1)
    gt2d_boxes, gt2d_labels = [], []
    for _ in range(b * n):
        x0, y0 = rs.uniform(0, w / 2), rs.uniform(0, h / 2)
        gt2d_boxes.append(
            np.array([[x0, y0, x0 + rs.uniform(16, 48),
                       y0 + rs.uniform(16, 32)]], np.float32))
        gt2d_labels.append(rs.randint(0, 10, 1))
    tgt2d = atss_targets(anchors, gt2d_boxes, gt2d_labels)
    assert float(tgt2d.num_pos) > 0

    sched = cosine_schedule(base_lr=1e-3, warmup_iters=2, total_iters=10)
    opt = make_detector_optimizer(schedule=sched)
    _, train_step = make_detector_train(
        model, opt, PC, use_grid_mask=True, with_dn=True, dn_scalar=2,
        anchors_per_level=anchors,
    )
    state = init_detector_train(model, opt, params)
    rng = jax.random.PRNGKey(3)
    for i in range(3):
        state, m = train_step(state, jax.random.fold_in(rng, i), imgs,
                              data_seq, gt_boxes, gt_labels, tgt2d)
    for k in ("loss_cls", "loss_bbox", "loss_dn", "loss_atss_cls",
              "loss_atss_bbox", "loss_atss_ctr"):
        assert k in m and np.isfinite(m[k]) and m[k] != 0.0, (k, m)
    assert int(state.step) == 3


def test_ddp_mesh_step_matches_per_shard_mean():
    """make_detector_train(mesh=...) is the reference's DDP gradient
    allreduce (tools/train.py -> MMDistributedDataParallel): a dp=2 mesh
    step over a B=2 batch must report EXACTLY the mean of the two
    single-sample unsharded losses (per-shard Hungarian + per-shard
    normalization, grads/metrics pmean'd), and the updated params must
    stay replicated and finite."""
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    model, imgs, data_seq, params, gt_boxes, gt_labels = _tiny_setup(b=2)
    opt = optax.chain(optax.clip_by_global_norm(35.0), optax.adam(1e-3))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("dp",))

    _, step_m = make_detector_train(model, opt, PC, use_grid_mask=False,
                                    with_dn=False, mesh=mesh)
    state = init_detector_train(model, opt, params)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    rng = jax.random.PRNGKey(5)
    state, mm = step_m(state, rng, imgs, data_seq, gt_boxes, gt_labels)

    # gold: the unsharded step on each half-batch (rng unused: gridmask/dn
    # off), averaged — plain DDP loss semantics
    _, step_u = make_detector_train(model, opt, PC, use_grid_mask=False,
                                    with_dn=False)
    halves = []
    for s in range(2):
        st = init_detector_train(model, opt, params)
        _, mu = step_u(st, rng, imgs[s:s + 1],
                       {k: v[s:s + 1] for k, v in data_seq.items()},
                       gt_boxes[s:s + 1], gt_labels[s:s + 1])
        halves.append(mu["loss"])
    assert np.isfinite(mm["loss"])
    assert abs(mm["loss"] - np.mean(halves)) < 1e-4, (mm["loss"], halves)
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_ddp_reduce_mean_matches_global_batch_gradient():
    """mmdet ``reduce_mean`` semantics (streampetr_head.py:824-834,
    atss_head.py:310-328): with UNEQUAL GT counts per shard, the dp=2 step
    must apply the same parameter update as the unsharded whole-batch step —
    avg factors are pmean'd before normalizing, so pmean'd grads are the
    ratio-of-sums gradient, not a mean of per-shard ratios."""
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    model, imgs, data_seq, params, gt_boxes, gt_labels = _tiny_setup(b=2)
    # sample 1 keeps ONE GT box (pad the rest with label -1 / zero boxes):
    # per-shard n_pos becomes 3 vs 1 — mean-of-ratios would diverge here
    gt_labels = gt_labels.copy()
    gt_boxes = gt_boxes.copy()
    gt_labels[1, 1:] = -1
    gt_boxes[1, 1:] = 0.0

    opt = optax.sgd(1e-2)  # linear in grads: update equality == grad equality
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("dp",))
    rng = jax.random.PRNGKey(7)

    _, step_m = make_detector_train(model, opt, PC, use_grid_mask=False,
                                    with_dn=False, mesh=mesh)
    state_m = jax.device_put(init_detector_train(model, opt, params),
                             NamedSharding(mesh, P()))
    state_m, _ = step_m(state_m, rng, imgs, data_seq, gt_boxes, gt_labels)

    _, step_u = make_detector_train(model, opt, PC, use_grid_mask=False,
                                    with_dn=False)
    state_u = init_detector_train(model, opt, params)
    state_u, _ = step_u(state_u, rng, imgs, data_seq, gt_boxes, gt_labels)

    flat_m = jax.tree.leaves(state_m.params)
    flat_u = jax.tree.leaves(state_u.params)
    for a, b in zip(flat_m, flat_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_frozen_bn_stats_never_updated():
    """FrozenBatchNorm running mean/var are torch BUFFERS: they must receive
    zero optimizer updates everywhere (backbone AND head towers), even with
    backbone_bn_trainable=True, while the bn scale/bias affines still train
    (mmdet norm_eval buffer semantics; the reference optimizer never sees
    running stats)."""
    import optax

    from panacea_tpu.perception.train import make_detector_optimizer

    params = {
        "backbone": {"bn1": {"scale": jnp.ones(4), "bias": jnp.zeros(4),
                             "mean": jnp.zeros(4), "var": jnp.ones(4)},
                     "conv_x": {"kernel": jnp.ones((1, 1, 4, 4))}},
        "head": {"tower_bn": {"scale": jnp.ones(4), "bias": jnp.zeros(4),
                              "mean": jnp.zeros(4), "var": jnp.ones(4)}},
    }
    opt = make_detector_optimizer(backbone_bn_trainable=True)
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, st, params)
    for scope in ("backbone", "head"):
        bn = updates[scope]["bn1" if scope == "backbone" else "tower_bn"]
        assert float(jnp.abs(bn["mean"]).max()) == 0.0, scope
        assert float(jnp.abs(bn["var"]).max()) == 0.0, scope
        assert float(jnp.abs(bn["scale"]).max()) > 0.0, scope
        assert float(jnp.abs(bn["bias"]).max()) > 0.0, scope
    assert float(jnp.abs(updates["backbone"]["conv_x"]["kernel"]).max()) > 0


@pytest.mark.slow
def test_overfit_synthetic_nonzero_map():
    """Convergence evidence, not just wiring (VERDICT r2 weak #5): ~150
    steps overfitting one synthetic window must drive the matching loss
    down substantially AND yield nonzero mAP through the real
    coder.decode -> evaluate_detections path (reference recipe
    window.py:253-276 at toy scale)."""
    import optax

    from panacea_tpu.perception.coder import NMSFreeCoder
    from panacea_tpu.perception.metrics import evaluate_detections
    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    model, imgs, data_seq, params, gt_boxes, gt_labels = _tiny_setup()
    # grad clip + warmup as in the reference recipe (window.py:266-274) —
    # the un-normalized MLNv2 spatial alignment NaNs at aggressive lr from
    # random init (the real recipe starts from a pretrained backbone)
    lr, warm = 5e-4, 10
    sched = optax.join_schedules(
        [optax.linear_schedule(lr / 10, lr, warm),
         optax.constant_schedule(lr)], [warm])
    opt = optax.chain(optax.clip_by_global_norm(25.0),
                      optax.scale_by_adam(),
                      optax.scale_by_schedule(lambda c: -sched(c)))
    _, train_step = make_detector_train(model, opt, PC, use_grid_mask=False,
                                        with_dn=False)
    state = init_detector_train(model, opt, params)
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(150):
        state, m = train_step(state, jax.random.fold_in(rng, i), imgs,
                              data_seq, gt_boxes, gt_labels)
        losses.append(m["loss"])
    assert np.isfinite(losses).all()
    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    assert last < 0.5 * first, (first, last)

    outs, _ = model.apply({"params": state.params}, imgs, data_seq)
    dets = NMSFreeCoder(pc_range=PC, max_num=12).decode(outs)[0]
    preds = [{"boxes": dets["bboxes"], "labels": dets["labels"],
              "scores": dets["scores"]}]
    gts = [{"boxes": gt_boxes[0], "labels": gt_labels[0]}]
    metrics = evaluate_detections(preds, gts)
    assert np.isfinite(metrics["NDS"])
    assert metrics["mAP"] > 0.0, metrics


def test_layer_decay_scales():
    """LLRD multipliers (reference layer_decay_optimizer_constructor.py):
    embeddings deepest decay, later blocks higher lr, head at full lr."""
    from panacea_tpu.perception.train import (
        layer_decay_scales,
        scale_by_layer_decay,
    )

    params = {
        "backbone": {
            "patch_embed": {"kernel": jnp.ones((2, 2))},
            "block_0": {"w": jnp.ones(2)},
            "block_11": {"w": jnp.ones(2)},
            "adapter": {"w": jnp.ones(2)},
        },
        "head": {"w": jnp.ones(2)},
    }
    s = layer_decay_scales(params, decay_rate=0.9, num_layers=12)
    assert abs(s["backbone"]["patch_embed"]["kernel"] - 0.9**13) < 1e-9
    assert abs(s["backbone"]["block_0"]["w"] - 0.9**12) < 1e-9
    assert abs(s["backbone"]["block_11"]["w"] - 0.9**1) < 1e-9
    assert s["backbone"]["adapter"]["w"] == 1.0
    assert s["head"]["w"] == 1.0

    tx = scale_by_layer_decay(0.9, 12)
    state = tx.init(params)
    ups, _ = tx.update(params, state)
    assert float(ups["backbone"]["block_11"]["w"][0]) == pytest.approx(0.9)
    assert float(ups["head"]["w"][0]) == 1.0
