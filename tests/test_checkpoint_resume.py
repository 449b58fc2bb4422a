"""Full-state training checkpoints: rotation (reference mmcv
`checkpoint_config = dict(..., max_keep_ckpts=3)`, metrics/StreamPETR
config :274-277) and exact resume (`resume_from`, config :279).

The exact-resume contract here is STRONGER than mmcv's: the checkpoint
carries the optimizer state, step counter, and the host-side PRNG carries,
so a resumed run replays bit-identically the trajectory of an
uninterrupted one (mmcv only realigns the sampler at epoch granularity).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.utils.checkpoint import (
    is_train_checkpoint,
    latest_checkpoint,
    load_train_checkpoint,
    save_train_checkpoint,
)


def test_path_seed_is_process_stable():
    """Synthetic-data seeds must not depend on Python's per-process hash
    salt (PYTHONHASHSEED) — a resumed run regenerates the dataset in a new
    interpreter and must see the SAME images. Pinned value = crc32."""
    from panacea_tpu.data.nuscenes.synthetic import (
        path_seed,
        synthetic_image_loader,
    )

    assert path_seed("samples/CAM_FRONT/x.jpg") == 1770793987
    img = synthetic_image_loader("samples/CAM_FRONT/x.jpg")
    assert img.shape == (900, 1600, 3)
    np.testing.assert_array_equal(
        img, synthetic_image_loader("samples/CAM_FRONT/x.jpg"))


def test_rotation_and_latest(tmp_path):
    d = str(tmp_path)
    for s in (1, 2, 3, 40, 5):
        save_train_checkpoint(d, s, {"w": jnp.full((2,), s, jnp.float32)},
                              {"step": s}, max_keep=3)
    names = sorted(n for n in os.listdir(d)
                   if n.startswith("iter_") and not n.endswith(".pkl"))
    # numeric (not lexicographic) ordering: iter_40 is the newest
    assert set(names) == {"iter_3", "iter_5", "iter_40"}, names
    assert latest_checkpoint(d).endswith("iter_40")
    assert is_train_checkpoint(d)
    assert is_train_checkpoint(os.path.join(d, "iter_5"))
    assert not is_train_checkpoint(os.path.join(d, "nope"))
    # pruned checkpoints lose their meta sidecars too
    assert not os.path.exists(os.path.join(d, "iter_1.meta.pkl"))
    # dir resolves to the newest; explicit iter dir loads that iter
    tree, meta = load_train_checkpoint(d)
    assert meta["step"] == 40 and float(tree["w"][0]) == 40.0
    tree5, meta5 = load_train_checkpoint(os.path.join(d, "iter_5"))
    assert meta5["step"] == 5 and float(tree5["w"][0]) == 5.0


def test_detector_exact_resume(tmp_path):
    """checkpoint after 2 steps, continue 2 more == straight 4-step run,
    bit-identical params AND optimizer state, using the driver's rng-carry
    protocol (rng, sub = split(rng) per step; post-step carry saved)."""
    import optax

    from test_detection_train import PC, _tiny_setup

    from panacea_tpu.perception.train import (
        DetTrainState,
        init_detector_train,
        make_detector_train,
    )

    model, imgs, data_seq, params, gt_boxes, gt_labels = _tiny_setup()
    opt = optax.chain(optax.clip_by_global_norm(35.0), optax.adam(1e-3))
    _, train_step = make_detector_train(model, opt, PC, use_grid_mask=False,
                                        with_dn=False)

    def run(state, rng, n):
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            state, _ = train_step(state, sub, imgs, data_seq,
                                  gt_boxes, gt_labels)
        return state, rng

    # straight 4-step run, checkpointing at step 2 like the driver does
    state, rng = run(init_detector_train(model, opt, params),
                     jax.random.PRNGKey(7), 2)
    save_train_checkpoint(
        str(tmp_path), 2,
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step},
        {"step": 2, "rng_key": np.asarray(rng)})
    gold, _ = run(state, rng, 2)

    # resume: fresh template, restore, continue
    fresh = init_detector_train(model, opt, params)
    tree, meta = load_train_checkpoint(
        str(tmp_path), {"params": fresh.params, "opt_state": fresh.opt_state,
                        "step": fresh.step})
    assert meta["step"] == 2
    resumed = DetTrainState(tree["params"], tree["opt_state"], tree["step"])
    assert int(resumed.step) == 2
    resumed, _ = run(resumed, jnp.asarray(meta["rng_key"]), 2)

    assert int(gold.step) == int(resumed.step) == 4
    for a, b in zip(jax.tree.leaves(gold.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(gold.opt_state),
                    jax.tree.leaves(resumed.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
