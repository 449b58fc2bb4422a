"""Multi-device tests on the 8-device virtual CPU mesh: sharded training step
compiles + runs, and matches the single-device result."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.config import load_config
from panacea_tpu.parallel.mesh import make_mesh
from panacea_tpu.parallel.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from panacea_tpu.registry import instantiate_from_config

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "panacea_tpu", "configs", "tiny_cpu.yaml"
)

T, IH, IW = 8, 16, 192
LH, LW = 2, 24


@pytest.fixture(scope="module")
def engine8():
    cfg = load_config(CFG_PATH)
    # 8 frames so the 't' axis matches the 8-device mesh
    import panacea_tpu.config as C

    cfg = C.apply_dotlist(
        cfg,
        [
            "model.params.network_config.params.num_frames=8",
            "model.params.network_config.params.controlnet_config.params.num_frames=8",
            "loss_fn_config.params.num_frames=8",
        ],
    )
    eng = instantiate_from_config(cfg["model"])
    eng.loss_fn = instantiate_from_config(cfg["loss_fn_config"])
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(LH, LW), image_hw=(IH, IW))
    return eng


def make_batch(b=1):
    rng = np.random.RandomState(0)
    jpg = rng.uniform(-1, 1, (b, T, IH, IW, 3)).astype(np.float32)
    cond_img = rng.uniform(0, 1, (b, T, IH, IW, 19)).astype(np.float32)
    fcz = np.zeros((b, T, IH, IW, 3), dtype=np.float32)
    fcz[:, -1] = jpg[:, -1]
    return {
        "jpg": jpg,
        "cond_img": cond_img,
        "final_cond_zero": fcz,
        "txt": ["night, rain"] * b,
    }


def test_mesh_construction():
    mesh = make_mesh(8, dp=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dp", "t")


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(engine8):
    assert len(jax.devices()) == 8
    eng = engine8
    batch = make_batch()
    cond = eng.conditioner(batch)
    jpg = jnp.asarray(batch["jpg"])
    rng = jax.random.PRNGKey(42)
    opt = make_optimizer(lr=1e-3)

    # single-device reference
    state0 = init_train_state(eng, opt)
    step1 = make_train_step(eng, opt, mesh=None, donate=False)
    state_a, loss_a = step1(state0, eng.params["first_stage"], jpg, cond, rng)

    # 8-device mesh: 1 clip x 8 frames
    mesh = make_mesh(8, dp=1)
    stepN = make_train_step(eng, opt, mesh=mesh, donate=False)
    state_b, loss_b = stepN(state0, eng.params["first_stage"], jpg, cond, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_sharded_sampling_runs(engine8):
    """Inference path under a mesh: conditioning sharded, sample executes."""
    eng = engine8
    batch = make_batch()
    log = eng.log_images(batch, N=1, rng=jax.random.PRNGKey(0))
    assert log["samples"].shape == (T, IH, IW, 3)
    assert np.all(np.isfinite(np.asarray(log["samples"])))


@pytest.mark.slow
def test_sharded_sampling_matches_unsharded(engine8):
    """engine.set_mesh shards the sample path over 8 devices; results must
    match the unsharded run bit-for-bit (same rng)."""
    eng = engine8
    batch = make_batch()
    rng = jax.random.PRNGKey(11)
    log_a = eng.log_images(batch, N=1, rng=rng)
    eng.set_mesh(make_mesh(8, dp=1))
    try:
        log_b = eng.log_images(batch, N=1, rng=rng)
    finally:
        eng.set_mesh(None)
    np.testing.assert_allclose(
        np.asarray(log_a["samples"]), np.asarray(log_b["samples"]),
        atol=2e-4,
    )


def test_dual_lr_optimizer_groups():
    import optax
    from panacea_tpu.parallel.train import make_optimizer

    params = {
        "spatial_conv": {"kernel": jnp.ones((2, 2))},
        "in_conv_temporal": {"kernel": jnp.ones((2, 2))},
    }
    opt = make_optimizer(lr=1.0, weight_decay=0.0, spatial_lr_rate=0.1)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # temporal step ~10x the spatial step
    s = float(jnp.abs(updates["spatial_conv"]["kernel"]).mean())
    t = float(jnp.abs(updates["in_conv_temporal"]["kernel"]).mean())
    assert t / s > 5.0


@pytest.mark.slow
def test_view_sharded_sampling_matches_unsharded(engine8):
    """('dp','t','view') mesh: panorama width sharded over views with the
    ppermute ring cross-view attention; sampled output must match the
    unsharded run (VERDICT r1 item 4)."""
    eng = engine8
    batch = make_batch()
    rng = jax.random.PRNGKey(12)
    log_a = eng.log_images(batch, N=1, rng=rng)
    eng.set_mesh(make_mesh(8, dp=1, view=2))  # t=4 x view=2
    try:
        log_b = eng.log_images(batch, N=1, rng=rng)
    finally:
        eng.set_mesh(None)
    np.testing.assert_allclose(
        np.asarray(log_a["samples"]), np.asarray(log_b["samples"]),
        atol=2e-4,
    )


def test_fsdp_sharding_specs():
    """ZeRO-leaf rule: largest divisible dim sharded over ALL mesh axes,
    small / indivisible leaves replicated (parallel/mesh.py fsdp_sharding)."""
    from jax.sharding import PartitionSpec as P
    from panacea_tpu.parallel.mesh import fsdp_sharding

    mesh = make_mesh(8, dp=2)  # axes ('dp','t') = 2x4
    tree = {
        "w": jnp.zeros((24, 17)),     # 24 % 8 == 0 -> shard dim 0
        "w2": jnp.zeros((17, 48)),    # 48 % 8 == 0 -> shard dim 1 (largest)
        "odd": jnp.zeros((7, 9)),     # nothing divides -> replicated
        "bias": jnp.zeros((48,)),     # under min_size -> replicated
        "scalar": jnp.zeros(()),
    }
    s = fsdp_sharding(mesh, tree, min_size=64)
    assert s["w"].spec == P(("dp", "t"))
    assert s["w2"].spec == P(None, ("dp", "t"))
    assert s["odd"].spec == P()
    assert s["bias"].spec == P()
    assert s["scalar"].spec == P()


@pytest.mark.slow
def test_fsdp_production_state_bytes_shard_8x():
    """At PRODUCTION geometry (full model width), the ZeRO leaf rule must
    shard essentially all of the training state: per-device bytes of
    params + AdamW(mu, nu) under fsdp_sharding over 8 devices must be
    < 1/6 of the replicated total (perfect would be 1/8; biases/norm
    scales stay replicated). Pure eval_shape — no arrays, no compile, but
    the full-width Python trace of model.init costs ~28 s -> slow tier."""
    import os as _os

    from panacea_tpu.config import load_config
    from panacea_tpu.parallel.mesh import fsdp_sharding
    from panacea_tpu.registry import instantiate_from_config

    cfg = load_config(_os.path.join(
        _os.path.dirname(__file__), "..", "panacea_tpu", "configs",
        "inference_nuscenes.yaml"))
    eng = instantiate_from_config(cfg["model"])
    t = eng.num_frames
    lh, lw, ih, iw = 32, 384, 256, 3072
    x0 = jnp.zeros((t, lh, lw, 8), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: eng.model.init(
            k, x0, jnp.zeros((t,), jnp.int32),
            jnp.zeros((1, 77, 1024), jnp.float32),
            hint=jnp.zeros((t, ih, iw, 19), jnp.float32))["params"],
        jax.random.PRNGKey(0),
    )
    # params + mu + nu (AdamW state mirrors the param tree)
    state_shapes = {"params": shapes, "mu": shapes, "nu": shapes}
    mesh = make_mesh(8, dp=2)
    sh = fsdp_sharding(mesh, state_shapes)

    def per_device_bytes(leaf, s):
        factor = 1
        for ax in s.spec:
            if ax is None:
                continue
            names = ax if isinstance(ax, tuple) else (ax,)
            for nm in names:
                factor *= mesh.shape[nm]
        return leaf.size * leaf.dtype.itemsize // factor

    total = sum(l.size * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(state_shapes))
    per_dev = sum(per_device_bytes(l, s) for l, s in zip(
        jax.tree_util.tree_leaves(state_shapes),
        jax.tree_util.tree_leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec"))))
    assert total > 10 * 2**30, total  # sanity: this IS the full model (>10 GB)
    assert per_dev < total / 6, (per_dev / 2**30, total / 2**30)


@pytest.mark.slow
def test_fsdp_train_step_matches_replicated(engine8):
    """ZeRO-3/DeepSpeed-equivalent layout (params + AdamW state + EMA sharded
    over the whole mesh) must produce the same step as the replicated layout;
    the sharding is declarative so only collective placement may differ."""
    eng = engine8
    batch = make_batch()
    cond = eng.conditioner(batch)
    jpg = jnp.asarray(batch["jpg"])
    rng = jax.random.PRNGKey(42)
    opt = make_optimizer(lr=1e-3)
    mesh = make_mesh(8, dp=1)
    state0 = init_train_state(eng, opt, use_ema=True)

    step_r = make_train_step(eng, opt, mesh=mesh, donate=False)
    state_a, loss_a = step_r(state0, eng.params["first_stage"], jpg, cond, rng)

    min_size = 256  # tiny model: lower the shard threshold so leaves shard
    from panacea_tpu.parallel.train import shard_train_state

    (state_f, fs_f), shardings = shard_train_state(
        mesh, state0, eng.params["first_stage"], fsdp=True,
        fsdp_min_size=min_size)
    state_s = shardings[0]
    # the layout must actually shard something (non-vacuous test)
    import jax.sharding as shd

    specs = [s.spec for s in jax.tree_util.tree_leaves(
        state_s, is_leaf=lambda x: isinstance(x, shd.NamedSharding))]
    assert any(sp != shd.PartitionSpec() for sp in specs)

    step_f = make_train_step(eng, opt, mesh=mesh, donate=False, fsdp=True,
                             shardings=shardings)
    state_b, loss_b = step_f(state_f, fs_f, jpg, cond, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # EMA state updated identically
    ea = jax.tree_util.tree_leaves(state_a.ema.ema_params)[0]
    eb = jax.tree_util.tree_leaves(state_b.ema.ema_params)[0]
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=2e-5)


@pytest.mark.slow
def test_diffusion_train_overfit(engine8):
    """Generation-side convergence evidence (mirrors the perception overfit
    test): ~40 steps on one fixed tiny batch must drive the diffusion loss
    well below its start. Exercises the full train step (loss + grads +
    AdamW + EMA) on the 8-device mesh."""
    import numpy as np

    eng = engine8
    from panacea_tpu.parallel.mesh import make_mesh
    from panacea_tpu.parallel.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh = make_mesh(8, dp=2)
    rng = np.random.RandomState(0)
    jpg = jnp.asarray(rng.uniform(-1, 1, (2, T, IH, IW, 3)), jnp.float32)
    batch = {
        "jpg": np.asarray(jpg),
        "cond_img": rng.uniform(0, 1, (2, T, IH, IW, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((2, T, IH, IW, 3), np.float32),
        "txt": ["overfit"] * 2,
    }
    cond = eng.conditioner(batch)
    opt = make_optimizer(lr=2e-3)
    state = init_train_state(eng, opt, use_ema=True)
    step = make_train_step(eng, opt, mesh=mesh, donate=False)
    losses = []
    for i in range(40):
        state, loss = step(state, eng.params["first_stage"], jpg, cond,
                           jax.random.PRNGKey(7))  # FIXED key: same noise/t
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    first, last = np.mean(losses[:4]), np.mean(losses[-4:])
    assert last < 0.35 * first, (first, last)
    # EMA tracked the params (shadow lags the raw weights)
    ema_leaf = jax.tree_util.tree_leaves(state.ema.ema_params)[0]
    raw_leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(ema_leaf), np.asarray(raw_leaf))
    assert int(state.ema.num_updates) == 40


def test_maybe_init_distributed_noop_without_coordinator(monkeypatch):
    """SURVEY §5: jax.distributed.initialize only under an explicit
    coordinator env — never through the single-chip axon tunnel."""
    from panacea_tpu.parallel.mesh import maybe_init_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "PANACEA_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_init_distributed() is False

    # with the env set it would attempt the real handshake; verify the
    # guard routes there by stubbing the initializer
    calls = []
    import jax

    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.setenv("PANACEA_MULTIHOST", "1")
    assert maybe_init_distributed() is True
    assert calls == [1]
