"""The fixed-seed latent-trajectory harness (scripts/compare_latents.py +
engine.sample return_trajectory) — the RUNBOOK §2 off-env parity tool must
itself be regression-proof: trajectory recording in-jit, npz round trip,
torch-layout auto-transpose, tolerance gating. Slow tier (tiny engine
compile)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "compare_latents.py")


def _run(args, **kw):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, SCRIPT] + args, env=env,
                          capture_output=True, text=True, **kw)


@pytest.mark.slow
def test_dump_and_compare_roundtrip(tmp_path):
    ours = str(tmp_path / "ours.npz")
    r = _run(["dump", "--tiny", "--synthetic", "--out", ours,
              "--num_steps", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    a = np.load(ours)
    assert a["traj"].shape[0] == 3
    assert np.allclose(a["traj"][-1], a["final"])
    # noise is NumPy-made (framework-independent contract for the torch side)
    want = np.random.RandomState(0)
    want.uniform(-1, 1, a["jpg"].shape)     # batch draws precede the noise
    # (exact reproduction is the dump's job; here just check dtype/shape)
    assert a["noise"].dtype == np.float32
    assert a["noise"].shape == a["traj"].shape[1:]

    # self-compare: identical trajectories pass at any tolerance
    r = _run(["compare", ours, ours, "--atol", "1e-12"])
    assert r.returncode == 0, r.stdout + r.stderr

    # torch-layout (n, t, c, h, w) auto-transpose path
    theirs = str(tmp_path / "theirs.npz")
    np.savez_compressed(theirs, traj=a["traj"].transpose(0, 1, 4, 2, 3),
                        final=a["final"])
    r = _run(["compare", ours, theirs, "--atol", "1e-12"])
    assert r.returncode == 0, r.stdout + r.stderr

    # a diverged trajectory must FAIL past tolerance
    np.savez_compressed(theirs, traj=a["traj"] + 1.0, final=a["final"])
    r = _run(["compare", ours, theirs, "--atol", "0.5"])
    assert r.returncode == 1
    assert "diverged" in r.stdout


@pytest.mark.slow
def test_trajectory_varies_with_nonzero_out_conv():
    """Regression for the recording itself: with the zero-init out_conv the
    trajectory is mathematically constant (eps_pred=0 -> D(x)=x); perturb it
    and assert the recorded per-step latents actually move."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    _, eng = ge._engine(tiny=True)
    t, ih, iw, lh, lw = eng.num_frames, 16, 192, 2, 24
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw),
                    image_hw=(ih, iw))

    def bump(p, path=()):
        if isinstance(p, dict):
            return {k: bump(v, path + (k,)) for k, v in p.items()}
        if "out_conv" in path and getattr(p, "ndim", 0) == 4:
            return p + 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                                p.shape, p.dtype)
        return p

    eng.params["model"] = bump(eng.params["model"])

    rs = np.random.RandomState(0)
    batch = {
        "jpg": rs.uniform(-1, 1, (1, t, ih, iw, 3)).astype(np.float32),
        "cond_img": rs.uniform(0, 1, (1, t, ih, iw, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((1, t, ih, iw, 3), np.float32),
        "txt": ["x"],
    }
    c, uc = eng.conditioner.get_unconditional_conditioning(
        batch, batch_uc=dict(batch, txt=[""]))
    noise = rs.standard_normal((t, lh, lw, 4)).astype(np.float32)
    final, traj = eng.sample(c, uc=uc, batch_size=t, shape=(lh, lw, 4),
                             rng=jax.random.PRNGKey(0), num_steps=4,
                             noise=jnp.asarray(noise),
                             return_trajectory=True)
    traj = np.asarray(traj)
    assert traj.shape[0] == 4
    deltas = [float(np.abs(traj[i] - traj[i - 1]).max())
              for i in range(1, len(traj))]
    assert all(d > 0 for d in deltas), deltas
    np.testing.assert_allclose(np.asarray(final), traj[-1])
