"""FID/FVD math + InceptionV3 architecture tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.metrics_gen.fid import (
    StreamingStats,
    compute_fid,
    frechet_distance,
)
from panacea_tpu.metrics_gen.inception import InceptionV3


def test_frechet_zero_for_identical():
    rs = np.random.RandomState(0)
    feats = rs.randn(500, 8)
    mu, cov = feats.mean(0), np.cov(feats, rowvar=False)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_analytic_mean_shift():
    # identical covariance, mean shift d -> FID = ||d||^2
    dim = 4
    cov = np.eye(dim)
    mu1 = np.zeros(dim)
    mu2 = np.full(dim, 0.5)
    fd = frechet_distance(mu1, cov, mu2, cov)
    assert abs(fd - dim * 0.25) < 1e-6


def test_frechet_analytic_scalar_gaussians():
    # 1-D: FD = (m1-m2)^2 + (s1-s2)^2
    fd = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                          np.array([2.0]), np.array([[9.0]]))
    assert abs(fd - (1.0 + 1.0)) < 1e-9


def test_streaming_stats_matches_numpy():
    rs = np.random.RandomState(1)
    feats = rs.randn(300, 6)
    st = StreamingStats(6)
    for i in range(0, 300, 50):
        st.update(feats[i:i + 50])
    mu, cov = st.finalize()
    np.testing.assert_allclose(mu, feats.mean(0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(feats, rowvar=False), atol=1e-10)


def test_compute_fid_discriminates():
    rs = np.random.RandomState(2)
    real = [rs.randn(100, 5) for _ in range(3)]
    similar = [rs.randn(100, 5) for _ in range(3)]
    shifted = [rs.randn(100, 5) + 3.0 for _ in range(3)]
    fid_close = compute_fid(real, similar)
    fid_far = compute_fid(real, shifted)
    assert fid_far > fid_close
    assert fid_far > 40


@pytest.mark.slow
def test_inception_v3_shapes():
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 2048)
    # spot-check key block widths match the torchvision topology
    assert params["Conv2d_1a"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert params["Mixed_7c"]["b1x1"]["conv"]["kernel"].shape[-1] == 320


@pytest.mark.slow
def test_i3d_shapes():
    from panacea_tpu.metrics_gen.i3d import I3D

    model = I3D()
    x = jnp.zeros((1, 9, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, return_logits=True)["params"]
    feats = model.apply({"params": params}, x)
    assert feats.shape == (1, 1024)
    feats, logits = model.apply({"params": params}, x, return_logits=True)
    assert logits.shape == (1, 400)


@pytest.mark.slow
def test_eval_generation_cli_dirs(tmp_path):
    """End-to-end directory flow: tiny images, distinct dirs, finite result."""
    import json
    import subprocess
    import sys

    import numpy as np
    from PIL import Image

    rs = np.random.RandomState(0)
    for root, shift in (("real", 0), ("gen", 60)):
        for clip in range(2):
            d = tmp_path / root / f"CAM_FRONT_clip{clip}"
            d.mkdir(parents=True)
            for i in range(8):
                arr = rs.randint(0, 196, (32, 48, 3)) + shift
                Image.fromarray(arr.astype("uint8")).save(
                    d / f"_0000{i}.jpg")
    # honesty guard: without tower weights the CLI must REFUSE (random-init
    # Inception/I3D would emit garbage that reads like a result)
    refused = subprocess.run(
        [sys.executable, "eval_generation.py",
         "--real_root", str(tmp_path / "real"),
         "--gen_root", str(tmp_path / "gen"),
         "--num_frames", "8", "--batch", "4"],
        capture_output=True, text=True, timeout=120, cwd=".",
    )
    assert refused.returncode != 0
    assert "random-init" in refused.stderr

    out = subprocess.run(
        [sys.executable, "eval_generation.py",
         "--real_root", str(tmp_path / "real"),
         "--gen_root", str(tmp_path / "gen"),
         "--num_frames", "8", "--batch", "4", "--allow_random_towers"],
        capture_output=True, text=True, timeout=1200, cwd=".",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["real_clips"] == 2 and res["gen_clips"] == 2
    assert np.isfinite(res["fid"]) and np.isfinite(res["fvd"])
    assert res["towers"] == "random-init"  # smoke runs are stamped
