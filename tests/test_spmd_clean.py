"""The round-4 multichip invariant, locked in: the sharded train step
(plain + FSDP) compiles with ZERO XLA SPMD "Involuntary full
rematerialization" warnings (spmd_partitioner.cc) on an 8-device mesh.

Runs in a subprocess with the persistent compile cache DISABLED — a cache
hit would skip partitioning and hide regressions — so this is compile-heavy
(~5 min) and lives in the slow tier. If it goes red, a new reshape/merge in
the model is fighting the partitioner: pin its layout through
parallel/shardctx.py (see CLAUDE.md conventions).
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp
import numpy as np
import __graft_entry__ as g
from panacea_tpu.parallel.mesh import make_mesh
from panacea_tpu.parallel.train import (init_train_state, make_optimizer,
                                        make_train_step, shard_train_state)

dp, t = 2, 4
cfg, eng = g._engine(tiny=True, num_frames=t)
ih, iw, lh, lw = 16, 192, 2, 24
eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw), image_hw=(ih, iw))
mesh = make_mesh(8, dp=dp)
rng = np.random.RandomState(0)
batch = {
    "jpg": rng.uniform(-1, 1, (dp, t, ih, iw, 3)).astype(np.float32),
    "cond_img": rng.uniform(0, 1, (dp, t, ih, iw, 19)).astype(np.float32),
    "final_cond_zero": np.zeros((dp, t, ih, iw, 3), dtype=np.float32),
    "txt": ["dryrun"] * dp,
}
cond = eng.conditioner(batch)
jpg = jnp.asarray(batch["jpg"])
opt = make_optimizer(lr=1e-4)
state = init_train_state(eng, opt, use_ema=True)
step = make_train_step(eng, opt, mesh=mesh, donate=False)
_, loss = step(state, eng.params["first_stage"], jpg, cond,
               jax.random.PRNGKey(7))
assert np.isfinite(float(loss))
(state_f, fs_f), sh = shard_train_state(
    mesh, state, eng.params["first_stage"], fsdp=True, fsdp_min_size=256)
step_f = make_train_step(eng, opt, mesh=mesh, donate=False, fsdp=True,
                         shardings=sh)
_, loss_f = step_f(state_f, fs_f, jpg, cond, jax.random.PRNGKey(7))
assert np.isfinite(float(loss_f))
print("SPMD_CLEAN_DONE", float(loss), float(loss_f))
"""


@pytest.mark.slow
def test_sharded_train_step_compiles_without_involuntary_remat(tmp_path):
    env = dict(os.environ)
    # fresh, throwaway cache so the SPMD partitioner actually runs
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "nocache")
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT], cwd=repo, env=env,
        capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SPMD_CLEAN_DONE" in proc.stdout, proc.stdout[-2000:]
    bad = [ln for ln in proc.stderr.splitlines()
           if "Involuntary full rematerialization" in ln]
    assert not bad, (
        f"{len(bad)} involuntary-remat warnings; first:\n{bad[0][:500]}")
