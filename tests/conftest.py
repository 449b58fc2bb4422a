"""Test harness: force CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 4 implication).

NOTE: this environment registers the single-chip axon TPU tunnel via
sitecustomize and pins ``jax_platforms="axon,cpu"`` with jax.config.update —
the env-var route is overridden, so we must re-update the config here. Tests
must never touch the TPU: the tunnel is single-client and concurrent test
processes would deadlock against the bench/driver.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# jax 0.9 CPU "default" matmul/conv precision is bf16-like (observed ~1e-2
# relative error on 256-dim contractions); numerical tests need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat suite runs skip XLA compiles (the
# dominant cost of the engine/parallel tests)
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full tier; ~1h cold)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy compile-bound test; excluded by default, run with "
        "--runslow or RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
