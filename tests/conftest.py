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

assert jax.default_backend() == "cpu", jax.default_backend()
