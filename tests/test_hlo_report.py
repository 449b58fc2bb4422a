"""Unit tests for parallel/hlo_report.py — the comm/memory breakdown the
multichip dryrun prints for the compiled production sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.parallel.hlo_report import (
    _shape_bytes,
    analyze_hlo,
    format_report,
)


def test_shape_bytes():
    assert _shape_bytes("f32[8,128]") == 8 * 128 * 4
    assert _shape_bytes("bf16[2,4]") == 2 * 4 * 2
    # tuples sum their element shapes
    assert _shape_bytes("(f32[8], s32[8])") == 8 * 4 + 8 * 4
    assert _shape_bytes("pred[]") == 1


def test_synthetic_hlo_classification():
    hlo = """
HloModule jit_run

body {
  %p = f32[64,1024,1024]{2,1,0} parameter(0)
  %ag = f32[64,1024,1024]{2,1,0} all-gather(%p), metadata={op_name="jit(run)/while/body/all_gather"}
  ROOT %m = f32[64,1024,1024]{2,1,0} multiply(%ag, %ag), metadata={op_name="jit(run)/while/body/mul"}
}

ENTRY main {
  %x = f32[64,1024,1024]{2,1,0} parameter(0)
  %cp = f32[4,8]{1,0} collective-permute(%x), metadata={op_name="jit(run)/setup"}
  ROOT %w = f32[64,1024,1024]{2,1,0} while(%x), body=body
}
"""
    s = analyze_hlo(hlo)
    # the all-gather inside the while body is per-step; the permute is once
    assert s["collectives"]["all-gather (per-step)"]["count"] == 1
    assert s["collectives"]["all-gather (per-step)"]["MiB"] == 256.0
    assert s["collectives"]["collective-permute (once)"]["count"] == 1
    # 256 MiB buffers exceed the 32 MiB floor and dedupe by (op, shape)
    ops = {e["op"] for e in s["top_buffers"]}
    assert "multiply" in ops and "all-gather" in ops
    # parameters never count as temp buffers
    assert "parameter" not in ops
    rep = format_report(s)
    assert "all-gather (per-step)" in rep and "256.0" in rep


def test_real_compiled_program_roundtrip():
    """analyze_hlo on an actual jitted program: a psum'd matmul over a
    1-device mesh still carries an all-reduce in its HLO."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))

    def f(x):
        return jax.lax.psum(x @ x, "dp")

    fn = jax.jit(shard_map(f, mesh=mesh, in_specs=P(), out_specs=P()))
    x = jnp.ones((4, 4))
    txt = fn.lower(x).compile().as_text()
    s = analyze_hlo(txt)
    assert isinstance(s["collective_MiB_total"], float)
    assert isinstance(s["top_buffers"], list)
