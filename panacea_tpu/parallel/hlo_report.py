"""Comm/memory breakdown of a compiled SPMD program from its optimized HLO.

The multichip dryrun (``__graft_entry__._production_compile_check``) AOT-
compiles the production ('t','view')-sharded sampler; this module turns that
compiled executable's HLO text into an auditable summary:

  - collective instructions (all-gather / all-reduce / reduce-scatter /
    collective-permute / all-to-all): count + output bytes, split into
    "per-step" (inside a while/scan body, i.e. executed once per sampler
    step / denoiser eval) vs "once" (setup/epilogue)
  - the largest instruction outputs (the buffers that dominate the
    temp-memory estimate), deduplicated by (op, shape)

The reference never shards a clip at all (inference.py:248-294 runs whole
clips per GPU); these numbers quantify what the sharded single-clip latency
path pays in ICI traffic instead.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Any, Dict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
}

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")

_INSTR = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w\.\-]+ = ([^=]+?) ([\w\-]+)\(")


def _shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def analyze_hlo(hlo_text: str, top_k: int = 10) -> Dict[str, Any]:
    """Parse optimized HLO into the collective/buffer summary above."""
    colls: Dict[str, Dict[str, Any]] = defaultdict(
        lambda: {"count": 0, "bytes": 0})
    buffers: Dict[tuple, Dict[str, Any]] = {}

    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            continue
        m = _INSTR.match(line)
        if not m:
            continue
        type_str, op = m.group(1), m.group(2)
        # ops whose jax source sits inside a while/scan body execute once
        # per loop iteration — for the sampler, once per denoiser eval;
        # the op metadata carries the traced path (e.g.
        # op_name="jit(run)/while/body/...")
        per_step = "/while/body" in line or "/scan/" in line
        if op in _COLLECTIVES:
            key = f"{op} ({'per-step' if per_step else 'once'})"
            colls[key]["count"] += 1
            colls[key]["bytes"] += _shape_bytes(type_str)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        b = _shape_bytes(type_str)
        if b >= 32 * 2**20:
            k = (op, type_str.split("{")[0].strip())
            if k not in buffers:
                buffers[k] = {"op": op, "shape": k[1], "bytes": b,
                              "count": 0}
            buffers[k]["count"] += 1

    top = sorted(buffers.values(), key=lambda e: -e["bytes"])[:top_k]
    return {
        "collectives": {
            k: {"count": v["count"], "MiB": round(v["bytes"] / 2**20, 1)}
            for k, v in sorted(colls.items())
        },
        "collective_MiB_total": round(
            sum(v["bytes"] for v in colls.values()) / 2**20, 1),
        "top_buffers": [
            {"op": e["op"], "shape": e["shape"], "count": e["count"],
             "MiB": round(e["bytes"] / 2**20, 1)} for e in top
        ],
    }


def format_report(summary: Dict[str, Any]) -> str:
    lines = ["  collectives (count / output MiB):"]
    for k, v in summary["collectives"].items():
        lines.append(f"    {k:32s} x{v['count']:<4d} {v['MiB']:9.1f} MiB")
    lines.append(f"    total collective output: "
                 f"{summary['collective_MiB_total']:.1f} MiB")
    lines.append("  largest instruction outputs (temp-memory drivers):")
    for e in summary["top_buffers"]:
        lines.append(f"    {e['MiB']:8.1f} MiB x{e['count']:<3d} "
                     f"{e['op']:18s} {e['shape']}")
    return "\n".join(lines)
