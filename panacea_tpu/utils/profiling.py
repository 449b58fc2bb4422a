"""Timing + profiling utilities.

The reference only prints per-iteration wall clock (inference.py:299-316);
here: a phase timer with running averages plus jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        return " ".join(
            f"{k}: {self.last[k]:.2f}s (avg {self.mean(k):.2f}s)"
            for k in self.totals
        )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/panacea_trace", enabled: bool = True):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# XLA op-category -> bench bucket (docs/PERF.md measurement workflow)
_BUCKET_OF = {
    "convolution": "matmul",
    "convolution fusion": "matmul",
    "output fusion": "matmul",
    "dot": "matmul",
    "custom-call": "pallas",
    "custom call": "pallas",
    "data formatting": "copies",
    "copy": "copies",
    "loop fusion": "elementwise",
    "input fusion": "elementwise",
    "fusion": "elementwise",
    "elementwise": "elementwise",
    "reduce": "reduces",
    "reduce fusion": "reduces",
}


def _gviz_rows(data):
    """Parse an xprof gviz-JSON table -> (labels, row value lists)."""
    import json as _json

    if isinstance(data, bytes):
        data = data.decode()
    tables = _json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    out = []
    for tbl in tables:
        if not isinstance(tbl, dict) or "cols" not in tbl:
            continue
        labels = [c.get("label", c.get("id", "")) for c in tbl["cols"]]
        rows = [[(cell or {}).get("v") for cell in r.get("c", [])]
                for r in tbl.get("rows", [])]
        out.append((labels, rows))
    return out


def hlo_stats_summary(trace_dir: str) -> Optional[Dict]:
    """Aggregate a jax.profiler trace into the bench bucket breakdown.

    Parses the xprof ``hlo_stats`` table (falling back to
    ``framework_op_stats``) from the newest xplane under ``trace_dir`` —
    the workflow from docs/PERF.md — and returns
    ``{"device_ms": total-device-self-time, "bucket_ms": {matmul, pallas,
    copies, elementwise, reduces, other}}``. Returns None when the xprof
    converter or the expected columns are unavailable (e.g. bare CPU
    traces), so callers can degrade gracefully.
    NOTE: import requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python in
    the environment BEFORE any protobuf import (set it at process start).
    """
    import glob
    import os

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    planes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        return None
    try:
        from xprof.convert import raw_to_tool_data
    except Exception:
        return None

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [planes[-1]], tool, params={"tqx": "out:csv"})
        except Exception:
            continue
        for labels, rows in _gviz_rows(data):
            low = [str(x).lower() for x in labels]

            def col(*needles, banned=()):
                for i, lab in enumerate(low):
                    if (all(n in lab for n in needles)
                            and not any(b in lab for b in banned)):
                        return i
                return None

            cat_i = col("category")
            if cat_i is None:
                cat_i = col("operation type")  # framework_op_stats
            self_i = col("self", "time", banned=("%", "fraction", "avg"))
            dev_i = col("host", "device")
            if cat_i is None or self_i is None:
                continue
            unit = 1e3 if "(us)" in low[self_i] else (
                1.0 if "(ms)" in low[self_i] else 1e3)
            parsed = []
            for r in rows:
                cat = str(r[cat_i] or "").lower().strip()
                name = str(r[dev_i]).lower() if dev_i is not None else ""
                if "idle" in cat or not cat:
                    continue
                # hlo_stats has no Host/device column (device-side by
                # construction); framework_op_stats labels rows 'Host' /
                # 'Device' (or a device name) — anything non-host is device
                is_dev = (dev_i is None) or (name != "" and "host" not in
                                             name)
                parsed.append((is_dev, cat, float(r[self_i] or 0.0) / unit))
            # prefer device rows; bare-CPU traces label everything Host
            dev_rows = [p for p in parsed if p[0]]
            use = dev_rows if dev_rows else parsed
            buckets: Dict[str, float] = defaultdict(float)
            for _, cat, ms in use:
                buckets[_BUCKET_OF.get(cat, "other")] += ms
            total = sum(buckets.values())
            if total > 0:
                return {"device_ms": round(total, 1),
                        "on_device": bool(dev_rows),
                        "tool": tool,
                        "bucket_ms": {k: round(v, 1)
                                      for k, v in sorted(buckets.items())}}
    return None
