"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed.launch + DDP/NCCL runtime
(inference.py:248-294) with jax.sharding. The standard layout for Panacea:

  * axis 'dp'   — clips (true data parallel; ranks never talk, like the
                  reference's inference DDP)
  * axis 't'    — frames within a clip. Spatial + cross-view attention and all
                  convs are frame-local; only the temporal stages cross 't',
                  and XLA lowers those reshapes to all-to-alls over ICI.

Activations shard their leading (B*T) axis over ('dp','t'); per-clip tensors
(text context) shard over 'dp' only; params are replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    axis_names: Tuple[str, str] = ("dp", "t"),
    view: Optional[int] = None,
) -> Mesh:
    """('dp','t') mesh, optionally with a trailing 'view' axis that shards
    the panorama width over camera views (must divide 6); the cross-view
    attention then runs as a ppermute ring (parallel/ring_attention.py)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = 1
    if view:
        assert 6 % view == 0, view
        t = n // (dp * view)
        assert dp * t * view == n, f"{dp}x{t}x{view} != {n}"
        arr = np.asarray(devices).reshape(dp, t, view)
        return Mesh(arr, (axis_names[0], axis_names[1], "view"))
    t = n // dp
    assert dp * t == n, f"{dp}x{t} != {n}"
    arr = np.asarray(devices).reshape(dp, t)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (B*T) axis over both mesh axes."""
    return NamedSharding(mesh, P(("dp", "t")))


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """Per-clip tensors (e.g. text context): shard clips over 'dp' only."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_dict(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict on the mesh: 5-D (B,T,...) image tensors shard
    over ('dp','t') after frame-flattening happens downstream; here we shard the
    clip axis over 'dp'. Strings pass through."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, clip_sharding(mesh))
        else:
            out[k] = v
    return out
