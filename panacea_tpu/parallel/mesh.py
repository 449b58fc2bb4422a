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


def maybe_init_distributed() -> bool:
    """Multi-host bring-up: initialize the JAX distributed runtime when a
    coordinator is configured (SURVEY §5 — the TPU-native replacement for
    the reference's ``dist.init_process_group("nccl")``,
    inference.py:248). After it, ``jax.devices()`` spans the whole slice
    and ``jax.process_index()/process_count()`` shard datasets per host
    exactly like the reference's DistributedSampler.

    Guarded on explicit env (JAX coordinator vars or PANACEA_MULTIHOST=1)
    rather than auto-detect: the single-chip axon tunnel must never attempt
    a coordinator handshake. Returns True when initialization ran."""
    import os

    if not (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("PANACEA_MULTIHOST")):
        return False
    jax.distributed.initialize()
    return True


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


def fsdp_spec(shape: Tuple[int, ...], n: int,
              axes: Tuple[str, ...]) -> P:
    """PartitionSpec sharding the largest n-divisible dim over ``axes``.

    The ZeRO/FSDP leaf rule: pick the dimension with the most elements that
    divides evenly by the device count and split it; if none divides (or the
    tensor is 0-d), replicate. ``axes`` is usually every mesh axis name
    flattened into one partition group (the whole data-parallel world, like
    DeepSpeed ZeRO shards over the full DP world)."""
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for i in order:
        if shape[i] % n == 0 and shape[i] >= n:
            spec = [None] * (i + 1)
            spec[i] = axes if len(axes) > 1 else axes[0]
            return P(*spec)
    return P()


def fsdp_sharding(mesh: Mesh, tree, min_size: int = 65536):
    """ZeRO-3/FSDP-equivalent NamedSharding tree for a param/opt-state pytree.

    The reference trained with DeepSpeed (the released checkpoint is
    ``panaceaplus_40k_deepspeed.ckpt``, reference inference.py:207-228) —
    params, grads and optimizer state sharded over the data-parallel world.
    The TPU-native equivalent is purely declarative: annotate every large
    leaf with a sharding over ALL mesh axes and let XLA's SPMD partitioner
    insert the all-gathers (params, forward+backward) and reduce-scatters
    (grads), keeping the AdamW update local to each shard — exactly ZeRO-3
    semantics, no wrapper module or comm code.

    Leaves smaller than ``min_size`` elements (biases, norm scales, scalars)
    stay replicated — sharding them buys nothing and costs collective
    latency. Works on any pytree whose leaves have ``.shape`` (arrays or
    ShapeDtypeStructs), including TrainState/optax states/EmaState.
    """
    axes = tuple(mesh.axis_names)
    n = int(np.prod(mesh.devices.shape))

    def leaf(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 1
        if size < min_size:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, fsdp_spec(tuple(shape), n, axes))

    return jax.tree.map(leaf, tree)


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
