"""Trace-time activation-sharding context for the decomposed-4D model.

Why this exists: under the production ('dp','t','view') mesh, XLA's sharding
propagation alone picks catastrophic layouts for the temporal regroupings in
``ResBlock3D``/``SpatialTemporalTransformer`` — the (B*T, H, W, C) ->
(B*H*W, T, C) reshapes make the partitioner emit "Involuntary full
rematerialization" (replicate-then-repartition) around every temporal conv /
norm (MULTICHIP_r03 evidence), wasting the ICI win and inflating per-device
temp memory. The reference never faces this: its NCCL DDP replicates
everything and never reshards (reference inference.py:248-279).

The fix is declarative, the TPU way: the engine / train step declares the
mesh once by entering :func:`activation_sharding` at trace time; the layers
then pin every temporal-stage tensor with ``jax.lax.with_sharding_constraint``
so the partitioner has no freedom. The intended comm pattern:

  * ResBlock3D temporal conv/norm: frames STAY sharded over 't' — the k=3
    conv needs only a 1-frame halo exchange and the per-pixel norm a tiny
    stats psum (both ride ICI; far cheaper than any reshard).
  * temporal attention: Ulysses-style — one all-to-all in (frames gathered,
    spatial re-sharded over 't'/'view'), attention local, one all-to-all out.
  * spatial/cross-view stages: everything frame-local and view-local; the
    cross-view stage's halo exchange is parallel/ring_attention.py.

The context is a plain contextvar read while jit TRACES the model function —
nothing here runs per-step. Layers call :func:`constrain`, which no-ops when
no mesh is active, so the single-chip program is byte-identical to before.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager
from typing import Optional, Tuple, Union

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SpecEntry = Union[None, str, Tuple[str, ...]]

_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "panacea_activation_sharding", default=None)


class ActivationSharding:
    """Resolved mesh-axis roles for activation tensors.

    * ``clip``  — axis sharding the clip/batch dim (B), usually 'dp'
    * ``frame`` — axis sharding the frame dim (T), usually 't'
    * ``view``  — axis sharding the panorama width / view dim
    Any role whose axis is absent from the mesh resolves to None.
    """

    def __init__(self, mesh: Mesh, clip_axis: str = "dp",
                 frame_axis: str = "t", view_axis: str = "view"):
        names = mesh.axis_names
        self.mesh = mesh
        self.clip = clip_axis if clip_axis in names else None
        self.frame = frame_axis if frame_axis in names else None
        self.view = view_axis if view_axis in names else None

    def size(self, axis: Optional[str]) -> int:
        return int(self.mesh.shape[axis]) if axis else 1


def current() -> Optional[ActivationSharding]:
    return _CTX.get()


@contextmanager
def activation_sharding(mesh: Optional[Mesh], **roles):
    """Activate constraints for ``mesh`` during tracing; None mesh = no-op."""
    if mesh is None:
        yield None
        return
    token = _CTX.set(ActivationSharding(mesh, **roles))
    try:
        yield _CTX.get()
    finally:
        _CTX.reset(token)


def _resolve_entry(dim: int, entry: SpecEntry,
                   ctx: ActivationSharding) -> SpecEntry:
    """Keep the longest prefix of ``entry``'s axes whose cumulative product
    divides ``dim`` — non-divisible axes are dropped (tiny test shapes), which
    EXPLICITLY replicates over that axis instead of leaving the partitioner
    to guess (padding shardings trip the involuntary-remat path)."""
    if entry is None:
        return None
    axes = entry if isinstance(entry, tuple) else (entry,)
    keep = []
    prod = 1
    for a in axes:
        if not a or a not in ctx.mesh.axis_names:
            continue
        n = ctx.size(a)
        if n > 1 and dim % (prod * n) != 0:
            break  # contiguity: later axes can't shard past a dropped one
        keep.append(a)
        prod *= n
    if not keep:
        return None
    return keep[0] if len(keep) == 1 else tuple(keep)


def resolve_axes(dim: int, entry: SpecEntry,
                 ctx: Optional[ActivationSharding] = None) -> Tuple[str, ...]:
    """Public form of the prefix-divisibility resolution: the tuple of mesh
    axes (possibly empty) that ``constrain`` would keep for a dim of size
    ``dim``. Callers that split/merge dims compute this ONCE and reuse the
    result on both sides of the reshape, so the pre- and post-merge
    constraints are always layout-consistent (the reshape stays local)."""
    ctx = ctx if ctx is not None else current()
    if ctx is None:
        return ()
    r = _resolve_entry(dim, entry, ctx)
    if r is None:
        return ()
    return r if isinstance(r, tuple) else (r,)


def constrain(x, *spec: SpecEntry):
    """``with_sharding_constraint(x, P(*spec))`` under the active context.

    Entries may be None, a mesh-axis name, or a tuple of axis names (the dim
    sharded over their product, major-to-minor). Axes not in the mesh or not
    dividing the dim are dropped per :func:`_resolve_entry`. No active
    context -> returns ``x`` unchanged (single-chip path untouched).
    """
    ctx = current()
    if ctx is None:
        return x
    assert len(spec) == x.ndim, (spec, x.shape)
    resolved = [_resolve_entry(d, e, ctx) for d, e in zip(x.shape, spec)]
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, P(*resolved)))
