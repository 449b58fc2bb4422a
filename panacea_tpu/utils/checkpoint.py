"""Native checkpointing with Orbax.

The reference only loads torch checkpoints (inference.py:207-228;
sgm/util.py:203-233); this framework saves/restores its own param trees (and
train states) natively with orbax, and uses panacea_tpu.utils.convert for
one-shot torch->JAX conversion of reference checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    cp = _checkpointer()
    cp.save(os.path.abspath(path), tree, force=True)


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    cp = _checkpointer()
    if template is not None:
        import orbax.checkpoint as ocp

        return cp.restore(os.path.abspath(path), item=template)
    return cp.restore(os.path.abspath(path))


def save_engine_checkpoint(path: str, engine, include_clip: bool = True) -> None:
    """Save all engine params (+ CLIP embedder tower) as one orbax tree."""
    tree: Dict[str, Any] = dict(engine.params)
    if include_clip:
        for i, emb in enumerate(engine.conditioner.embedders):
            if getattr(emb, "params", None) is not None:
                tree[f"embedder_{i}"] = emb.params
    save_pytree(path, tree)


def load_engine_checkpoint(path: str, engine) -> None:
    tree = load_pytree(path)
    engine.params = {k: v for k, v in tree.items()
                     if not k.startswith("embedder_")}
    for i, emb in enumerate(engine.conditioner.embedders):
        key = f"embedder_{i}"
        if key in tree and hasattr(emb, "params"):
            emb.params = tree[key]
            emb._apply = None
    engine._wire_vae_embedders()
