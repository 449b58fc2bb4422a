"""Native checkpointing with Orbax.

The reference only loads torch checkpoints (inference.py:207-228;
sgm/util.py:203-233); this framework saves/restores its own param trees (and
train states) natively with orbax, and uses panacea_tpu.utils.convert for
one-shot torch->JAX conversion of reference checkpoints.
"""

from __future__ import annotations

import os
import pickle
import re
import shutil
from typing import Any, Dict, Optional, Tuple

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


# ---------------------------------------------------------------------------
# Full training-state checkpoints with rotation + exact resume.
#
# The reference's perception harness checkpoints model + optimizer + iteration
# via mmcv `checkpoint_config = dict(..., max_keep_ckpts=3)` and resumes with
# `resume_from` (metrics/StreamPETR config :274-279). Equivalent here: the
# whole train-state pytree (params, opt_state, step, EMA/memory) goes through
# orbax as `iter_{step}`, and a pickle sidecar `iter_{step}.meta.pkl` carries
# the host-side loop state (JAX PRNG key, numpy RandomState streams, data
# cursors) so a resumed run replays the EXACT trajectory of an uninterrupted
# one — stronger than mmcv, which reseeds the sampler per epoch.
# ---------------------------------------------------------------------------

_ITER_RE = re.compile(r"^iter_(\d+)$")


def _iter_checkpoints(ckpt_dir: str):
    """[(step, abs_path)] of iter_N checkpoint dirs, oldest first."""
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = _ITER_RE.match(name)
        full = os.path.join(ckpt_dir, name)
        if m and os.path.isdir(full):
            out.append((int(m.group(1)), full))
    return sorted(out)


def save_train_checkpoint(ckpt_dir: str, step: int, tree: Any,
                          meta: Optional[Dict[str, Any]] = None,
                          max_keep: int = 3) -> str:
    """Save `tree` as {ckpt_dir}/iter_{step} (+ .meta.pkl sidecar) and prune
    all but the newest `max_keep` iter_* checkpoints (mmcv max_keep_ckpts).

    Pruning removes EVERY ``iter_N.meta*`` sidecar (including the per-rank
    ``iter_N.meta.rankK.pkl`` files multi-host trainers write) and runs on
    process 0 only — concurrent rmtree from every rank on a shared
    filesystem races, and sidecars would otherwise accumulate unboundedly."""
    import glob

    path = os.path.join(os.path.abspath(ckpt_dir), f"iter_{int(step)}")
    save_pytree(path, tree)
    if meta is not None:
        with open(path + ".meta.pkl", "wb") as f:
            pickle.dump(meta, f)
    if max_keep and max_keep > 0 and jax.process_index() == 0:
        for _, old in _iter_checkpoints(ckpt_dir)[:-max_keep]:
            shutil.rmtree(old, ignore_errors=True)
            for sidecar in glob.glob(glob.escape(old) + ".meta*"):
                try:
                    os.remove(sidecar)
                except OSError:
                    pass
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest iter_* checkpoint path under ckpt_dir, or None."""
    ckpts = _iter_checkpoints(ckpt_dir)
    return ckpts[-1][1] if ckpts else None


def load_train_checkpoint(path: str,
                          template: Optional[Any] = None,
                          ) -> Tuple[Any, Dict[str, Any]]:
    """Load a full-state checkpoint: `path` is an iter_N dir, or a ckpt_dir
    (resumes from its newest iter_*). Returns (tree, meta dict)."""
    path = os.path.abspath(path)
    if not _ITER_RE.match(os.path.basename(path)):
        newest = latest_checkpoint(path)
        if newest is None:
            raise FileNotFoundError(f"no iter_* checkpoint under {path}")
        path = newest
    tree = load_pytree(path, template)
    meta: Dict[str, Any] = {}
    if os.path.exists(path + ".meta.pkl"):
        with open(path + ".meta.pkl", "rb") as f:
            meta = pickle.load(f)
    return tree, meta


def is_train_checkpoint(path: str) -> bool:
    """True if `path` is an iter_N dir or a dir containing iter_* ckpts."""
    if not path or not os.path.isdir(path):
        return False
    if _ITER_RE.match(os.path.basename(path)):
        return True
    return latest_checkpoint(path) is not None
