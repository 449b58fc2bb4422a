"""Frechet distance metrics: FID (images) and FVD (videos).

The Panacea papers report FID/FVD as headline generation metrics (BASELINE.md);
the reference repo wraps pytorch-fid's InceptionV3 (modules.py:223 InceptionV3).
Here: streaming activation statistics + the Frechet distance (matrix sqrt via
eigendecomposition of the symmetrized product), with pluggable feature
extractors — InceptionV3 (panacea_tpu.metrics_gen.inception) for FID; any
video feature fn for FVD.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


class StreamingStats:
    """Accumulates mean/covariance of feature batches."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, dtype=np.float64)
        self.outer = np.zeros((dim, dim), dtype=np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, dtype=np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        assert self.n > 1, "need at least 2 samples"
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def _sqrtm_product(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """tr(sqrt(c1 @ c2)) via the symmetric-form eigendecomposition:
    sqrt(c1) c2 sqrt(c1) is PSD with the same nonzero spectrum as c1 c2.
    Rank-deficient covariances (few samples) can make LAPACK's eigensolver
    fail to converge — retry with the standard eps*I regularization
    (pytorch-fid's fallback), which perturbs tr_sqrt by O(eps*dim)."""
    def attempt(a, b):
        vals1, vecs1 = np.linalg.eigh(a)
        vals1 = np.clip(vals1, 0, None)
        s1 = (vecs1 * np.sqrt(vals1)) @ vecs1.T
        m = s1 @ b @ s1
        vals = np.linalg.eigvalsh((m + m.T) / 2)
        return np.sqrt(np.clip(vals, 0, None)).sum()

    for eps in (0.0, 1e-6, 1e-3):
        try:
            reg = eps * np.eye(c1.shape[0])
            return attempt(c1 + reg, c2 + reg)
        except np.linalg.LinAlgError:
            continue
    raise np.linalg.LinAlgError(
        "sqrtm eigendecomposition failed even with eps=1e-3 regularization")


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    diff = np.asarray(mu1) - np.asarray(mu2)
    tr_sqrt = _sqrtm_product(np.asarray(cov1), np.asarray(cov2))
    return float(
        diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt
    )


def compute_fid(
    real_feature_batches,
    gen_feature_batches,
    dim: Optional[int] = None,
) -> float:
    """Iterables of (N, D) feature arrays -> FID."""
    stats_r = stats_g = None
    for fb in real_feature_batches:
        fb = np.asarray(fb)
        if stats_r is None:
            stats_r = StreamingStats(fb.shape[-1])
        stats_r.update(fb)
    for fb in gen_feature_batches:
        fb = np.asarray(fb)
        if stats_g is None:
            stats_g = StreamingStats(fb.shape[-1])
        stats_g.update(fb)
    mu1, c1 = stats_r.finalize()
    mu2, c2 = stats_g.finalize()
    return frechet_distance(mu1, c1, mu2, c2)


def compute_fvd(real_video_features, gen_video_features) -> float:
    """FVD is the Frechet distance over per-clip video features (e.g. I3D
    logits); identical math, different extractor."""
    return compute_fid(real_video_features, gen_video_features)
