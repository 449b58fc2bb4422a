"""Panorama/view-axis helpers for the decomposed 4D attention.

The panorama feature map stitches the 6 camera views along width in the order
F, FR, BR, B, BL, FL (reference data layout: nuscenes_datasets_video.py:509,537).
The reference slices the width into 6 chunks per attention call in a Python loop
(attention.py:436-441, 545-559); here the view axis is made an explicit array
dimension once so every variant is a single batched attention call — the shape
XLA and the Pallas kernel want.
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_VIEWS = 6


def split_views(x: jnp.ndarray, n_views: int = NUM_VIEWS) -> jnp.ndarray:
    """(B, H, W_pano, C) -> (B, V, H, W_view, C)"""
    b, h, w, c = x.shape
    wv = w // n_views
    x = x.reshape(b, h, n_views, wv, c)
    return x.transpose(0, 2, 1, 3, 4)


def merge_views(x: jnp.ndarray) -> jnp.ndarray:
    """(B, V, H, W_view, C) -> (B, H, W_pano, C)"""
    b, v, h, wv, c = x.shape
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(b, h, v * wv, c)


def neighbor_kv(x: jnp.ndarray) -> jnp.ndarray:
    """Build each view's cross-view K/V source: [left neighbor, right neighbor].

    x: (B, V, S, ...) -> (B, V, 2*S, ...), with circular wraparound, matching the
    reference's neighbor concatenation order (attention.py:545-559: left first).
    """
    left = jnp.roll(x, shift=1, axis=1)   # view i sees view i-1
    right = jnp.roll(x, shift=-1, axis=1)  # view i sees view i+1
    return jnp.concatenate([left, right], axis=2)
