"""k-nearest-neighbor distances (the simple-knn ``distCUDA2`` equivalent).

The reference uses a CUDA kNN exactly once — mean squared distance to the 3
nearest neighbors for initializing Gaussian scales
(src/scene/gaussian_model.py:409-410).  Here: blocked brute-force on the MXU
(a [B, P] distance matrix per block via one matmul), which at the init-time
point counts involved (<= a few hundred thousand) is fast and exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, block_size: int = 1024) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors
    (excluding itself).  points [P, 3] -> [P]."""
    p = points.shape[0]
    pad = (-p) % block_size
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)
    sq = jnp.sum(points * points, axis=-1)  # [P]

    def block_knn(block):  # [B, 3]
        bsq = jnp.sum(block * block, axis=-1)
        # dist^2 = |a|^2 + |b|^2 - 2 a.b ; the matmul is the hot op (MXU).
        d2 = bsq[:, None] + sq[None, :] - 2.0 * block @ points.T
        d2 = jnp.maximum(d2, 0.0)
        # Drop self-distance (k+1 smallest, skip the first).
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        return jnp.mean(-neg_top[:, 1:], axis=-1)

    blocks = pts.reshape(-1, block_size, 3)
    out = jax.lax.map(block_knn, blocks).reshape(-1)
    return out[:p]
