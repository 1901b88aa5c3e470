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


@functools.partial(jax.jit, static_argnames=("k", "block_size", "chunk_size"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, block_size: int = 1024,
                     chunk_size: int = 65536) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors
    (excluding itself).  points [P, 3] -> [P].

    Query blocks x reference chunks with a running top-(k+1) merge, so the
    peak distance matrix is [block, chunk] regardless of P (a single
    [block, P] matrix is 4 GB at P=1M and crashed the TPU worker)."""
    p = points.shape[0]
    pad_q = (-p) % block_size
    # large-but-finite sentinel: inf padding makes d2 = inf - inf = nan
    # through the matmul term
    qry = jnp.pad(points, ((0, pad_q), (0, 0)), constant_values=1e30)
    pad_r = (-p) % chunk_size
    ref = jnp.pad(points, ((0, pad_r), (0, 0)), constant_values=1e30)
    ref_chunks = ref.reshape(-1, chunk_size, 3)
    refsq_chunks = jnp.sum(ref_chunks * ref_chunks, axis=-1)  # inf for pads

    def block_knn(block):  # [B, 3]
        bsq = jnp.sum(block * block, axis=-1)

        def scan_chunk(best, chunk):
            cpts, csq = chunk
            # dist^2 = |a|^2 + |b|^2 - 2 a.b; the matmul is the hot op (MXU)
            d2 = bsq[:, None] + csq[None, :] - 2.0 * block @ cpts.T
            d2 = jnp.maximum(d2, 0.0)
            neg_top, _ = jax.lax.top_k(-d2, k + 1)
            merged, _ = jax.lax.top_k(
                jnp.concatenate([best, neg_top], axis=1), k + 1)
            return merged, None

        best0 = jnp.full((block.shape[0], k + 1), -jnp.inf, points.dtype)
        best, _ = jax.lax.scan(scan_chunk, best0,
                               (ref_chunks, refsq_chunks))
        # Drop self-distance (k+1 smallest, skip the first).
        return jnp.mean(-best[:, 1:], axis=-1)

    blocks = qry.reshape(-1, block_size, 3)
    out = jax.lax.map(block_knn, blocks).reshape(-1)
    return out[:p]
