"""Chamfer / sided point-cloud distances.

The reference vendors a pytorch3d-derived chamfer implementation
(src/utils/loss_chamfer_utils.py, 328 LoC) and imports kaolin's
sided_distance; both are *uncalled* by the trainers (SURVEY.md §2.2) but are
part of the utility surface.  Here: exact blocked brute-force nearest
neighbors on the MXU (one matmul per block), batched and differentiable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block",))
def sided_distance(src: jnp.ndarray, dst: jnp.ndarray, block: int = 2048):
    """For each src point, squared distance to its nearest dst point.
    src [N, 3], dst [M, 3] -> (dist2 [N], idx [N])."""
    dst_sq = jnp.sum(dst * dst, axis=-1)

    def one_block(chunk):
        d2 = (jnp.sum(chunk * chunk, -1)[:, None] + dst_sq[None]
              - 2.0 * chunk @ dst.T)
        idx = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0], idx

    n = src.shape[0]
    pad = (-n) % block
    padded = jnp.pad(src, ((0, pad), (0, 0)))
    d2, idx = jax.lax.map(one_block, padded.reshape(-1, block, 3))
    return jnp.maximum(d2.reshape(-1)[:n], 0.0), idx.reshape(-1)[:n]


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     x_lengths=None, y_lengths=None):
    """Symmetric chamfer distance between two point clouds [N, 3], [M, 3]
    (mean of both sided means — the loss_chamfer_utils.py 'mean' reduction)."""
    dx, _ = sided_distance(x, y)
    dy, _ = sided_distance(y, x)
    return jnp.mean(dx) + jnp.mean(dy)
