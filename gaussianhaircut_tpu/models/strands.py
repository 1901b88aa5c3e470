"""Strand polylines -> segment Gaussians (the strand-aligned parameterization).

Shared by stages 2 and 3 (reference: gaussian_model_latent_strands.py:442-504
and gaussian_model_strands.py:435-454):

- Gaussian centers = segment midpoints;
- rotation = parallel transport of the +x axis onto the segment direction
  (unnormalized quaternion [1 + x.d, x x d], general_utils.py:150-160);
- scaling = [|segment|/2, r, r] with r = strand_scale * scene_scale
  (1e-3 * scale.pickle scale);
- opacity = label = 1 for hair.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussianhaircut_tpu.ops.quaternion import build_rotation, parallel_transport


class StrandGaussians(NamedTuple):
    xyz: jnp.ndarray              # [N*(L-1), 3] segment midpoints
    direction: jnp.ndarray        # [N*(L-1), 3] segment vectors (unnormalized)
    rotation: jnp.ndarray         # [N*(L-1), 4] quaternion (unnormalized)
    rotation_matrix: jnp.ndarray  # [N*(L-1), 3, 3]
    scaling: jnp.ndarray          # [N*(L-1), 3] activated scales


def strands_to_gaussians(points: jnp.ndarray, radius_scale) -> StrandGaussians:
    """points [N, L, 3]; radius_scale: scalar = strand_scale * scene_scale."""
    mid = 0.5 * (points[:, 1:] + points[:, :-1])
    seg = points[:, 1:] - points[:, :-1]
    n, s, _ = seg.shape
    mid = mid.reshape(-1, 3)
    seg = seg.reshape(-1, 3)

    x_axis = jnp.concatenate(
        [jnp.ones_like(seg[:, :1]), jnp.zeros_like(seg[:, :2])], axis=-1)
    quat = parallel_transport(x_axis, seg)
    rot_m = build_rotation(quat)

    # grad-safe norm (zero-length segments would NaN jnp.linalg.norm's grad)
    half_len = 0.5 * jnp.sqrt(jnp.maximum(
        jnp.sum(seg * seg, axis=-1, keepdims=True), 1e-24))
    r = jnp.broadcast_to(jnp.asarray(radius_scale, seg.dtype), half_len.shape)
    scaling = jnp.concatenate([half_len, r, r], axis=-1)
    return StrandGaussians(mid, seg, quat, rot_m, scaling)
