"""Per-Gaussian camera geometry: EWA covariance projection, conics, screen
means, depths, 2D strand directions, frustum/tile culling.

This is the differentiable surface of the renderer.  It reproduces, in batched
pure-jnp form, the reference's PyTorch "CUDA replica" math
(src/scene/gaussian_model.py:143-393) — including every load-bearing constant
(0.3 cov dilation, 1.3*tanfov clamp, 1e-12 det eps, 1e-7 w eps, 0.1 eigen
clamp, z > 0.2 near cull) — because those constants are part of the numerical
contract with the reference (SURVEY.md §7.3/7.4).

Conventions (identical to the reference):
- ``viewmatrix``/``projmatrix`` are ROW-VECTOR 4x4 transforms (the transpose of
  the usual column-vector matrices): x_view = x @ M[:3, :3] + M[3, :3].
- NDC -> pixel: px = ((ndc + 1) * S - 1) / 2 (cuda_rasterizer ndc2Pix).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CameraGeom(NamedTuple):
    """Static-shape camera bundle used by the ops layer (all jnp scalars/arrays)."""
    viewmatrix: jnp.ndarray      # [4, 4] row-vector world->view
    projmatrix: jnp.ndarray      # [4, 4] row-vector world->NDC (full proj)
    tan_fovx: jnp.ndarray        # scalar
    tan_fovy: jnp.ndarray        # scalar
    width: int                   # static python int
    height: int                  # static python int
    campos: jnp.ndarray          # [3]


def to_view(xyz: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """[P, 3] world -> view (row-vector convention)."""
    return xyz @ viewmatrix[:3, :3] + viewmatrix[3, :3]


def project_ndc(xyz: jnp.ndarray, projmatrix: jnp.ndarray) -> jnp.ndarray:
    """[P, 3] world -> NDC [P, 3] with the reference's 1e-7 w-eps
    (gaussian_model.py:317-337)."""
    p_hom = xyz @ projmatrix[:3, :] + projmatrix[3, :]
    p_w = 1.0 / (p_hom[:, 3:4] + 1e-7)
    return p_hom[:, :3] * p_w


def ndc_to_pixel(ndc_xy: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """NDC xy -> pixel coords (cuda ndc2Pix: ((v+1)*S - 1)/2)."""
    size = jnp.asarray([width, height], dtype=ndc_xy.dtype)
    return ((ndc_xy + 1.0) * size - 1.0) * 0.5


def focals(cam: CameraGeom) -> tuple[jnp.ndarray, jnp.ndarray]:
    focal_x = cam.width / (2.0 * cam.tan_fovx)
    focal_y = cam.height / (2.0 * cam.tan_fovy)
    return focal_x, focal_y


def _ewa_jacobian_T(xyz: jnp.ndarray, cam: CameraGeom) -> jnp.ndarray:
    """T = W @ J, the [P, 3, 3] transform used for both cov2d and dir2d
    (gaussian_model.py:252-301,344-393).  Returns T with the reference's
    layout: rows index world axes, columns index (x_img, y_img, unused)."""
    focal_x, focal_y = focals(cam)
    t = to_view(xyz, cam.viewmatrix)
    tx, ty, tz = t[:, 0], t[:, 1], t[:, 2]
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz
    zeros = jnp.zeros_like(tz)
    # J columns (gaussian_model.py:279-286): col0 = [fx/tz, 0, -fx*tx/tz^2],
    # col1 = [0, fy/tz, -fy*ty/tz^2], col2 = 0.
    j_col0 = jnp.stack([focal_x / tz, zeros, -(focal_x * tx) / (tz * tz)], axis=-1)
    j_col1 = jnp.stack([zeros, focal_y / tz, -(focal_y * ty) / (tz * tz)], axis=-1)
    j_col2 = jnp.stack([zeros, zeros, zeros], axis=-1)
    J = jnp.stack([j_col0, j_col1, j_col2], axis=-1)  # [P, 3, 3]
    W = cam.viewmatrix[None, :3, :3]
    return W @ J


def covariance_3d(scaling: jnp.ndarray, rotation_matrix: jnp.ndarray) -> jnp.ndarray:
    """Full 3D covariance [P, 3, 3] = (S R)^T (S R) with S = diag(scaling)
    (gaussian_model.py:230-250)."""
    M = scaling[:, :, None] * rotation_matrix  # S @ R (rows scaled)
    return jnp.swapaxes(M, 1, 2) @ M


def covariance_2d(xyz: jnp.ndarray, cov3d_full: jnp.ndarray, cam: CameraGeom) -> jnp.ndarray:
    """EWA-projected 2D covariance, packed [P, 3] = (c00, c01, c11), with the
    +0.3 screen-space dilation (gaussian_model.py:292-301 / forward.cu:110-112)."""
    T = _ewa_jacobian_T(xyz, cam)
    cov2d_full = jnp.swapaxes(T, 1, 2) @ cov3d_full @ T
    c00 = cov2d_full[:, 0, 0] + 0.3
    c01 = cov2d_full[:, 0, 1]
    c11 = cov2d_full[:, 1, 1] + 0.3
    return jnp.stack([c00, c01, c11], axis=-1)


def conic_from_cov2d(cov2d: jnp.ndarray) -> jnp.ndarray:
    """Invert packed 2x2 covariance -> conic [P, 3] = (a, b, c) with the
    reference's 1e-12 det eps (gaussian_model.py:303-315)."""
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_inv = 1.0 / (det + 1e-12)
    return jnp.stack([cov2d[:, 2], -cov2d[:, 1], cov2d[:, 0]], axis=-1) * det_inv[:, None]


def radius_from_cov2d(cov2d: jnp.ndarray) -> jnp.ndarray:
    """Screen-space radius = ceil(3*sqrt(max eigenvalue)) with the 0.1 clamp
    on the discriminant (forward.cu:254-262, gaussian_model.py:174-183)."""
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    sqrt_d = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam_max = jnp.maximum(mid + sqrt_d, mid - sqrt_d)
    return jnp.ceil(3.0 * jnp.sqrt(lam_max))


def depths(xyz: jnp.ndarray, cam: CameraGeom) -> jnp.ndarray:
    """View-space z [P, 1] (gaussian_model.py:339-342)."""
    return to_view(xyz, cam.viewmatrix)[:, 2:3]


def principal_axis(scaling: jnp.ndarray, rotation_matrix: jnp.ndarray) -> jnp.ndarray:
    """Longest principal axis vector [P, 3]: the row of R for the largest
    scale, times that scale (gaussian_model.py:384-388).

    One-hot arithmetic instead of take_along_axis: the gather's autodiff
    transpose is a scatter-add, which is slow on TPU and sat in the
    stage-1 step's hot precompute path."""
    j = jnp.argmax(scaling, axis=-1)
    onehot = jax.nn.one_hot(j, scaling.shape[-1], dtype=scaling.dtype)
    rows = jnp.einsum("pk,pkj->pj", onehot, rotation_matrix)
    s = jnp.sum(scaling * onehot, axis=-1, keepdims=True)
    return rows * s


def direction_2d(xyz: jnp.ndarray, scaling: jnp.ndarray,
                 rotation_matrix: jnp.ndarray, cam: CameraGeom) -> jnp.ndarray:
    """Screen-space strand direction [P, 3] (3rd component is always 0):
    longest axis projected through T = W @ J (gaussian_model.py:344-393)."""
    T = _ewa_jacobian_T(xyz, cam)
    d = principal_axis(scaling, rotation_matrix)
    return jnp.einsum("pi,pij->pj", d, T)


def tile_rect(mean_pix: jnp.ndarray, radius: jnp.ndarray,
              grid_x: int, grid_y: int, tile_w: int, tile_h: int):
    """Tile-aligned bounding rect per Gaussian (cuda getRect semantics:
    int-cast truncation then clamp to [0, grid]).  Returns (min_x, min_y,
    max_x, max_y) int32 arrays; rect is half-open in tile units."""
    px, py = mean_pix[:, 0], mean_pix[:, 1]
    rect_min_x = jnp.clip(((px - radius) / tile_w).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((py - radius) / tile_h).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(((px + radius + tile_w - 1) / tile_w).astype(jnp.int32), 0, grid_x)
    rect_max_y = jnp.clip(((py + radius + tile_h - 1) / tile_h).astype(jnp.int32), 0, grid_y)
    return rect_min_x, rect_min_y, rect_max_x, rect_max_y


def visibility_mask(xyz: jnp.ndarray, cov2d: jnp.ndarray, ndc: jnp.ndarray,
                    cam: CameraGeom, tile_w: int = 16, tile_h: int = 16) -> jnp.ndarray:
    """The reference's Python-side culling (gaussian_model.py:143-228):
    z > 0.2 near-plane, nonzero cov2d determinant, nonempty tile rect."""
    z = to_view(xyz, cam.viewmatrix)[:, 2]
    mask = z > 0.2
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    mask &= det != 0
    radius = radius_from_cov2d(cov2d)
    mean_pix = ndc_to_pixel(ndc[:, :2], cam.width, cam.height)
    grid_x = (cam.width + tile_w - 1) // tile_w
    grid_y = (cam.height + tile_h - 1) // tile_h
    r0, r1, r2, r3 = tile_rect(mean_pix, radius, grid_x, grid_y, tile_w, tile_h)
    mask &= (r2 - r0) * (r3 - r1) != 0
    return mask
