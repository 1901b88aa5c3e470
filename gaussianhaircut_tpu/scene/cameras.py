"""Cameras: static per-view data + differentiable pose/intrinsics residuals.

The reference keeps trainable residuals as nn.Parameters on a Camera module
(src/scene/cameras.py:21-154).  JAX-style, the per-camera constants live in a
host-side ``CameraStatic`` (and a stacked ``CameraBatch`` of device arrays for
jit), while the residuals are a separate pytree (``CameraResiduals``) owned by
the train state; ``camera_geom`` recomputes the view/projection transforms
differentiably each step, exactly like the reference's recomputed properties
(cameras.py:94-154):

- BARF mode: residual pose = se(3) exp of a 6-vector (cameras.py:83-121);
- else: 6D-orthonormalized rotation + translation (cameras.py:88,170-196);
- composition: world_view = (colmap_transform @ residual)^T  (row-vector);
- intrinsics: FoV + fov_res, projection matrix per graphics_utils.py:51-72;
- camera_center = inv(world_view)[3, :3].

Conventions follow the reference: the COLMAP transform is the standard
column-vector world->camera matrix; everything handed to the renderer is its
row-vector transpose.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.ops import lie
from gaussianhaircut_tpu.ops.projection import CameraGeom

ZNEAR = 0.01
ZFAR = 100.0


@dataclasses.dataclass
class CameraStatic:
    """Host-side per-view record (constants + ground truth)."""
    uid: int
    colmap_id: int
    image_name: str
    width: int
    height: int
    colmap_transform: np.ndarray      # [4, 4] column-vector world->cam
    fovx: float
    fovy: float
    # Ground truth, already composited over the white/black background by the
    # body mask like cameras.py:64:
    image: Optional[np.ndarray] = None          # [3, H, W]
    mask_hair: Optional[np.ndarray] = None      # [1, H, W]
    mask_body: Optional[np.ndarray] = None      # [1, H, W]
    orient_angle: Optional[np.ndarray] = None   # [1, H, W] in [0,1] ~ [0,pi)
    orient_conf: Optional[np.ndarray] = None    # [1, H, W]

    @property
    def mask(self) -> np.ndarray:
        """[2, H, W] = (hair, body), the reference's original_mask order
        (cameras.py:54)."""
        return np.concatenate([self.mask_hair, self.mask_body], axis=0)


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.zeros(3), scale: float = 1.0) -> np.ndarray:
    """Column-vector w2c from the reference's (R, T) storage, with the
    recenter/rescale hook (graphics_utils.py:38-49).  Note the reference
    stores R already transposed (camera-to-world rotation)."""
    rt = np.eye(4)
    rt[:3, :3] = R.T
    rt[:3, 3] = t
    c2w = np.linalg.inv(rt)
    c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
    return np.linalg.inv(c2w).astype(np.float32)


class CameraResiduals(NamedTuple):
    """Trainable residual pytree, stacked over N cameras."""
    rotation: jnp.ndarray     # [N, 3] (barf) or [N, 6] (ortho6d)
    translation: jnp.ndarray  # [N, 3]
    fov: jnp.ndarray          # [N, 2]

    @staticmethod
    def create(n: int, use_barf: bool = True) -> "CameraResiduals":
        if use_barf:
            rot = jnp.zeros((n, 3), jnp.float32)
        else:
            rot = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0], jnp.float32), (n, 1))
        return CameraResiduals(rot, jnp.zeros((n, 3), jnp.float32),
                               jnp.zeros((n, 2), jnp.float32))


class CameraBatch(NamedTuple):
    """Device-array camera constants stacked over N views (jit-friendly)."""
    colmap_transform: jnp.ndarray  # [N, 4, 4]
    fovx: jnp.ndarray              # [N]
    fovy: jnp.ndarray              # [N]

    @staticmethod
    def from_cameras(cams: list[CameraStatic]) -> "CameraBatch":
        return CameraBatch(
            jnp.asarray(np.stack([c.colmap_transform for c in cams])),
            jnp.asarray(np.array([c.fovx for c in cams], np.float32)),
            jnp.asarray(np.array([c.fovy for c in cams], np.float32)),
        )


def projection_matrix(fovx, fovy, znear: float = ZNEAR, zfar: float = ZFAR):
    """Column-vector perspective matrix with the reference's z-in-[0,1]
    convention (graphics_utils.py:51-72), as a jnp [4, 4]."""
    tx = jnp.tan(fovx * 0.5)
    ty = jnp.tan(fovy * 0.5)
    z = jnp.zeros(())
    row0 = jnp.stack([1.0 / tx, z, z, z])
    row1 = jnp.stack([z, 1.0 / ty, z, z])
    row2 = jnp.stack([z, z, zfar / (zfar - znear) * jnp.ones(()),
                      -(zfar * znear) / (zfar - znear) * jnp.ones(())])
    row3 = jnp.stack([z, z, jnp.ones(()), z])
    return jnp.stack([row0, row1, row2, row3])


def residual_transform(rot_res: jnp.ndarray, trans_res: jnp.ndarray,
                       use_barf: bool) -> jnp.ndarray:
    """[4, 4] residual pose (cameras.py:108-121)."""
    eye = jnp.eye(4, dtype=jnp.float32)
    if use_barf:
        rt = lie.se3_to_SE3(jnp.concatenate([rot_res, trans_res]))
        return eye.at[:3, :].set(rt)
    r = lie.ortho6d_to_rotation(rot_res)
    return eye.at[:3, :3].set(r).at[:3, 3].set(trans_res)


def camera_geom(colmap_transform: jnp.ndarray, fovx, fovy,
                width: int, height: int,
                residuals: CameraResiduals | None = None,
                index=None, use_barf: bool = True,
                trainable_cameras: bool = True,
                trainable_intrinsics: bool = True) -> CameraGeom:
    """Differentiable camera bundle for the renderer.

    colmap_transform [4, 4]; fovx/fovy scalars; residuals indexed by `index`
    (or already per-camera rows if index is None).
    """
    if residuals is not None and trainable_intrinsics:
        fr = residuals.fov if index is None else residuals.fov[index]
        fovx = fovx + fr[0]
        fovy = fovy + fr[1]
    if residuals is not None and trainable_cameras:
        rr = residuals.rotation if index is None else residuals.rotation[index]
        tr = residuals.translation if index is None else residuals.translation[index]
        w2c = colmap_transform @ residual_transform(rr, tr, use_barf)
    else:
        w2c = colmap_transform
    viewmatrix = w2c.T                                  # row-vector convention
    proj = projection_matrix(fovx, fovy)
    full_proj = viewmatrix @ proj.T
    campos = jnp.linalg.inv(viewmatrix)[3, :3]
    return CameraGeom(viewmatrix=viewmatrix, projmatrix=full_proj,
                      tan_fovx=jnp.tan(fovx * 0.5), tan_fovy=jnp.tan(fovy * 0.5),
                      width=width, height=height, campos=campos)
