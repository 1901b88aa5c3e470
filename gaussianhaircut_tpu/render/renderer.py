"""The renderer: per-Gaussian differentiable precomputation + 10-channel
splatting + channel decoding.

JAX analog of src/gaussian_renderer/__init__.py:23-214.  All geometry
(EWA conic, NDC means, SH->RGB, 2D strand direction, view depth) is computed
in pure jnp — this is the differentiable surface through which the kernel's
{means2D, conic, colors, opacity} cotangents reach every model parameter and
the camera residuals (SURVEY.md §7.1).

Channel layout (gaussian_renderer/__init__.py:64-74):
  [rgb(3) | label(1) | fg=1(1) | dir2d(3) | orient_conf(1) | view-depth(1)]
Decode (gaussian_renderer/__init__.py:100-105): split [3, 2, 3, 1, 1];
orientation angle = acos(clamp(dir_y, +-(1-1e-3)) * sign(dir_x)) / pi.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.ops import projection as proj
from gaussianhaircut_tpu.ops import sh as sh_ops
from gaussianhaircut_tpu.ops.quaternion import build_rotation, normalize
from gaussianhaircut_tpu.ops.rasterize import (
    RasterConfig, rasterize, rasterize_batched,
)


class GaussianFields(NamedTuple):
    """Raw activated per-Gaussian fields — the common renderer input for the
    unstructured model (stage 1) and the concatenated head+hair set
    (stages 2/3, gaussian_renderer/__init__.py:116-197)."""
    xyz: jnp.ndarray           # [P, 3]
    features: jnp.ndarray      # [P, K, 3] SH coefficients
    scaling: jnp.ndarray       # [P, 3] activated (exp'd)
    rotation_matrix: jnp.ndarray  # [P, 3, 3]
    opacity: jnp.ndarray       # [P, 1] activated
    label: jnp.ndarray         # [P, 1] activated
    orient_conf: jnp.ndarray   # [P, 1] activated
    valid: jnp.ndarray         # [P] bool
    viewspace: jnp.ndarray     # [P, 3] zero gradient port added to NDC means
    use_direction: jnp.ndarray | None = None  # [P] 1.0 for hair rows (dir2d/
                                              # conf zeroed elsewhere), None = all


def prepare_raster_inputs(fields: GaussianFields, active_sh_degree: int,
                          cam: proj.CameraGeom, scaling_modifier: float = 1.0):
    """Differentiable per-Gaussian precompute -> the rasterize() operand tuple
    (ndc, conic, colors10, opacity, depth, valid).

    Dispatches to the feature-major fused body (ops/precompute_fm.py) unless
    QH_PRECOMPUTE=rowmajor — the [P, 3]/[P, 3, 3] row-major chain below is
    kept as the readable reference implementation; tests/test_ops.py asserts
    fwd+grad equivalence.  Default = fm since the 2026-08-18 hardware gate
    (tools/tpu_fm_parity.py): fm sits within 2e-7 rel-to-max of the
    Precision.HIGHEST oracle on TPU (the rowmajor path's default-precision
    batched matmuls are ~1e-3 off) and is ~1.8x faster fwd+grad — bench
    15.11 -> 17.08 it/s at 100k@960x544."""
    import os
    if os.environ.get("QH_PRECOMPUTE", "fm") == "fm":
        from gaussianhaircut_tpu.ops import precompute_fm
        return precompute_fm.prepare_fm(fields, active_sh_degree, cam,
                                        scaling_modifier)
    return prepare_raster_inputs_rowmajor(fields, active_sh_degree, cam,
                                          scaling_modifier)


def prepare_raster_inputs_rowmajor(fields: GaussianFields,
                                   active_sh_degree: int,
                                   cam: proj.CameraGeom,
                                   scaling_modifier: float = 1.0):
    """Row-major reference implementation of prepare_raster_inputs.

    Runs under Precision.HIGHEST: at the TPU default precision the batched
    [P, 3, 3] matmuls truncate operands to bf16, and for near-degenerate
    strand-segment covariances that quantization produced NaN *gradients*
    (finite losses, every step silently skipped by the NaN guard — the
    round-3 stage-3 refinement freeze, /tmp/diag_s3_tpu 2026-08-18: 88k
    nonfinite grad elements with rowmajor, zero with fm, on the identical
    stage-2 state).  As the reference/oracle path its semantics must match
    CPU f32, not the fastest MXU mode."""
    with jax.default_matmul_precision("highest"):
        return _prepare_rowmajor_body(fields, active_sh_degree, cam,
                                      scaling_modifier)


def _prepare_rowmajor_body(fields, active_sh_degree, cam, scaling_modifier):
    xyz = fields.xyz
    scaling = fields.scaling * scaling_modifier
    rot_m = fields.rotation_matrix

    cov3d = proj.covariance_3d(scaling, rot_m)
    cov2d = proj.covariance_2d(xyz, cov3d, cam)
    conic = proj.conic_from_cov2d(cov2d)
    ndc = proj.project_ndc(xyz, cam.projmatrix) + fields.viewspace
    depth = proj.depths(xyz, cam)

    dirs = normalize(xyz - cam.campos[None, :])
    rgb = jnp.maximum(sh_ops.eval_sh(active_sh_degree, fields.features, dirs) + 0.5, 0.0)

    dir2d = proj.direction_2d(xyz, scaling, rot_m, cam)
    orient_conf = fields.orient_conf
    if fields.use_direction is not None:
        dir2d = dir2d * fields.use_direction[:, None]
        orient_conf = orient_conf * fields.use_direction[:, None]

    colors = jnp.concatenate(
        [rgb, fields.label, jnp.ones_like(fields.label), dir2d, orient_conf,
         depth], axis=-1)
    return ndc, conic, colors, fields.opacity, depth[:, 0], fields.valid


def decode_render10(render10: jnp.ndarray) -> dict:
    """Channel decode of a composited [10, H, W] image
    (gaussian_renderer/__init__.py:100-105)."""
    image = render10[0:3]
    mask = render10[3:5]
    dir_r = render10[5:7]
    orient_conf_r = render10[8:9]

    # safe normalize: keeps the gradient finite at zero-direction (background)
    # pixels — see ops.quaternion.normalize
    dir_n2 = jnp.sum(dir_r * dir_r, axis=0, keepdims=True)
    dir_n = dir_r / jnp.sqrt(jnp.maximum(dir_n2, 1e-24))
    mirror = jnp.where(dir_n[0:1] < 0, -1.0, 1.0)
    orient_angle = jnp.arccos(
        jnp.clip(dir_n[1:2], -1 + 1e-3, 1 - 1e-3) * mirror) / math.pi

    return {
        "render": image,
        "mask": mask,
        "orient_angle": orient_angle,
        "orient_conf": orient_conf_r,
        "depth": render10[9:10],
        "render10": render10,
    }


def render_fields(fields: GaussianFields, active_sh_degree: int,
                  cam: proj.CameraGeom, bg: jnp.ndarray,
                  cfg: RasterConfig | None = None,
                  scaling_modifier: float = 1.0) -> dict:
    """Render activated fields through the splatting kernel and decode."""
    ndc, conic, colors, opacity, depth, valid = prepare_raster_inputs(
        fields, active_sh_degree, cam, scaling_modifier)
    out = rasterize(ndc, conic, colors, opacity, depth, valid, bg,
                    cam.width, cam.height, cfg)
    decoded = decode_render10(out["render"])
    decoded.update({
        "final_T": out["final_T"],
        "visibility_filter": out["visibility"],
        "radii": out["radii"],
        "num_rendered": out["num_rendered"],
    })
    return decoded


def render_fields_batched(fields: GaussianFields, active_sh_degree: int,
                          make_cam, cam_idxs: jnp.ndarray, bg: jnp.ndarray,
                          width: int, height: int,
                          cfg: RasterConfig | None = None,
                          viewspace_batch: jnp.ndarray | None = None) -> dict:
    """Batched-camera render: one precompute vmap over B cameras + ONE
    rasterize_batched sweep (single-chip batch amortization — the CUDA
    reference is strictly 1 camera/iteration, train_gaussians.py:103-105).

    ``make_cam(idx) -> CameraGeom`` builds the camera bundle inside the vmap
    (CameraGeom's width/height are static ints, so the pytree itself can't
    cross a vmap boundary).  ``viewspace_batch`` [B, P, 3] (optional)
    replaces the per-Gaussian viewspace port per camera, so its gradient
    comes back PER-CAMERA — the densify-stats contract (the reference
    accumulates per-iteration viewspace-grad norms).
    Returns the decoded dict with a leading [B] axis on every output.
    """

    def prep_one(idx, vs):
        f = fields if vs is None else fields._replace(viewspace=vs)
        return prepare_raster_inputs(f, active_sh_degree, make_cam(idx))

    if viewspace_batch is None:
        ops = jax.vmap(lambda i: prep_one(i, None))(cam_idxs)
    else:
        ops = jax.vmap(prep_one)(cam_idxs, viewspace_batch)
    ndc, conic, colors, opacity, depth, valid = ops
    out = rasterize_batched(ndc, conic, colors, opacity, depth, valid, bg,
                            width, height, cfg)
    decoded = jax.vmap(decode_render10)(out["render"])
    decoded.update({
        "final_T": out["final_T"],
        "visibility_filter": out["visibility"],
        "radii": out["radii"],
        "num_rendered": out["num_rendered"],
    })
    return decoded


def fields_from_params(p: gm.GaussianParams, alive: jnp.ndarray) -> GaussianFields:
    return GaussianFields(
        xyz=p.xyz,
        features=gm.get_features(p),
        scaling=gm.get_scaling(p),
        rotation_matrix=build_rotation(p.rotation),
        opacity=gm.get_opacity(p),
        label=gm.get_label(p),
        orient_conf=gm.get_orient_conf(p),
        valid=alive,
        viewspace=p.viewspace,
    )


def render(params: gm.GaussianParams, alive: jnp.ndarray,
           active_sh_degree: int, cam: proj.CameraGeom, bg: jnp.ndarray,
           cfg: RasterConfig | None = None,
           scaling_modifier: float = 1.0) -> dict:
    """Stage-1 render() (gaussian_renderer/__init__.py:23-113)."""
    return render_fields(fields_from_params(params, alive), active_sh_degree,
                         cam, bg, cfg, scaling_modifier)


def default_background(white: bool) -> jnp.ndarray:
    """[10] background; depth channel background = 100
    (train_gaussians.py:68)."""
    rgb = 1.0 if white else 0.0
    return jnp.asarray([rgb, rgb, rgb, 0, 0, 0, 0, 0, 0, 100], jnp.float32)
