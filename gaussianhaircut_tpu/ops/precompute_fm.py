"""Feature-major per-Gaussian precompute: the fused [K, P]-layout twin of
renderer.prepare_raster_inputs.

Motivation (tools/tpu_profile_r3b.py section E, v5e): a pure copy of an
[N, 3] f32 array costs ~3.5x the flat equivalent and [N, 24] ~2x — the TPU
pads the minor dim toward the 128 lane quantum, so every one of the ~40
small ops in the row-major precompute chain ([P, 3] stacks, [P, 3, 3]
batched matmuls) moves several times its logical bytes.  Here every
intermediate is a 1-D [P] row (unpadded, full-lane VPU); inputs are
transposed ONCE on entry and the four rasterizer operands transposed back
on exit.  Measured fwd+bwd: 10.8 ms -> see NOTES_ROUND3.

The math is a line-for-line transcription of ops/projection.py + ops/sh.py
(same constants, same orders: reference src/scene/gaussian_model.py:143-393,
src/utils/sh_utils.py:26-118); tests/test_ops.py asserts fwd+grad
equivalence against the row-major path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops import sh as sh_ops
from gaussianhaircut_tpu.ops.projection import CameraGeom, focals

_C0 = sh_ops.C0
_C1 = sh_ops.C1
_C2 = sh_ops.C2
_C3 = sh_ops.C3
_C4 = sh_ops.C4


def _sh_basis_rows(deg: int, x, y, z):
    """sh_basis as a list of [P] rows (same constants/order as ops/sh.py)."""
    one = jnp.ones_like(x)
    out = [_C0 * one]
    if deg > 0:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [_C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz, _C2[4] * (xx - yy)]
    if deg > 2:
        out += [_C3[0] * y * (3 * xx - yy), _C3[1] * xy * z,
                _C3[2] * y * (4 * zz - xx - yy),
                _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                _C3[4] * x * (4 * zz - xx - yy), _C3[5] * z * (xx - yy),
                _C3[6] * x * (xx - 3 * yy)]
    if deg > 3:
        out += [_C4[0] * xy * (xx - yy), _C4[1] * yz * (3 * xx - yy),
                _C4[2] * xy * (7 * zz - 1), _C4[3] * yz * (7 * zz - 3),
                _C4[4] * (zz * (35 * zz - 30) + 3), _C4[5] * xz * (7 * zz - 3),
                _C4[6] * (xx - yy) * (7 * zz - 1),
                _C4[7] * xz * (xx - 3 * yy),
                _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return out


def prepare_fm(fields, active_sh_degree: int, cam: CameraGeom,
               scaling_modifier: float = 1.0):
    """GaussianFields -> (ndc, conic, colors10, opacity, depth, valid); the
    feature-major body of renderer.prepare_raster_inputs."""
    p = fields.xyz.shape[0]
    k = (active_sh_degree + 1) ** 2

    # ---- one transpose per input ----
    x, y, z = fields.xyz.T
    s0, s1, s2 = (fields.scaling * scaling_modifier).T
    r = fields.rotation_matrix.reshape(p, 9).T            # rows R[k//3, k%3]
    ft = fields.features[:, :k, :].reshape(p, 3 * k).T    # rows k*3 + c
    label = fields.label[:, 0]
    conf = fields.orient_conf[:, 0]

    vm = cam.viewmatrix
    pm = cam.projmatrix

    # ---- to_view / depth (projection.to_view row-vector convention) ----
    tz = x * vm[0, 2] + y * vm[1, 2] + z * vm[2, 2] + vm[3, 2]
    depth = tz

    # ---- project_ndc (1e-7 w eps, gaussian_model.py:317-337) ----
    hw = x * pm[0, 3] + y * pm[1, 3] + z * pm[2, 3] + pm[3, 3]
    inv_w = 1.0 / (hw + 1e-7)
    ndc_rows = [(x * pm[0, i] + y * pm[1, i] + z * pm[2, i] + pm[3, i]) * inv_w
                for i in range(3)]

    # ---- EWA T = W @ J (projection._ewa_jacobian_T) ----
    focal_x, focal_y = focals(cam)
    tx = x * vm[0, 0] + y * vm[1, 0] + z * vm[2, 0] + vm[3, 0]
    ty = x * vm[0, 1] + y * vm[1, 1] + z * vm[2, 1] + vm[3, 1]
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    txc = jnp.clip(tx / tz, -limx, limx) * tz
    tyc = jnp.clip(ty / tz, -limy, limy) * tz
    j0 = focal_x / tz                  # J[0, 0]
    j1 = focal_y / tz                  # J[1, 1]
    j2x = -(focal_x * txc) / (tz * tz)  # J[2, 0]
    j2y = -(focal_y * tyc) / (tz * tz)  # J[2, 1]
    # T[j, i] = sum_m W[j, m] J[m, i]; W = viewmatrix[:3, :3] is constant
    t_0 = [vm[j, 0] * j0 + vm[j, 2] * j2x for j in range(3)]  # T[:, 0]
    t_1 = [vm[j, 1] * j1 + vm[j, 2] * j2y for j in range(3)]  # T[:, 1]

    # ---- cov3d = (S R)^T (S R) (projection.covariance_3d) ----
    m = [[s0 * r[0 + j], s1 * r[3 + j], s2 * r[6 + j]] for j in range(3)]
    # cov3d[a, b] = sum_k M[k, a] M[k, b]
    cov = {}
    for a in range(3):
        for b in range(a, 3):
            cov[(a, b)] = (m[a][0] * m[b][0] + m[a][1] * m[b][1]
                           + m[a][2] * m[b][2])

    def cov3d(a, b):
        return cov[(a, b)] if a <= b else cov[(b, a)]

    # ---- cov2d = T^T cov3d T + 0.3 I (projection.covariance_2d) ----
    tcols = (t_0, t_1)

    def cov2d_entry(a, b):
        acc = 0.0
        for i in range(3):
            u_ib = (cov3d(i, 0) * tcols[b][0] + cov3d(i, 1) * tcols[b][1]
                    + cov3d(i, 2) * tcols[b][2])
            acc = acc + tcols[a][i] * u_ib
        return acc

    c00 = cov2d_entry(0, 0) + 0.3
    c01 = cov2d_entry(0, 1)
    c11 = cov2d_entry(1, 1) + 0.3

    # ---- conic (1e-12 det eps, projection.conic_from_cov2d) ----
    det = c00 * c11 - c01 * c01
    det_inv = 1.0 / (det + 1e-12)
    conic_rows = [c11 * det_inv, -c01 * det_inv, c00 * det_inv]

    # ---- SH -> RGB (ops/sh.py eval + the +0.5 shift / 0 clamp) ----
    dx = x - cam.campos[0]
    dy = y - cam.campos[1]
    dz = z - cam.campos[2]
    n2 = dx * dx + dy * dy + dz * dz
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-24))
    basis = _sh_basis_rows(active_sh_degree, dx * inv_n, dy * inv_n,
                           dz * inv_n)
    rgb_rows = []
    for c in range(3):
        acc = basis[0] * ft[c]
        for kk in range(1, k):
            acc = acc + basis[kk] * ft[kk * 3 + c]
        rgb_rows.append(jnp.maximum(acc + 0.5, 0.0))

    # ---- dir2d (projection.principal_axis / direction_2d) ----
    o0 = (s0 >= s1) & (s0 >= s2)                 # argmax, first-wins ties
    o1 = ~o0 & (s1 >= s2)
    o0 = o0.astype(s0.dtype)
    o1 = o1.astype(s0.dtype)
    o2 = 1.0 - o0 - o1
    sm = o0 * s0 + o1 * s1 + o2 * s2
    d = [sm * (o0 * r[0 + j] + o1 * r[3 + j] + o2 * r[6 + j])
         for j in range(3)]
    dir2d_0 = d[0] * t_0[0] + d[1] * t_0[1] + d[2] * t_0[2]
    dir2d_1 = d[0] * t_1[0] + d[1] * t_1[1] + d[2] * t_1[2]
    zero = jnp.zeros_like(dir2d_0)
    if fields.use_direction is not None:
        dir2d_0 = dir2d_0 * fields.use_direction
        dir2d_1 = dir2d_1 * fields.use_direction
        conf = conf * fields.use_direction

    # ---- transpose back to the rasterizer's row-major operands ----
    ndc = jnp.stack(ndc_rows, axis=0).T + fields.viewspace
    conic = jnp.stack(conic_rows, axis=0).T
    colors = jnp.stack(
        rgb_rows + [label, jnp.ones_like(label), dir2d_0, dir2d_1, zero,
                    conf, depth], axis=0).T
    return (ndc, conic, colors, fields.opacity, depth, fields.valid)
