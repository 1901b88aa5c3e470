"""Quaternion / rotation utilities (batched, pure jnp).

Semantics match the reference's utils (src/utils/general_utils.py:79-120,150-160):
- ``build_rotation`` uses the *column-major* construction the reference settled
  on (note the transposed indices vs. the commented-out block at
  general_utils.py:91-99), i.e. R here is the transpose of the textbook
  quat-to-matrix; the Gaussian principal axes are the ROWS of R
  (cov = R^T S^2 R after M = S @ R, M^T M).
- ``parallel_transport`` returns the (unnormalized) quaternion
  [1 + a.b, a x b] rotating unit a onto unit b (general_utils.py:150-160).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize along axis (torch.nn.functional.normalize semantics:
    division by max(||v||, eps)).

    Implemented as v / sqrt(max(||v||^2, eps^2)) so the gradient is finite at
    v = 0 (jnp.linalg.norm has a NaN gradient there, and JAX's 0 * NaN
    poisons masked pixels — torch's clamped-norm backward doesn't)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps * eps))


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) [..., 4] (w, x, y, z), not necessarily unit -> [..., 3, 3].

    Normalizes first (like general_utils.py:80-82), but with the CLAMPED
    norm: the reference's unguarded ``q / q.norm()`` NaNs (forward and
    gradient) on an exactly-zero quaternion, which parallel_transport
    produces for an exactly-antipodal segment.  That case is unreachable in
    the reference's f32 CUDA path but real here: a bf16-quantized strand
    decoder can emit segments exactly along -x, and ONE such segment NaNs
    the whole gradient tree, so the NaN-guard silently skips EVERY stage-3
    step (the 2026-08-17 stage-3 refinement freeze).  Clamped, q = 0 maps
    to the identity rotation with finite gradients.
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Rows of the result (reference writes R[:, i, j] with i/j swapped
    # relative to the textbook formula — see general_utils.py:100-108).
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + r * z), 2 * (x * z - r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y - r * z), 1 - 2 * (x * x + z * z), 2 * (y * z + r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z + r * y), 2 * (y * z - r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4] (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def parallel_transport(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion rotating direction a onto b.

    q = [1 + a.b, a x b] with a, b normalized first
    (reference: general_utils.py:150-160; intentionally NOT normalized —
    the Gaussian model's rotation activation normalizes downstream).
    """
    a = normalize(a)
    b = normalize(b)
    s = 1.0 + jnp.sum(a * b, axis=-1, keepdims=True)
    v = jnp.cross(a, b)
    return jnp.concatenate([s, v], axis=-1)
