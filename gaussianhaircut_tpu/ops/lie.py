"""SO(3)/SE(3) exponential maps for BARF-style trainable camera residuals.

Same math as the reference's vendored BARF utilities
(src/utils/camera_opt_utils.py:62-141): Taylor-series A/B/C coefficients keep
the maps smooth (and differentiable) at theta -> 0, which matters because the
residuals are initialized at exactly zero.  Also provides the 6D
orthonormalization parameterization (cameras.py:170-196) used when BARF mode
is off.
"""
from __future__ import annotations

import jax.numpy as jnp

from gaussianhaircut_tpu.ops.quaternion import normalize

_NTH = 10


def _taylor(x2: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Taylor series of sin(x)/x (A), (1-cos x)/x^2 (B), (x-sin x)/x^3 (C),
    as functions of x^2 (camera_opt_utils.py:118-141)."""
    ans = jnp.zeros_like(x2)
    denom = 1.0
    pow_ = jnp.ones_like(x2)
    for i in range(_NTH + 1):
        if kind == "A":
            if i > 0:
                denom *= (2 * i) * (2 * i + 1)
        elif kind == "B":
            denom *= (2 * i + 1) * (2 * i + 2)
        else:
            denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + ((-1) ** i) * pow_ / denom
        pow_ = pow_ * x2
    return ans


def skew(w: jnp.ndarray) -> jnp.ndarray:
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    o = jnp.zeros_like(w0)
    return jnp.stack([
        jnp.stack([o, -w2, w1], axis=-1),
        jnp.stack([w2, o, -w0], axis=-1),
        jnp.stack([-w1, w0, o], axis=-1),
    ], axis=-2)


def so3_to_SO3(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] rotation via Rodrigues (Taylor-safe at 0)."""
    wx = skew(w)
    th2 = jnp.sum(w * w, axis=-1)[..., None, None]
    A = _taylor(th2, "A")
    B = _taylor(th2, "B")
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A * wx + B * (wx @ wx)


def se3_to_SE3(wu: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (w | u) -> [..., 3, 4] pose [R | V u]."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    th2 = jnp.sum(w * w, axis=-1)[..., None, None]
    A = _taylor(th2, "A")
    B = _taylor(th2, "B")
    C = _taylor(th2, "C")
    eye = jnp.eye(3, dtype=wu.dtype)
    R = eye + A * wx + B * (wx @ wx)
    V = eye + B * wx + C * (wx @ wx)
    t = jnp.einsum("...ij,...j->...i", V, u)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def ortho6d_to_rotation(poses: jnp.ndarray) -> jnp.ndarray:
    """6D rotation parameterization -> [..., 3, 3] with columns (x, y, z).

    Gram-Schmidt on the two 3-vectors, matching cameras.py:170-196 (including
    its eps placement: the projection divides by clamp(||u||^2, 1e-8) + 1e-10).
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    x = normalize(x_raw)
    inner = jnp.sum(x * y_raw, axis=-1, keepdims=True)
    norm2 = jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-8)
    y = normalize(y_raw - inner / (norm2 + 1e-10) * x)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)
