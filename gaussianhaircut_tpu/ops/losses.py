"""Training losses (reference: src/utils/loss_utils.py).

All functions are pure jnp, operate on [C, H, W] images like the reference,
and keep its exact weighting/eps semantics.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, weight=None, mask=None) -> jnp.ndarray:
    """Masked/weighted L1 (loss_utils.py:19-26): mask multiplies the residual,
    weight normalizes by its own sum."""
    loss = jnp.abs(pred - gt)
    if mask is not None:
        loss = loss * mask
    if weight is not None:
        return jnp.sum(loss * weight) / jnp.sum(weight)
    return jnp.mean(loss)


def ce_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy with the reference's clamp (loss_utils.py:28-29)."""
    p = jnp.clip(pred, 1e-3, 1.0 - 1e-3)
    return jnp.mean(-(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p)))


def or_loss(pred: jnp.ndarray, gt: jnp.ndarray, confs=None, weight=None, mask=None):
    """Wrapped-angle orientation loss in [0, 1] turns, scaled by pi, with the
    optional aleatoric-confidence term (loss_utils.py:31-47).

    Angles live in [0, 1] ~ [0, pi); the distance wraps at 1.
    """
    if weight is None:
        weight = jnp.ones_like(gt[:1])
    d = pred - gt
    loss = jnp.minimum(jnp.abs(d), jnp.minimum(jnp.abs(d - 1.0), jnp.abs(d + 1.0)))
    loss = loss * math.pi
    if confs is not None:
        loss = loss * confs - jnp.log(confs + 1e-7)
    if mask is not None:
        loss = loss * mask
    return jnp.sum(loss * weight) / jnp.sum(weight)


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR (image_utils.py:13-20 computes per-batch-row mean MSE)."""
    m = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))
