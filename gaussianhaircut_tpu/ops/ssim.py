"""SSIM with an 11x11 sigma-1.5 Gaussian window (reference: loss_utils.py:81-121).

Implemented as two banded-matrix MATMULS (one per image axis) instead of the
reference's dense 2D conv: a depthwise C=3 convolution lowers to a near-scalar
path on TPU (measured 8.3 ms fwd+bwd of a 10.6 ms loss stack at 960x544),
while the equivalent [H, H]/[W, W] band matmuls ride the MXU (~0.3 ms).  The
band matrix's truncated rows ARE the SAME zero-padding semantics
(F.conv2d(padding=window//2)).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded blur matrix: B[i, j] = win[j - i + w//2] for
    |j - i| <= w//2 (rows truncate at the edges = zero padding)."""
    win = _gaussian_window(window_size, sigma)
    half = window_size // 2
    b = np.zeros((n, n), np.float32)
    for k in range(-half, half + 1):
        b += np.diag(np.full(n - abs(k), win[k + half], np.float32), k)
    return b


def _blur(img: jnp.ndarray, window_size: int = 11,
          sigma: float = 1.5) -> jnp.ndarray:
    """Separable Gaussian blur of [C, H, W] with SAME zero padding, as two
    band matmuls (contract H, then W).  HIGHEST precision: exact-enough
    accumulation (the window sums to 1; bf16 default would inject 4e-3
    relative noise into the SSIM gradient)."""
    c, h, w = img.shape
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    x = jnp.einsum("chw,hk->ckw", img, bh,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ckw,wj->ckj", x, bw,
                      precision=jax.lax.Precision.HIGHEST)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images in [0, 1]."""
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
