"""SSIM with an 11x11 sigma-1.5 Gaussian window (reference: loss_utils.py:81-121).

Implemented with two separable 1D depthwise convolutions instead of the
reference's dense 2D conv — same result, and the (C, H, W) layout keeps W in
lanes for the VPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable Gaussian blur of [C, H, W] with SAME zero padding
    (matches F.conv2d(padding=window//2))."""
    c = img.shape[0]
    x = img[None]  # [1, C, H, W]
    kh = win.reshape(1, 1, -1, 1)
    kw = win.reshape(1, 1, 1, -1)
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))
    pad_h = win.shape[0] // 2
    x = lax.conv_general_dilated(x, jnp.tile(kh, (c, 1, 1, 1)),
                                 window_strides=(1, 1),
                                 padding=((pad_h, pad_h), (0, 0)),
                                 dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(x, jnp.tile(kw, (c, 1, 1, 1)),
                                 window_strides=(1, 1),
                                 padding=((0, 0), (pad_h, pad_h)),
                                 dimension_numbers=dn, feature_group_count=c)
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images in [0, 1]."""
    win = jnp.asarray(_gaussian_window(window_size, 1.5))
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
