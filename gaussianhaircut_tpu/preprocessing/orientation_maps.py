"""Gabor orientation maps: per-pixel hair strand orientation + circular
variance (reference: src/preprocessing/calc_orientation_maps.py:24-97).

Pipeline per image:
1. grayscale -> difference-of-Gaussians bandpass (sigmas dog_low/dog_high);
2. bank of `num_filters` (default 180) real Gabor filters, theta in [0, pi)
   (skimage gabor_kernel conventions: sigma_x=1.8, sigma_y=2.4, freq=0.23,
   theta mirrored as pi - theta, 3-sigma support);
3. orientation = argmax_theta |response|; circular variance =
   sum_theta d(theta, argmax)^2 * |response|_L1-normalized.

The filter bank is one grouped convolution -> MXU; the whole map is jitted
(row-band chunking keeps the [180, H, W] response tensor bounded).
Outputs match the reference's on-disk contract: angle PNG in integer degrees
[0, 180), variance .npy float16.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def gabor_kernel_real(frequency: float, theta: float, sigma_x: float,
                      sigma_y: float, offset: float = 0.0,
                      nstds: float = 3.0) -> np.ndarray:
    """Real part of a complex Gabor kernel, skimage conventions (rotated
    Gaussian envelope x complex sinusoid along x_theta, normalized by
    2 pi sigma_x sigma_y)."""
    x0 = math.ceil(max(abs(nstds * sigma_x * math.cos(theta)),
                       abs(nstds * sigma_y * math.sin(theta)), 1))
    y0 = math.ceil(max(abs(nstds * sigma_y * math.cos(theta)),
                       abs(nstds * sigma_x * math.sin(theta)), 1))
    y, x = np.mgrid[-y0:y0 + 1, -x0:x0 + 1]
    rotx = x * math.cos(theta) + y * math.sin(theta)
    roty = -x * math.sin(theta) + y * math.cos(theta)
    g = np.exp(-0.5 * (rotx ** 2 / sigma_x ** 2 + roty ** 2 / sigma_y ** 2))
    g /= 2 * math.pi * sigma_x * sigma_y
    return (g * np.cos(2 * math.pi * frequency * rotx + offset)).astype(np.float32)


def build_gabor_bank(num_filters: int = 180, sigma_x: float = 1.8,
                     sigma_y: float = 2.4, frequency: float = 0.23,
                     offset: float = 0.0):
    """[(F, k, k) filter stack (zero-padded to common odd size), thetas [F]].
    theta_i is mirrored (pi - theta) like the reference's bank
    (calc_orientation_maps.py:37)."""
    thetas = np.linspace(0, math.pi * (num_filters - 1) / num_filters,
                         num_filters)
    kernels = [gabor_kernel_real(frequency, math.pi - t, sigma_x, sigma_y,
                                 offset) for t in thetas]
    size = max(max(k.shape) for k in kernels)
    size += 1 - size % 2
    bank = np.zeros((num_filters, size, size), np.float32)
    for i, k in enumerate(kernels):
        py = (size - k.shape[0]) // 2
        px = (size - k.shape[1]) // 2
        bank[i, py:py + k.shape[0], px:px + k.shape[1]] = k
    return bank, thetas.astype(np.float32)


def _gaussian_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    r = max(int(truncate * sigma + 0.5), 1)
    x = np.arange(-r, r + 1)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _sep_blur(img: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W] with reflect padding (matches
    scipy.ndimage gaussian_filter's default 'reflect' mode used by
    skimage.difference_of_gaussians)."""
    r = win.shape[0] // 2
    k = jnp.asarray(win)
    x = jnp.pad(img, ((r, r), (r, r)), mode="symmetric")
    x = lax.conv_general_dilated(x[None, None], k.reshape(1, 1, -1, 1),
                                 (1, 1), "VALID",
                                 dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = lax.conv_general_dilated(x, k.reshape(1, 1, 1, -1), (1, 1), "VALID",
                                 dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x[0, 0]


def difference_of_gaussians(gray: jnp.ndarray, low_sigma: float,
                            high_sigma: float) -> jnp.ndarray:
    return (_sep_blur(gray, _gaussian_1d(low_sigma))
            - _sep_blur(gray, _gaussian_1d(high_sigma)))


@functools.partial(jax.jit, static_argnames=("num_filters", "band"))
def _orients_from_filtered(filtered: jnp.ndarray, bank: jnp.ndarray,
                           thetas: jnp.ndarray, num_filters: int,
                           band: int = 128):
    """filtered [H, W] -> (orient deg int32 [H, W], variance f32 [H, W])."""
    h, w = filtered.shape
    k = bank.shape[-1]
    pad = k // 2
    padded = jnp.pad(filtered, ((pad, pad), (pad, pad)))

    nbands = -(-h // band)
    padded_h = nbands * band + 2 * pad
    padded = jnp.pad(padded, ((0, padded_h - padded.shape[0]), (0, 0)))

    def one_band(i):
        patch = lax.dynamic_slice(padded, (i * band, 0),
                                  (band + 2 * pad, w + 2 * pad))
        resp = lax.conv_general_dilated(
            patch[None, None], bank[:, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]     # [F, band, w]
        resp = jnp.abs(resp)
        amax = jnp.argmax(resp, axis=0)                        # [band, w]
        rad = amax.astype(jnp.float32) / num_filters * math.pi
        d = jnp.abs(rad[None] - thetas[:, None, None])
        d = jnp.minimum(d, jnp.minimum(jnp.abs(rad[None] - thetas[:, None, None] - math.pi),
                                       jnp.abs(rad[None] - thetas[:, None, None] + math.pi)))
        norm = resp / jnp.maximum(jnp.sum(resp, axis=0, keepdims=True), 1e-12)
        var = jnp.sum(d * d * norm, axis=0)
        return amax.astype(jnp.int32), var

    degs, vars_ = lax.map(one_band, jnp.arange(nbands))
    degs = degs.reshape(-1, w)[:h]
    vars_ = vars_.reshape(-1, w)[:h]
    return degs, vars_


def calc_orientation_map(image_rgb: np.ndarray, dog_low: float = 0.4,
                         dog_high: float = 10.0, num_filters: int = 180):
    """image [H, W, 3] uint8/float -> (deg uint8 [H, W], var f32, filtered).

    deg values are filter indices == integer degrees for num_filters=180
    (the GT loader divides the PNG by 180 to get [0,1] ~ [0,pi))."""
    img = np.asarray(image_rgb, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    gray = 0.2989 * img[..., 0] + 0.5870 * img[..., 1] + 0.1140 * img[..., 2]
    filtered = difference_of_gaussians(jnp.asarray(gray), dog_low, dog_high)
    bank, thetas = build_gabor_bank(num_filters)
    deg, var = _orients_from_filtered(filtered, jnp.asarray(bank),
                                      jnp.asarray(thetas), num_filters)
    return (np.asarray(deg).astype(np.uint8), np.asarray(var),
            np.asarray(filtered))


def main(argv=None):
    import argparse
    import os
    from PIL import Image
    from gaussianhaircut_tpu.utils.image import save_image

    p = argparse.ArgumentParser("calc_orientation_maps")
    p.add_argument("--img_path", required=True)
    p.add_argument("--mask_path", required=True)
    p.add_argument("--orient_dir", required=True)
    p.add_argument("--conf_dir", required=True)
    p.add_argument("--filtered_img_dir", required=True)
    p.add_argument("--vis_img_dir", required=True)
    p.add_argument("--dog_low", default=0.4, type=float)
    p.add_argument("--dog_high", default=10.0, type=float)
    p.add_argument("--num_filters", default=180, type=int)
    args = p.parse_args(argv)

    for d in (args.orient_dir, args.conf_dir, args.filtered_img_dir,
              args.vis_img_dir):
        os.makedirs(d, exist_ok=True)
    from gaussianhaircut_tpu.utils.image import vis_orient
    for name in sorted(os.listdir(args.mask_path)):
        base = name.split(".")[0]
        img = np.asarray(Image.open(os.path.join(args.img_path, name)))
        deg, var, filtered = calc_orientation_map(
            img, args.dog_low, args.dog_high, args.num_filters)
        Image.fromarray(deg).save(f"{args.orient_dir}/{base}.png")
        np.save(f"{args.conf_dir}/{base}.npy", var.astype(np.float16))
        f = (filtered - filtered.min()) / max(filtered.max() - filtered.min(), 1e-9)
        save_image(f, f"{args.filtered_img_dir}/{base}.png")
        mask = np.asarray(Image.open(os.path.join(args.mask_path, name)),
                          np.float32) / 255.0
        if mask.ndim == 3:
            mask = mask[..., 0]
        vis = vis_orient((deg / 180.0)[None], mask[None])
        save_image(vis, f"{args.vis_img_dir}/{base}.png")


if __name__ == "__main__":
    main()
