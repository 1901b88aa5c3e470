"""Image helpers: PNG save, orientation visualization (image_utils.py:22-42)."""
from __future__ import annotations

import os

import numpy as np
from PIL import Image


def save_image(arr, path: str) -> None:
    """[C, H, W] or [H, W] float in [0,1] -> 8-bit PNG."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray((np.clip(arr, 0, 1) * 255).round().astype(np.uint8)).save(path)


def vis_orient(orient_angle, mask):
    """Orientation color wheel (red=vertical, green=horizontal,
    magenta/teal=diagonals), angles in [0,1] ~ [0, pi)."""
    deg = np.asarray(orient_angle) * 180.0
    red = np.clip(1 - np.abs(deg - 0.0) / 45.0, 0, 1) + np.clip(1 - np.abs(deg - 180.0) / 45.0, 0, 1)
    green = np.clip(1 - np.abs(deg - 90.0) / 45.0, 0, 1)
    magenta = np.clip(1 - np.abs(deg - 45.0) / 45.0, 0, 1)
    teal = np.clip(1 - np.abs(deg - 135.0) / 45.0, 0, 1)
    r = red + magenta
    g = green + teal
    b = magenta + teal
    rgb = np.concatenate([r, g, b], axis=0)
    return np.clip(rgb, 0, 1) * np.asarray(mask)


def vis_depth(depth):
    d = np.log(np.asarray(depth) + 1)
    return (d - d.min()) / max(d.max() - d.min(), 1e-9)
