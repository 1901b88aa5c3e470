"""LPIPS perceptual distance in JAX (reference: src/lpipsPyTorch/, 183 LoC).

Architecture: VGG16 conv features (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3), unit-normalized per channel, squared differences projected by the
LPIPS linear heads and spatially averaged — identical topology to the
reference's self-contained lpipsPyTorch module.

Weights: this environment has no network egress and no torchvision cache, so
pretrained VGG + LPIPS-head weights must be supplied as an .npz (see
``convert_torch_weights`` for the expected keys, producible on any machine
with torchvision + the official LPIPS release).  Without a weights file,
``lpips`` raises; ``lpips_or_none`` returns None so metrics pipelines can
degrade gracefully (the reference CLI would simply crash without its
downloads).
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers) per block; LPIPS taps the last relu
# of each block.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_WEIGHTS = os.environ.get(
    "GHT_LPIPS_WEIGHTS",
    os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                 "lpips_vgg.npz"))


def convert_torch_weights(out_path: str) -> None:  # pragma: no cover
    """Offline helper (needs torchvision + lpips downloads): dump VGG16
    features and LPIPS 'vgg' linear heads to npz with keys
    conv{i}_w [kh,kw,cin,cout], conv{i}_b, lin{k}_w [c]."""
    import torch
    import torchvision
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    blob = {}
    i = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            blob[f"conv{i}_w"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
            blob[f"conv{i}_b"] = m.bias.detach().numpy()
            i += 1
    import lpips as lpips_pkg
    heads = lpips_pkg.LPIPS(net="vgg")
    for k, lin in enumerate(heads.lins):
        blob[f"lin{k}_w"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **blob)


class LPIPS:
    def __init__(self, weights_path: str | None = None):
        path = weights_path or _DEFAULT_WEIGHTS
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}; generate with "
                "gaussianhaircut_tpu.ops.lpips.convert_torch_weights on a "
                "machine with torchvision, or set GHT_LPIPS_WEIGHTS.")
        d = dict(np.load(path))
        self.conv_w = []
        self.conv_b = []
        i = 0
        while f"conv{i}_w" in d:
            self.conv_w.append(jnp.asarray(d[f"conv{i}_w"]))
            self.conv_b.append(jnp.asarray(d[f"conv{i}_b"]))
            i += 1
        self.lin_w = [jnp.asarray(d[f"lin{k}_w"]) for k in range(len(_VGG_BLOCKS))]
        self._fn = jax.jit(self._distance)

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x [N, 3, H, W] in [0, 1] -> per-block relu features."""
        x = 2.0 * x - 1.0
        x = (x - jnp.asarray(_SHIFT)[:, None, None]) / jnp.asarray(_SCALE)[:, None, None]
        feats = []
        ci = 0
        for bi, (cout, layers) in enumerate(_VGG_BLOCKS):
            for _ in range(layers):
                w, b = self.conv_w[ci], self.conv_b[ci]
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"))
                x = x + b[None, :, None, None]
                x = jax.nn.relu(x)
                ci += 1
            feats.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
        return feats

    def _distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.maximum(
                jnp.sum(xa * xa, axis=1, keepdims=True), 1e-10))
            nb = xb / jnp.sqrt(jnp.maximum(
                jnp.sum(xb * xb, axis=1, keepdims=True), 1e-10))
            d = (na - nb) ** 2
            w = self.lin_w[k][None, :, None, None]
            total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
        return total

    def __call__(self, a, b):
        """a, b: [3, H, W] or [N, 3, H, W] in [0, 1] -> scalar / [N]."""
        if a.ndim == 3:
            return self._fn(a[None], b[None])[0]
        return self._fn(a, b)


_cached: dict = {}


def lpips_or_none(weights_path: str | None = None):
    key = weights_path or _DEFAULT_WEIGHTS
    if key not in _cached:
        try:
            _cached[key] = LPIPS(weights_path)
        except FileNotFoundError:
            _cached[key] = None
    return _cached[key]
