"""No-reference image-quality scorers for frame selection.

The reference scores frames with hyperIQA, an external pretrained network
cloned at install time (src/preprocessing/preprocess_raw_images.py:70-122).
Scorer tiers here, best available wins (`default_scorer`):

1. ``cnn_scorer(weights_path)`` — a small stand-alone convnet DISTILLED from
   hyperIQA (tools/convert_hyperiqa.py runs on a machine with the upstream
   clone; same distillation route as the strand-prior converter).  Loads an
   npz; absent in this container.
2. ``mscn_iqa`` — classical natural-scene-statistics score: sharp,
   well-exposed, low-noise frames have MSCN (mean-subtracted
   contrast-normalized) coefficients with high dispersion and heavy tails
   (Ruderman 1994; the BRISQUE/NIQE feature family) — strictly more robust
   than variance-of-Laplacian (which rewards noise).
3. ``sharpness_iqa`` (frames.py) — the round-2 proxy, kept for determinism
   of older pipelines.

All scorers share the interface ``score = f(img_rgb_uint8) -> float``
(higher = better).
"""
from __future__ import annotations

import os

import numpy as np

_GAUSS7 = None


def _gauss7():
    global _GAUSS7
    if _GAUSS7 is None:
        x = np.arange(7) - 3
        g = np.exp(-(x ** 2) / (2 * (7.0 / 6.0) ** 2))
        _GAUSS7 = (g / g.sum()).astype(np.float32)
    return _GAUSS7


def _sep_blur(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'same' blur with edge replication (cheap, numpy-only)."""
    pad = len(k) // 2
    xp = np.pad(x, ((pad, pad), (0, 0)), mode="edge")
    x = sum(k[i] * xp[i:i + x.shape[0]] for i in range(len(k)))
    xp = np.pad(x, ((0, 0), (pad, pad)), mode="edge")
    return sum(k[i] * xp[:, i:i + x.shape[1]] for i in range(len(k)))


def mscn_iqa(img_rgb: np.ndarray) -> float:
    """Natural-scene-statistics quality score (higher is better).

    Local contrast (the MSCN sigma field's mean — blur collapses it) minus a
    robust noise estimate (Donoho MAD of the Laplacian, which sensor noise
    inflates and real structure barely moves), scaled by exposure spread.
    Fixes variance-of-Laplacian's failure mode of REWARDING noise."""
    img = np.asarray(img_rgb)
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float32)
    if min(gray.shape) < 16:
        return 0.0
    k = _gauss7()
    mu = _sep_blur(gray, k)
    sigma = np.sqrt(np.maximum(_sep_blur(gray * gray, k) - mu * mu, 0.0))
    contrast = float(sigma.mean())

    lap = (gray[1:-1, 1:-1] * 4 - gray[:-2, 1:-1] - gray[2:, 1:-1]
           - gray[1:-1, :-2] - gray[1:-1, 2:])
    noise = float(np.median(np.abs(lap)) / 0.6745)

    spread = float(np.percentile(gray, 95) - np.percentile(gray, 5)) / 255.0
    return max(contrast - 0.2 * noise, 0.0) * (spread + 1e-3)


class CnnScorer:
    """Distilled-hyperIQA convnet: 4 conv(3x3, stride2) + GAP + linear,
    weights from tools/convert_hyperiqa.py (npz keys conv{i}_w [3,3,ci,co],
    conv{i}_b, head_w [c], head_b)."""

    def __init__(self, weights_path: str):
        import jax
        import jax.numpy as jnp

        d = dict(np.load(weights_path))
        self.params = {k: jnp.asarray(v) for k, v in d.items() if k != "kind"}
        self.kind = str(d.get("kind", "distilled-hyperiqa"))
        n_conv = len([k for k in d if k.endswith("_w") and k.startswith("conv")])

        def forward(params, x):
            for i in range(n_conv):
                x = jax.lax.conv_general_dilated(
                    x, params[f"conv{i}_w"], (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x + params[f"conv{i}_b"])
            feat = jnp.mean(x, axis=(1, 2))
            return feat @ params["head_w"] + params["head_b"]

        self._fn = jax.jit(forward)

    def __call__(self, img_rgb: np.ndarray) -> float:
        import cv2
        x = cv2.resize(np.asarray(img_rgb), (224, 224)).astype(np.float32) / 255.0
        return float(self._fn(self.params, x[None])[0])


_DEFAULT_CNN = os.environ.get(
    "GHT_IQA_WEIGHTS",
    os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                 "hyperiqa_distilled.npz"))


def default_scorer():
    """Best available scorer: distilled-CNN npz if present, else MSCN."""
    if os.path.exists(_DEFAULT_CNN):
        return CnnScorer(_DEFAULT_CNN)
    return mscn_iqa
