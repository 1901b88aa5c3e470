"""LPIPS perceptual distance in JAX (reference: src/lpipsPyTorch/, 183 LoC).

Architecture: VGG16 conv features (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3 — torchvision `features` indices [4, 9, 16, 23, 30]), unit-normalized
per channel, squared differences projected by the LPIPS linear heads and
spatially averaged — identical topology to the reference's self-contained
lpipsPyTorch module.

Two load-bearing quirks of the reference, reproduced exactly (verified by a
torch cross-check in tests/test_lpips.py):
- inputs are fed to the z_score scaling layer in **[0, 1]** — the reference's
  metrics.py passes `tf.to_tensor` output straight in and lpipsPyTorch's
  BaseNet.z_score has no [-1, 1] rescale (src/lpipsPyTorch/modules/
  networks.py:49-51, metrics.py:31-74), unlike the original richzhang
  release;
- channel normalization is x / (||x|| + 1e-10), eps OUTSIDE the sqrt
  (modules/utils.py:6-8).

Weights: this environment has no network egress and no torchvision cache, so
pretrained VGG + LPIPS-head weights must be supplied as an .npz (see
``convert_torch_weights`` for the expected keys, producible on any machine
with torchvision + the official LPIPS release).  Without a weights file,
``lpips_or_none(allow_untrained=True)`` falls back to a deterministic
He-initialized backbone (``synthesize_weights``) — random-feature perceptual
distances are a documented, weaker stand-in (they still order distortions
far better than L2; Zhang et al. 2018 §5 report nontrivial scores for
untrained nets) and every consumer labels the result with ``.kind`` so an
untrained number can never masquerade as the calibrated metric.
"""
from __future__ import annotations

import math
import os

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
    blob["kind"] = np.asarray("pretrained")
    np.savez(out_path, **blob)


def synthesize_weights(seed: int = 0) -> dict:
    """Deterministic He-initialized VGG16 + uniform lin heads — the documented
    untrained fallback for egress-less environments.  NOT the calibrated
    LPIPS; consumers must surface kind='untrained-seeded'."""
    rng = np.random.default_rng(seed)
    blob = {}
    cin = 3
    i = 0
    for cout, layers in _VGG_BLOCKS:
        for _ in range(layers):
            fan_in = 3 * 3 * cin
            blob[f"conv{i}_w"] = rng.normal(
                0.0, math.sqrt(2.0 / fan_in),
                size=(3, 3, cin, cout)).astype(np.float32)
            blob[f"conv{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
            i += 1
    for k, (cout, _) in enumerate(_VGG_BLOCKS):
        blob[f"lin{k}_w"] = rng.uniform(0, 2.0 / cout, cout).astype(np.float32)
    blob["kind"] = np.asarray("untrained-seeded")
    return blob


class LPIPS:
    def __init__(self, weights_path: str | None = None,
                 weights: dict | None = None):
        if weights is None:
            path = weights_path or _DEFAULT_WEIGHTS
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"LPIPS weights not found at {path}; generate with "
                    "gaussianhaircut_tpu.ops.lpips.convert_torch_weights on a "
                    "machine with torchvision, or set GHT_LPIPS_WEIGHTS.")
            weights = dict(np.load(path))
        d = weights
        self.kind = str(d.get("kind", "pretrained"))
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
        """x [N, 3, H, W] in [0, 1] -> per-block unit-normalized relu features.

        NOTE: no [-1, 1] rescale — the reference feeds [0, 1] tensors straight
        to z_score (see module docstring)."""
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
            # normalize_activation (modules/utils.py:6-8): eps outside sqrt
            norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
            feats.append(x / (norm + 1e-10))
            if bi < len(_VGG_BLOCKS) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
        return feats

    def _distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for k, (na, nb) in enumerate(zip(fa, fb)):
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


def lpips_or_none(weights_path: str | None = None,
                  allow_untrained: bool = False):
    """Load LPIPS from ``weights_path`` (or the default location).

    Missing weights: returns None, or — with ``allow_untrained=True`` — a
    working metric on the deterministic untrained backbone (check ``.kind``
    before reporting; consumers must label untrained numbers)."""
    key = (weights_path or _DEFAULT_WEIGHTS, allow_untrained)
    if key not in _cached:
        try:
            _cached[key] = LPIPS(weights_path)
        except FileNotFoundError:
            if allow_untrained:
                _cached[key] = LPIPS(weights=synthesize_weights())
            else:
                _cached[key] = None
    return _cached[key]
