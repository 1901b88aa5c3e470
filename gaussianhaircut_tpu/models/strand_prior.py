"""Strand prior networks: latent <-> strand geometry, and the appearance
decoder.

Role-equivalent rebuild of the NeuralHaircut ``strand_prior`` module the
reference clones at install time (install.sh:28; call surface documented in
SURVEY.md §2.2): a pretrained strand VAE whose

- ``Decoder`` maps a 64-d geometry latent to L-1 = 99 local segment vectors
  (usage: gaussian_model_strands.py:462-473 — decoded dirs are divided by a
  ``scale_decoder`` normalization constant), and doubles as a generic MLP head
  for appearance (``Decoder(None, dim_hidden=128, num_layers=2,
  dim_out=3*(deg+1)^2+1)``, gaussian_model_latent_strands.py:79);
- ``Encoder`` maps local strand points to a latent whose first 64 dims are the
  geometry code (gaussian_model_strands.py:463).

Since the upstream checkpoint is external, the architecture here is a
TPU-friendly re-derivation (positional-feature MLP decoder; all compute is
batched matmuls), trainable from scratch; upstream-trained weights can be
converted and loaded into the same parameter pytrees.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

STRAND_LENGTH = 100           # points per strand (export_curves.py:23)
GEOMETRY_DIM = 64             # hair_strands_textured.yaml:13


class MLP(nn.Module):
    features: Sequence[int]
    activation: callable = nn.silu

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
        return x


class StrandDecoder(nn.Module):
    """z [.., 64] -> segment vectors [.., L-1, 3] in the canonical local frame.

    Decodes per-segment displacements from (latent, Fourier features of arc
    position) so every segment is an independent matmul row — one big
    [N*(L-1), D] MLP on the MXU.
    """
    length: int = STRAND_LENGTH
    hidden: int = 256
    num_freqs: int = 6

    @nn.compact
    def __call__(self, z):
        n_seg = self.length - 1
        t = jnp.linspace(0.0, 1.0, n_seg)
        freqs = 2.0 ** jnp.arange(self.num_freqs)
        ang = t[:, None] * freqs[None, :] * jnp.pi
        pos = jnp.concatenate([jnp.sin(ang), jnp.cos(ang), t[:, None]], -1)  # [S, 13]

        h = nn.Dense(self.hidden)(z)                     # [.., H]
        h = nn.silu(h)
        h = h[..., None, :] + nn.Dense(self.hidden)(pos)  # broadcast [.., S, H]
        h = nn.silu(nn.Dense(self.hidden)(h))
        h = nn.silu(nn.Dense(self.hidden)(h))
        v = nn.Dense(3, kernel_init=nn.initializers.normal(1e-2))(h)
        return v                                          # [.., S, 3]


class StrandEncoder(nn.Module):
    """Local strand points [.., L, 3] -> latent [.., 2*GEOMETRY_DIM]
    (first 64 dims are the geometry code, mirroring the upstream usage
    ``encoder(pts)[:, :64]``)."""
    hidden: int = 256
    out_dim: int = 2 * GEOMETRY_DIM

    @nn.compact
    def __call__(self, pts):
        x = pts.reshape(pts.shape[:-2] + (-1,))
        x = nn.silu(nn.Dense(self.hidden)(x))
        x = nn.silu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out_dim)(x)


class ColorDecoder(nn.Module):
    """Appearance latent [.., 64] -> SH coefficients + orientation confidence
    (the ``Decoder(dim_hidden=128, num_layers=2, dim_out=3*(deg+1)^2+1)`` of
    gaussian_model_latent_strands.py:79)."""
    sh_degree: int = 3
    hidden: int = 128

    @nn.compact
    def __call__(self, z_app):
        out_dim = 3 * (self.sh_degree + 1) ** 2 + 1
        x = nn.relu(nn.Dense(self.hidden)(z_app))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(out_dim)(x)


def points_from_segments(origins: jnp.ndarray, segments: jnp.ndarray) -> jnp.ndarray:
    """origins [N, 1, 3] + cumsum of segment vectors [N, L-1, 3] -> [N, L, 3]
    (gaussian_model_strands.py:436)."""
    zero = jnp.zeros_like(origins)
    return origins + jnp.concatenate(
        [zero, jnp.cumsum(segments, axis=1)], axis=1)
