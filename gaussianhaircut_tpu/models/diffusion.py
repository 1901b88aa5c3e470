"""Latent hair-texture diffusion prior (the k-diffusion ``image_v1`` role).

The reference regularizes strand latents with a pretrained k-diffusion
denoiser over a 32x32x64 latent image (hair_strands_textured.yaml:18-51;
surfaced as L_diff in stage 2 and as the HAAR-style SDS loss in stage 3,
gaussian_model_strands.py:475-515).  This module provides a flax/JAX
equivalent with the same configuration surface:

- UNet: input 64ch 32x32, channel plan (128, 256, 512) at depths (2, 4, 4),
  no self-attention, sigma conditioning through Fourier features -> a 256-d
  mapping MLP -> per-block scale/shift (the image_v1 topology);
- EDM-style preconditioning (sigma_data=0.5): c_skip/c_out/c_in;
- lognormal(-1.2, 1.2) sigma sampling; masked MSE denoising loss
  (``loss_wo_logvar`` semantics — no learned-variance weighting).

Weights train jointly with the texture (or can be loaded from a converted
upstream checkpoint); the role is regularization at lambda ~1e-2.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """hair_strands_textured.yaml:24-49."""
    input_channels: int = 64
    input_size: int = 32
    mapping_out: int = 256
    depths: Sequence[int] = (2, 4, 4)
    channels: Sequence[int] = (128, 256, 512)
    sigma_data: float = 0.5
    sigma_min: float = 0.02
    sigma_max: float = 40.0
    density_mean: float = -1.2
    density_std: float = 1.2


class FourierFeatures(nn.Module):
    features: int = 16

    @nn.compact
    def __call__(self, x):
        w = self.param("w", nn.initializers.normal(1.0), (self.features // 2,))
        ang = 2 * math.pi * x[..., None] * w
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class ResConvBlock(nn.Module):
    c_out: int

    @nn.compact
    def __call__(self, x, cond):
        # cond [N, mapping] -> per-channel scale/shift (AdaGN-style)
        h = nn.GroupNorm(num_groups=32 if x.shape[-1] % 32 == 0 else 1)(x)
        ss = nn.Dense(2 * self.c_out)(nn.silu(cond))
        h = nn.silu(h)
        h = nn.Conv(self.c_out, (3, 3))(h)
        scale, shift = jnp.split(ss[:, None, None, :], 2, axis=-1)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Conv(self.c_out, (3, 3))(h)
        skip = x if x.shape[-1] == self.c_out else nn.Conv(self.c_out, (1, 1))(x)
        return (h + skip) / math.sqrt(2.0)


class UNetV1(nn.Module):
    cfg: DiffusionConfig

    @nn.compact
    def __call__(self, x, sigma):
        # x [N, H, W, C]; sigma [N]
        c_noise = jnp.log(sigma) / 4.0
        mapping = nn.Dense(self.cfg.mapping_out)(FourierFeatures()(c_noise))
        mapping = nn.Dense(self.cfg.mapping_out)(nn.silu(mapping))

        skips = []
        h = x
        for level, (depth, ch) in enumerate(zip(self.cfg.depths, self.cfg.channels)):
            if level > 0:
                h = nn.avg_pool(h, (2, 2), (2, 2))
            for _ in range(depth):
                h = ResConvBlock(ch)(h, mapping)
            skips.append(h)
        for level in reversed(range(len(self.cfg.depths))):
            ch = self.cfg.channels[level]
            if level < len(self.cfg.depths) - 1:
                n, hh, ww, cc = skips[level].shape
                h = jax.image.resize(h, (n, hh, ww, h.shape[-1]), "nearest")
                h = jnp.concatenate([h, skips[level]], axis=-1)
            for _ in range(self.cfg.depths[level]):
                h = ResConvBlock(ch)(h, mapping)
        return nn.Conv(self.cfg.input_channels, (3, 3),
                       kernel_init=nn.initializers.zeros)(h)


class Denoiser:
    """EDM preconditioning wrapper around UNetV1."""

    def __init__(self, cfg: DiffusionConfig = DiffusionConfig()):
        self.cfg = cfg
        self.net = UNetV1(cfg)

    def init(self, key):
        x = jnp.zeros((1, self.cfg.input_size, self.cfg.input_size,
                       self.cfg.input_channels))
        return self.net.init(key, x, jnp.ones((1,)))

    def denoise(self, params, x_noisy, sigma):
        sd2 = self.cfg.sigma_data ** 2
        s2 = sigma[:, None, None, None] ** 2
        c_skip = sd2 / (s2 + sd2)
        c_out = sigma[:, None, None, None] * self.cfg.sigma_data / jnp.sqrt(s2 + sd2)
        c_in = 1.0 / jnp.sqrt(s2 + sd2)
        f = self.net.apply(params, c_in * x_noisy, sigma)
        return c_skip * x_noisy + c_out * f

    def loss(self, params, x0, noise, sigma, mask=None):
        """Masked denoising loss with EDM weighting (the loss_wo_logvar
        analog).  x0 [N, H, W, C]."""
        sd2 = self.cfg.sigma_data ** 2
        s2 = sigma ** 2
        weight = ((s2 + sd2) / (sigma * self.cfg.sigma_data) ** 2)[:, None, None, None]
        x_noisy = x0 + noise * sigma[:, None, None, None]
        denoised = self.denoise(params, x_noisy, sigma)
        err = (denoised - x0) ** 2 * weight
        if mask is not None:
            err = err * mask
            return jnp.sum(err) / jnp.maximum(jnp.sum(mask) * x0.shape[-1], 1.0)
        return jnp.mean(err)

    def sample_density(self, key, shape):
        """lognormal(mean=-1.2, std=1.2) sigma sampling
        (hair_strands_textured.yaml:45-49)."""
        z = jax.random.normal(key, shape)
        sig = jnp.exp(self.cfg.density_mean + self.cfg.density_std * z)
        return jnp.clip(sig, self.cfg.sigma_min, self.cfg.sigma_max)


def sds_latent_image(z_gdn: jnp.ndarray, uvs_gdn: jnp.ndarray,
                     v_gdn_local: jnp.ndarray, grid_size: int,
                     k: int = 4) -> jnp.ndarray:
    """HAAR-style latent-texture resampling from guiding strands
    (gaussian_model_strands.py:475-503): K-NN interpolation of guiding-strand
    latents onto a grid in UV space, blended between nearest and bilinear by
    the neighbors' direction cosine-similarity alpha (eq. 4 of HAAR).

    z_gdn [G, 64]; uvs_gdn [G, 2] in [-1, 1]; v_gdn_local [G, L-1, 3].
    Returns [grid, grid, 64].
    """
    g = jnp.linspace(-1.0, 1.0, grid_size + 1)
    g = (g[1:] + g[:-1]) / 2
    uu, vv = jnp.meshgrid(g, g, indexing="xy")
    uv_grid = jnp.stack([uu, vv], -1).reshape(-1, 2)

    d2 = jnp.sum((uv_grid[:, None] - uvs_gdn[None]) ** 2, -1)    # [Q, G]
    neg_d, idx = jax.lax.top_k(-d2, k)
    knn_d = -neg_d
    w = 1.0 / (knn_d + 1e-7)
    w = w / jnp.sum(w, -1, keepdims=True)

    z_near = z_gdn[idx[:, 0]]
    z_bil = jnp.sum(z_gdn[idx] * w[:, :, None], axis=1)

    # per-guiding-strand smoothness alpha: pairwise direction cosine
    # similarity among each guiding strand's own K nearest guiding strands
    # (HAAR eq. 4 blending between nearest and bilinear interpolation)
    dg2 = jnp.sum((uvs_gdn[:, None] - uvs_gdn[None]) ** 2, -1)
    _, gidx = jax.lax.top_k(-dg2, k)                              # [G, K]
    vn = v_gdn_local / jnp.sqrt(jnp.maximum(
        jnp.sum(v_gdn_local ** 2, -1, keepdims=True), 1e-24))
    knn_v = vn[gidx]                                              # [G, K, S, 3]
    csim = jnp.einsum("gksd,glsd->gkls", knn_v, knn_v).mean(-1)   # [G, K, K]
    iu, ju = jnp.triu_indices(k)
    csim = csim[:, iu, ju].mean(-1)                               # [G]
    alpha = jnp.where(csim <= 0.9, 1 - 1.63 * csim ** 5, 0.4 - 0.4 * csim)

    alpha_q = jnp.sum(alpha[idx] * w, axis=1)[:, None]            # [Q, 1]
    z = z_near * alpha_q + z_bil * (1 - alpha_q)
    return z.reshape(grid_size, grid_size, -1)
