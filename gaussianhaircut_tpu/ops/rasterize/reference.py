"""Naive full-evaluation oracle renderer (pure jnp, differentiable).

Implements exactly the compositing semantics of the CUDA render kernel
(forward.cu:287-400) for every pixel against every Gaussian, with the same
tile-inclusion rule the binning induces (a Gaussian touches a pixel iff its
tile rect covers the pixel's tile).  O(P * H * W) — this is the correctness
oracle and CPU-toy fallback, not a production path.

Gradient semantics deliberately mirror the CUDA backward (backward.cu:402-561):
- the 0.99 alpha clamp is *ignored* in the backward (bug-compatible with
  vanilla 3DGS) — implemented here as a straight-through estimator;
- skip/termination masks are hard (stop-gradient) decisions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import common as C


def _composite_block(pix_xy, tile_xy, order, mean_pix, conic, opacity, rect,
                     colors_pad, valid, bg):
    """Composite one block of pixels against all Gaussians (sorted order).

    pix_xy [B, 2] float pixel centers; tile_xy [B, 2] int tile coords.
    Returns ([B, PAD_CHANNELS] blended color, [B] final transmittance).
    """
    sg = jax.lax.stop_gradient
    mp = mean_pix[order]
    con = conic[order]
    op = opacity[order, 0]
    rmin_x, rmin_y, rmax_x, rmax_y = (r[order] for r in rect)
    cols = colors_pad[order]
    val = valid[order]

    d = mp[None, :, :] - pix_xy[:, None, :]                    # [B, P, 2]
    dx, dy = d[..., 0], d[..., 1]
    power = (-0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy)
             - con[None, :, 1] * dx * dy)
    raw = op[None, :] * jnp.exp(power)
    alpha_val = jnp.minimum(C.ALPHA_CLAMP, raw)
    # straight-through: value clamped, gradient of the unclamped product
    alpha = raw + sg(alpha_val - raw)

    inc = ((tile_xy[:, None, 0] >= rmin_x[None, :]) & (tile_xy[:, None, 0] < rmax_x[None, :])
           & (tile_xy[:, None, 1] >= rmin_y[None, :]) & (tile_xy[:, None, 1] < rmax_y[None, :]))
    cand = sg((power <= 0.0) & (alpha_val >= C.ALPHA_MIN) & val[None, :] & inc)
    alpha = jnp.where(cand, alpha, 0.0)

    one_m = 1.0 - alpha
    t_incl = jnp.cumprod(one_m, axis=1)
    t_before = jnp.concatenate([jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1)
    test = t_before * one_m
    fail = sg(cand & (test < C.T_EPS))
    contributes = sg(cand & (jnp.cumsum(fail, axis=1) == 0))
    w = jnp.where(contributes, alpha * t_before, 0.0)

    color = w @ cols                                           # [B, 16]
    t_final = jnp.prod(jnp.where(contributes, one_m, 1.0), axis=1)
    out = color + t_final[:, None] * bg[None, :]
    return out, t_final


def rasterize_reference(mean_pix, conic, colors, opacity, depth, valid, bg,
                        width: int, height: int, cfg: C.RasterConfig,
                        block: int = 1024):
    """Oracle rasterization.  colors [P, 10]; bg [10].  Returns
    (image [10, H, W], final_T [H, W])."""
    sg = jax.lax.stop_gradient
    pre = C.preprocess(sg(mean_pix), sg(conic), sg(depth), valid, width, height, cfg)

    inst_depth = jnp.where(pre.valid, depth, jnp.inf)
    order = jnp.argsort(sg(inst_depth), stable=True)

    colors_pad = jnp.pad(colors, ((0, 0), (0, C.PAD_CHANNELS - colors.shape[1])))
    bg_pad = jnp.pad(bg, (0, C.PAD_CHANNELS - bg.shape[0]))

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix_xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)
    tile_xy = jnp.stack([xs // cfg.tile_w, ys // cfg.tile_h], axis=-1).reshape(-1, 2)

    npix = pix_xy.shape[0]
    pad = (-npix) % block
    pix_xy = jnp.pad(pix_xy, ((0, pad), (0, 0)))
    tile_xy = jnp.pad(tile_xy, ((0, pad), (0, 0)), constant_values=-1)

    def body(args):
        pxy, txy = args
        return _composite_block(pxy, txy, order, mean_pix, conic, opacity,
                                pre.rect, colors_pad, pre.valid, bg_pad)

    blocks = (pix_xy.reshape(-1, block, 2), tile_xy.reshape(-1, block, 2))
    out, t_final = jax.lax.map(jax.checkpoint(body), blocks)
    out = out.reshape(-1, C.PAD_CHANNELS)[:npix, :C.NUM_CHANNELS]
    t_final = t_final.reshape(-1)[:npix]
    image = out.reshape(height, width, C.NUM_CHANNELS).transpose(2, 0, 1)
    return image, t_final.reshape(height, width)
