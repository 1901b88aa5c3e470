"""Chunk-scan compositing backend in pure jnp (differentiable via autodiff).

Runs the exact same algorithm as the Pallas kernels — a `lax.scan` over the
chunk-aligned instance stream, carrying per-pixel (accumulator, transmittance,
done-latch) and resetting at each tile's first chunk — so it serves both as
the CPU execution path and as the mid-level test reference for the kernels.

Gradient semantics match the CUDA backward (see reference.py docstring):
straight-through alpha clamp, hard masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import common as C


def _chunk_update(acc, pay, tile, k_in_tile, width, height, cfg):
    """One chunk of instances composited into the running tile accumulator.

    acc [PIX, 16]; pay [24, CH] (rows 0..7 feat, rows 8..23 transposed
    colors).  Returns updated acc.
    """
    feat = pay[:8]
    col = pay[8:24].T
    sg = jax.lax.stop_gradient
    pix = cfg.tile_pix
    gx_grid, gy_grid = cfg.grid(width, height)

    init = jnp.zeros((pix, C.PAD_CHANNELS), acc.dtype).at[:, C.CH_TRANS].set(1.0)
    acc = jnp.where(k_in_tile == 0, init, acc)

    tx = tile % gx_grid
    # % gy_grid: camera-local row in the batched-camera virtual grid (tile
    # ids of camera b are offset by b * gx * gy; coordinates are per-camera)
    ty = (tile // gx_grid) % gy_grid
    i = jnp.arange(pix)
    px = (tx * cfg.tile_w + i % cfg.tile_w).astype(jnp.float32)
    py = (ty * cfg.tile_h + i // cfg.tile_w).astype(jnp.float32)

    gxv, gyv = feat[C.F_GX], feat[C.F_GY]
    a, b, cc = feat[C.F_CA], feat[C.F_CB], feat[C.F_CC]
    op, vld = feat[C.F_OP], feat[C.F_VALID]

    dx = gxv[None, :] - px[:, None]
    dy = gyv[None, :] - py[:, None]
    power = -0.5 * (a[None, :] * dx * dx + cc[None, :] * dy * dy) - b[None, :] * dx * dy
    raw = op[None, :] * jnp.exp(power)
    alpha_val = jnp.minimum(C.ALPHA_CLAMP, raw)
    alpha = raw + sg(alpha_val - raw)
    cand = sg((power <= 0.0) & (alpha_val >= C.ALPHA_MIN) & (vld[None, :] > 0.5))
    alpha = jnp.where(cand, alpha, 0.0)
    one_m = 1.0 - alpha

    t_in = acc[:, C.CH_TRANS:C.CH_TRANS + 1]
    done_in = acc[:, C.CH_DONE:C.CH_DONE + 1]

    t_incl = jnp.cumprod(one_m, axis=1)
    t_excl = jnp.concatenate([jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1)
    t_before = t_in * t_excl
    test = t_in * t_incl
    fail = sg(cand & (test < C.T_EPS))
    contrib = sg(cand & (jnp.cumsum(fail, axis=1) == 0) & (done_in < 0.5))
    w = jnp.where(contrib, alpha * t_before, 0.0)

    d_color = w @ col                                   # [PIX, 16]
    t_new = t_in * jnp.prod(jnp.where(contrib, one_m, 1.0), axis=1, keepdims=True)
    done_new = jnp.maximum(done_in, jnp.any(fail, axis=1, keepdims=True).astype(acc.dtype))

    acc = acc + d_color
    acc = acc.at[:, C.CH_DONE].set(done_new[:, 0])
    acc = acc.at[:, C.CH_TRANS].set(t_new[:, 0])
    return acc


def raster_core_jnp(binned: C.Binned, width: int, height: int,
                    cfg: C.RasterConfig) -> jnp.ndarray:
    """Composite the binned instance stream -> tile_buf [T, PIX, 16]."""
    pix = cfg.tile_pix

    def body(acc, xs):
        pay, tile, k = xs
        acc = _chunk_update(acc, pay, tile, k, width, height, cfg)
        return acc, acc

    init = jnp.zeros((pix, C.PAD_CHANNELS), jnp.float32).at[:, C.CH_TRANS].set(1.0)
    _, accs = jax.lax.scan(
        jax.checkpoint(body),
        init, (binned.payload, binned.tile_of_chunk, binned.chunk_in_tile))

    # Pick, per tile, the accumulator after its last chunk.
    tc = binned.tile_of_chunk.shape[0]
    last_chunk = jax.ops.segment_max(
        jnp.arange(tc, dtype=jnp.int32), binned.tile_of_chunk,
        num_segments=binned.num_tiles, indices_are_sorted=True)
    return accs[last_chunk]
