"""Public differentiable rasterization API.

``rasterize`` is the TPU-native replacement for the reference's
``GaussianRasterizer`` (ext/diff_gaussian_rasterization/__init__.py:46-237):
it takes precomputed NDC means, conics, 10-channel colors, opacities and
depths (the same differentiable surface the reference exposes — see
SURVEY.md §7.1), and returns the composited 10-channel image plus auxiliary
visibility data.

Differentiation:
- geometry bookkeeping (culling, tile rects, sort, chunk layout) is
  stop-gradiented;
- the gathers building instance buffers are differentiable, so their autodiff
  transpose performs the deterministic scatter-add of per-instance gradients
  back to Gaussians (replacing the CUDA backward's atomics);
- the compositing core is either the Pallas kernel pair under `jax.custom_vjp`
  (TPU) or the chunk-scan jnp implementation under plain autodiff (CPU).
- the NDC->pixel conversion happens inside this function, so the cotangent
  w.r.t. `ndc` matches the reference's dL_dmean2D * (0.5 W, 0.5 H) routing
  (backward.cu:462-465 -> ext __init__.py:155-166).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize import jnp_core, pallas_core
from gaussianhaircut_tpu.ops.rasterize.common import RasterConfig  # noqa: F401


def _float0_zeros(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _core_pallas(feat, colors, tile_of_chunk, chunk_in_tile, gid, num_rendered,
                 num_tiles, width, height, cfg):
    binned = C.Binned(feat, colors, tile_of_chunk, chunk_in_tile, gid,
                      num_rendered, num_tiles)
    return pallas_core.raster_core_pallas_fwd(
        binned, width, height, cfg, interpret=_interpret())


def _core_pallas_fwd(feat, colors, tile_of_chunk, chunk_in_tile, gid,
                     num_rendered, num_tiles, width, height, cfg):
    binned = C.Binned(feat, colors, tile_of_chunk, chunk_in_tile, gid,
                      num_rendered, num_tiles)
    tile_buf = pallas_core.raster_core_pallas_fwd(
        binned, width, height, cfg, interpret=_interpret())
    return tile_buf, (feat, colors, tile_of_chunk, chunk_in_tile, gid,
                      num_rendered, tile_buf)


def _core_pallas_bwd(num_tiles, width, height, cfg, res, gbuf):
    feat, colors, tile_of_chunk, chunk_in_tile, gid, num_rendered, tile_buf = res
    binned = C.Binned(feat, colors, tile_of_chunk, chunk_in_tile, gid,
                      num_rendered, num_tiles)
    dfeat, dcol = pallas_core.raster_core_pallas_bwd(
        binned, tile_buf, gbuf, width, height, cfg, interpret=_interpret())
    return (dfeat, dcol, _float0_zeros(tile_of_chunk),
            _float0_zeros(chunk_in_tile), _float0_zeros(gid),
            _float0_zeros(num_rendered))


_core_pallas.defvjp(_core_pallas_fwd, _core_pallas_bwd)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _resolve_backend(cfg: C.RasterConfig) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def rasterize(ndc: jnp.ndarray, conic: jnp.ndarray, colors: jnp.ndarray,
              opacity: jnp.ndarray, depth: jnp.ndarray, valid: jnp.ndarray,
              bg: jnp.ndarray, width: int, height: int,
              cfg: C.RasterConfig | None = None) -> dict[str, Any]:
    """Differentiable 10-channel Gaussian splatting.

    Args:
      ndc: [P, 3] NDC-projected means (only xy used; the reference's
        means2D gradient port).
      conic: [P, 3] packed inverse 2D covariance (a, b, c).
      colors: [P, 10] channel payload (rgb, label, fg, dir2d xyz, conf, depth).
      opacity: [P, 1] activated opacity.
      depth: [P] view-space z (sort key; non-differentiable).
      valid: [P] bool pre-culling mask.
      bg: [10] background (blended as C + T_final * bg).
      width, height: static image size.
      cfg: RasterConfig.
    Returns dict with: render [10, H, W], final_T [H, W], radii [P],
      visibility [P] bool, num_rendered scalar.
    """
    cfg = cfg or C.RasterConfig()
    sg = jax.lax.stop_gradient
    mean_pix = ndc_xy_to_pixel(ndc, width, height)
    depth = sg(depth)

    pre = C.preprocess(sg(mean_pix), sg(conic), depth, valid, width, height, cfg)
    binned = C.bin_instances(pre, mean_pix, conic, opacity, colors, depth,
                             width, height, cfg)

    backend = _resolve_backend(cfg)
    if backend == "pallas":
        tile_buf = _core_pallas(binned.feat, binned.colors,
                                binned.tile_of_chunk, binned.chunk_in_tile,
                                binned.gid, binned.num_rendered,
                                binned.num_tiles, width, height, cfg)
    elif backend == "jnp":
        tile_buf = jnp_core.raster_core_jnp(binned, width, height, cfg)
    else:
        raise ValueError(f"unknown rasterize backend: {backend}")

    image, t_final = C.assemble_image(tile_buf, bg, width, height, cfg)
    return {
        "render": image,
        "final_T": t_final,
        "radii": sg(pre.radius).astype(jnp.int32),
        "visibility": pre.valid & (pre.radius > 0),
        "num_rendered": binned.num_rendered,
    }


def ndc_xy_to_pixel(ndc: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """[P, >=2] NDC -> [P, 2] pixel centers (cuda ndc2Pix)."""
    size = jnp.asarray([width, height], dtype=ndc.dtype)
    return ((ndc[:, :2] + 1.0) * size - 1.0) * 0.5
