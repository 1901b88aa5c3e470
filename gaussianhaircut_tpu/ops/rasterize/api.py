"""Public differentiable rasterization API.

``rasterize`` is the TPU-native replacement for the reference's
``GaussianRasterizer`` (ext/diff_gaussian_rasterization/__init__.py:46-237):
it takes precomputed NDC means, conics, 10-channel colors, opacities and
depths (the same differentiable surface the reference exposes — see
SURVEY.md §7.1), and returns the composited 10-channel image plus auxiliary
visibility data.

Two backends:
- **pallas** (TPU): ONE ``jax.custom_vjp`` spanning binning + kernel +
  assembly.  The backward runs the Pallas backward kernel to per-instance
  gradients, then reduces them to per-Gaussian gradients with a
  sort + gather + cumsum segment reduction (deterministic, and ~10x faster
  than XLA's scatter-add transpose of the binning gathers, which dominated
  the step time when autodiff handled it);
- **jnp** (CPU/debug): the chunk-scan implementation under plain autodiff.

Gradient routing matches the reference: the NDC->pixel conversion lives
inside the VJP, so d(ndc) carries the 0.5*W / 0.5*H factors of
backward.cu:462-465; depth orders but never differentiates; bg receives its
true cotangent sum(T_final * g).
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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _resolve_backend(cfg: C.RasterConfig) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def _resolve_io(cfg: C.RasterConfig) -> C.RasterConfig:
    """io_mode="auto" -> "manual" compiled on TPU (bench r5 winner at both
    scales), "outblock" under interpret (the manual DMA choreography is pure
    overhead there)."""
    if cfg.io_mode != "auto":
        return cfg
    import dataclasses
    return dataclasses.replace(
        cfg, io_mode="outblock" if _interpret() else "manual")


def ndc_xy_to_pixel(ndc: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """[P, >=2] NDC -> [P, 2] pixel centers (cuda ndc2Pix)."""
    size = jnp.asarray([width, height], dtype=ndc.dtype)
    return ((ndc[:, :2] + 1.0) * size - 1.0) * 0.5


def _prepare(ndc, conic, colors, opacity, depth, valid, width, height, cfg,
             full_height, n_batch=1):
    sg = jax.lax.stop_gradient
    # NDC -> pixel uses the FULL image height; the raster grid uses `height`
    # (rows being rendered).  A caller that shifts ndc_y by -2*y0/full_height
    # renders the row window [y0, y0 + height) — the tile-sharding hook.
    # With n_batch > 1 the [P] axis is a flattened camera batch (see
    # common.bin_instances).
    mean_pix = ndc_xy_to_pixel(ndc, width, full_height or height)
    pre = C.preprocess(sg(mean_pix), sg(conic), sg(depth), valid, width,
                       height, cfg, opacity=sg(opacity))
    binned = C.bin_instances(pre, mean_pix, conic, opacity, colors, depth,
                             width, height, cfg, n_batch=n_batch)
    return pre, binned


def _disassemble_cotangent(g_img, g_t, bg, width, height, cfg):
    """Cotangent of the assembled image -> tile-buffer cotangent [T, PIX, 16]
    (the inverse of common.assemble_image)."""
    gx_grid, gy_grid = cfg.grid(width, height)
    hp, wp = gy_grid * cfg.tile_h, gx_grid * cfg.tile_w
    g_img = jnp.pad(g_img, ((0, 0), (0, hp - height), (0, wp - width)))
    g_t = jnp.pad(g_t, ((0, hp - height), (0, wp - width)))
    # [10, Hp, Wp] -> [T, PIX, 10]
    gi = g_img.reshape(C.NUM_CHANNELS, gy_grid, cfg.tile_h, gx_grid, cfg.tile_w)
    gi = gi.transpose(1, 3, 2, 4, 0).reshape(-1, cfg.tile_pix, C.NUM_CHANNELS)
    gt = g_t.reshape(gy_grid, cfg.tile_h, gx_grid, cfg.tile_w)
    gt = gt.transpose(0, 2, 1, 3).reshape(-1, cfg.tile_pix)
    # T_final channel cotangent: direct g_T plus the bg-blend term
    g15 = gt + jnp.einsum("tpc,c->tp", gi, bg[:C.NUM_CHANNELS])
    zeros = jnp.zeros(gi.shape[:2] + (C.PAD_CHANNELS - C.NUM_CHANNELS - 1,),
                      gi.dtype)
    return jnp.concatenate([gi, zeros, g15[..., None]], axis=-1)


def _nr_stats(binned):
    """[total, overflow_bound] int32: the true instance count plus the value
    overflow checks compare against capacity (identical in the single-camera
    path; B * max_b(count_b) in the per-camera-segmented batched path)."""
    bound = (binned.num_rendered if binned.num_rendered_bound is None
             else binned.num_rendered_bound)
    return jnp.stack([binned.num_rendered, bound])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _rasterize_pallas(ndc, conic, colors, opacity, depth, valid, bg,
                      width, height, cfg, full_height, n_batch):
    out, _ = _rasterize_pallas_fwd(ndc, conic, colors, opacity, depth, valid,
                                   bg, width, height, cfg, full_height,
                                   n_batch)
    return out


def _rasterize_pallas_fwd(ndc, conic, colors, opacity, depth, valid, bg,
                          width, height, cfg, full_height, n_batch):
    # Differentiable inputs are FLAT [B*P, ...] (camera batch flattened);
    # outputs carry the batch axis [B, ...].
    pre, binned = _prepare(ndc, conic, colors, opacity, depth, valid,
                           width, height, cfg, full_height, n_batch)
    tile_buf = pallas_core.raster_core_pallas_fwd(binned, width, height,
                                                  _resolve_io(cfg),
                                                  interpret=_interpret())
    t_per = binned.num_tiles // n_batch
    tb = tile_buf.reshape(n_batch, t_per, cfg.tile_pix, C.PAD_CHANNELS)
    image, t_final = jax.vmap(
        lambda b: C.assemble_image(b, bg, width, height, cfg))(tb)
    radii = jax.lax.stop_gradient(pre.radius).astype(jnp.int32)
    radii = radii.reshape(n_batch, -1)
    # reference semantics (radii > 0 == survived geometric culling): the
    # opacity-aware binned rect may drop near-invisible instances from
    # binning, but they stay "visible" for max_radii2D / densify stats just
    # as in CUDA (their gradients are exactly zero either way)
    visibility = (pre.radius > 0).reshape(n_batch, -1)
    out = (image, t_final, radii, visibility, _nr_stats(binned))
    return out, (binned, tile_buf, bg, t_final)


def _rasterize_pallas_bwd(width, height, cfg, full_height, n_batch, res, cot):
    binned, tile_buf, bg, t_final = res
    g_img, g_t, _g_radii, _g_vis, _g_num = cot

    gbuf = jax.vmap(
        lambda gi, gt: _disassemble_cotangent(gi, gt, bg, width, height, cfg)
    )(g_img, g_t)
    gbuf = gbuf.reshape((-1,) + gbuf.shape[2:])
    dpay = pallas_core.raster_core_pallas_bwd(
        binned, tile_buf, gbuf, width, height, _resolve_io(cfg),
        interpret=_interpret())

    # ---- deterministic per-Gaussian reduction ----
    # dpay carries only the 16 live gradient rows ([feat6 | colors10] — the
    # zero pad rows never leave the kernel), shrinking this reduction's
    # dominant [S]-row gather by a third.
    tc, nrow, ch = dpay.shape
    s = tc * ch
    p = binned.gauss_offset.shape[0]
    # derive the instance capacity from the chunk layout itself
    # (total_chunks = cap // ch + num_tiles) — the batched path may round
    # cap up to a per-camera chunk-aligned split
    cap = (tc - binned.num_tiles) * ch
    gid = binned.gid.reshape(s)
    # slots sorted by (gid, slot) -> gaussian g's slots land in the contiguous
    # range [gauss_offset[g], gauss_offset[g] + gauss_count[g]) (counts are
    # preserved; invalid slots carry gid = P and sort past cap).  The slot
    # tiebreak makes the summation order deterministic.
    if binned.gauss_count_live is not None and cfg.reduce_mode != "scatter":
        # pair_cull: each gaussian owns only its LIVE (post-cull) slots in
        # the (gid, slot)-sorted stream; the pre-cull offsets would shift
        # every segment after the first culled pair
        cnt = binned.gauss_count_live
        off = jnp.cumsum(cnt) - cnt
    else:
        off = binned.gauss_offset
        cnt = binned.gauss_count
    end = jnp.clip(off + cnt - 1, 0, cap - 1)

    def seg_cumsum(g16):
        """Inclusive prefix-sum over the instance axis ([cap, 16] f32).
        reduce_cumsum="trimm" computes the within-block prefix as one
        [blk, blk] lower-triangular matmul per 512-row block on the MXU plus
        an exclusive block-offset add — fixed summation order (deterministic)
        but a different association order than the linear cumsum."""
        if cfg.reduce_cumsum == "linear":
            return jnp.cumsum(g16, axis=0)
        if cfg.reduce_cumsum != "trimm":
            raise ValueError(f"unknown reduce_cumsum: {cfg.reduce_cumsum!r}")
        blk = 512
        n = g16.shape[0]
        nb = -(-n // blk)
        r = jnp.pad(g16, ((0, nb * blk - n), (0, 0))).reshape(nb, blk, -1)
        tri = jnp.asarray(np.tril(np.ones((blk, blk), np.float32)))
        within = jnp.einsum("ij,bjc->bic", tri, r,
                            preferred_element_type=jnp.float32)
        bsum = within[:, -1]
        boff = jnp.cumsum(bsum, axis=0) - bsum
        return (within + boff[:, None]).reshape(nb * blk, -1)[:n]

    if cfg.reduce_mode == "scatter":
        # sort-free: invert the binning permutation carried by Binned.src
        # (expansion slot per sorted slot; masked slots = cap, dropped).
        # Within a gaussian both orders ascend by tile id, so the summation
        # order — and hence the result — is bit-identical to rowmajor.
        # Expansion slots whose pair was culled never reach a chunk window;
        # they keep the default index s, which reads the appended zero row
        # (scatter segments stay in PRE-cull expansion order).
        # NOTE: no unique_indices — the masked tail of Binned.src holds many
        # duplicated `cap` sentinels; they are out-of-bounds under
        # mode="drop", but duplicated indices would still formally violate
        # the unique_indices contract (UB on a backend change).  In-bounds
        # indices ARE unique, so correctness is unchanged without the flag.
        inv = jnp.full((cap,), s, jnp.int32).at[binned.src.reshape(s)].set(
            jnp.arange(s, dtype=jnp.int32), mode="drop")
        g16 = jnp.pad(dpay.swapaxes(1, 2).reshape(s, nrow),
                      ((0, 1), (0, 0)))[inv]
        csum = seg_cumsum(g16)                                    # [cap, 16]
        seg = csum[end] - jnp.where((off > 0)[:, None],
                                    csum[jnp.maximum(off - 1, 0)], 0.0)
        seg = jnp.where((cnt > 0)[:, None], seg, 0.0)             # [P, 16]
    elif cfg.reduce_mode == "featmajor":
        _, order = jax.lax.sort((gid, jnp.arange(s, dtype=jnp.int32)),
                                num_keys=2)
        # instance-minor layout: the dominant [S]-gather and the cumsum move
        # only logical bytes ([16, S] / [16, cap]) instead of rows padded to
        # 128 lanes.  With the linear cumsum the summation order matches
        # rowmajor exactly (bit-identical); with trimm the 512-block
        # partition of the instance axis is the same as rowmajor's, but the
        # MXU contraction layout differs, so gradients are close (f32
        # rounding) rather than bit-equal to rowmajor+trimm.
        g16t = dpay.reshape(s // ch, nrow, ch).transpose(1, 0, 2).reshape(nrow, s)
        g16t = jnp.take(g16t, order[:cap], axis=1)
        if cfg.reduce_cumsum == "linear":
            csum = jnp.cumsum(g16t, axis=1)                       # [16, cap]
        elif cfg.reduce_cumsum == "trimm":
            blk = 512
            nb = -(-cap // blk)
            r = jnp.pad(g16t, ((0, 0), (0, nb * blk - cap))
                        ).reshape(nrow, nb, blk)
            tri = jnp.asarray(np.tril(np.ones((blk, blk), np.float32)))
            within = jnp.einsum("ij,cbj->cbi", tri, r,
                                preferred_element_type=jnp.float32)
            bsum = within[:, :, -1]
            boff = jnp.cumsum(bsum, axis=1) - bsum
            csum = (within + boff[:, :, None]).reshape(nrow, nb * blk)[:, :cap]
        else:
            raise ValueError(f"unknown reduce_cumsum: {cfg.reduce_cumsum!r}")
        seg = (jnp.take(csum, end, axis=1)
               - jnp.where((off > 0)[None, :],
                           jnp.take(csum, jnp.maximum(off - 1, 0), axis=1),
                           0.0))
        seg = jnp.where((cnt > 0)[None, :], seg, 0.0).T           # [P, 16]
    else:
        _, order = jax.lax.sort((gid, jnp.arange(s, dtype=jnp.int32)),
                                num_keys=2)
        g16 = dpay.swapaxes(1, 2).reshape(s, nrow)
        g16 = g16[order[:cap]]
        csum = seg_cumsum(g16)                                    # [cap, 16]
        seg = csum[end] - jnp.where((off > 0)[:, None],
                                    csum[jnp.maximum(off - 1, 0)], 0.0)
        seg = jnp.where((cnt > 0)[:, None], seg, 0.0)             # [P, 16]

    d_gx = seg[:, C.F_GX]
    d_gy = seg[:, C.F_GY]
    d_ndc = jnp.stack([d_gx * (width * 0.5),
                       d_gy * ((full_height or height) * 0.5),
                       jnp.zeros_like(d_gx)], axis=-1)
    d_conic = seg[:, C.F_CA:C.F_CC + 1]
    d_opacity = seg[:, C.F_OP:C.F_OP + 1]
    d_colors = seg[:, 6:6 + C.NUM_CHANNELS]
    d_bg_img = jnp.einsum("bchw,bhw->c", g_img, t_final)
    d_bg = jnp.pad(d_bg_img, (0, bg.shape[0] - C.NUM_CHANNELS))

    d_depth = jnp.zeros_like(d_gx)
    d_valid = np.zeros(d_gx.shape, dtype=jax.dtypes.float0)
    return (d_ndc, d_conic, d_colors, d_opacity, d_depth, d_valid, d_bg)


_rasterize_pallas.defvjp(_rasterize_pallas_fwd, _rasterize_pallas_bwd)


def _rasterize_jnp(ndc, conic, colors, opacity, depth, valid, bg,
                   width, height, cfg, full_height=None, n_batch=1):
    """CPU/debug path: chunk-scan core under plain autodiff (the binning
    gathers' transpose handles the reduction).  Same flat-in / batched-out
    contract as the pallas path."""
    pre, binned = _prepare(ndc, conic, colors, opacity, depth, valid,
                           width, height, cfg, full_height, n_batch)
    tile_buf = jnp_core.raster_core_jnp(binned, width, height, cfg)
    t_per = binned.num_tiles // n_batch
    tb = tile_buf.reshape(n_batch, t_per, cfg.tile_pix, C.PAD_CHANNELS)
    image, t_final = jax.vmap(
        lambda b: C.assemble_image(b, bg, width, height, cfg))(tb)
    radii = jax.lax.stop_gradient(pre.radius).astype(jnp.int32)
    radii = radii.reshape(n_batch, -1)
    # reference semantics (radii > 0 == survived geometric culling): the
    # opacity-aware binned rect may drop near-invisible instances from
    # binning, but they stay "visible" for max_radii2D / densify stats just
    # as in CUDA (their gradients are exactly zero either way)
    visibility = (pre.radius > 0).reshape(n_batch, -1)
    return image, t_final, radii, visibility, _nr_stats(binned)


def _rasterize_any(ndc, conic, colors, opacity, depth, valid, bg,
                   width, height, cfg, full_height, n_batch):
    backend = _resolve_backend(cfg)
    if backend not in ("pallas", "jnp"):
        raise ValueError(f"unknown rasterize backend: {backend}")
    fn = _rasterize_pallas if backend == "pallas" else _rasterize_jnp
    return fn(ndc, conic, colors, opacity, depth.astype(jnp.float32), valid,
              bg, width, height, cfg, full_height, n_batch)


def rasterize(ndc: jnp.ndarray, conic: jnp.ndarray, colors: jnp.ndarray,
              opacity: jnp.ndarray, depth: jnp.ndarray, valid: jnp.ndarray,
              bg: jnp.ndarray, width: int, height: int,
              cfg: C.RasterConfig | None = None,
              full_height: int | None = None) -> dict[str, Any]:
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
      width, height: static raster size (height = rows being rendered).
      cfg: RasterConfig.
      full_height: full-image height for the NDC->pixel conversion when
        rendering a row window (tile sharding); None = height.
    Returns dict with: render [10, H, W], final_T [H, W], radii [P],
      visibility [P] bool, num_rendered scalar.
    """
    cfg = cfg or C.RasterConfig()
    image, t_final, radii, visibility, nr_stats = _rasterize_any(
        ndc, conic, colors, opacity, depth, valid, bg, width, height, cfg,
        full_height, 1)
    return {
        "render": image[0],
        "final_T": t_final[0],
        "radii": radii[0],
        "visibility": visibility[0],
        "num_rendered": nr_stats[0],
    }


def rasterize_batched(ndc: jnp.ndarray, conic: jnp.ndarray,
                      colors: jnp.ndarray, opacity: jnp.ndarray,
                      depth: jnp.ndarray, valid: jnp.ndarray,
                      bg: jnp.ndarray, width: int, height: int,
                      cfg: C.RasterConfig | None = None) -> dict[str, Any]:
    """Batched-camera splatting: every input gains a leading camera axis B
    and all B cameras composite in ONE binning + kernel sweep over a virtual
    grid of B * tiles.  The CUDA reference is strictly 1 camera/iteration
    (train_gaussians.py:103-105) — a GPU-loop limitation, not a contract.

    Binning is per-camera SEGMENTED (common._bin_instances_batched): each
    camera owns a chunk-aligned [cap/B] slice of the instance buffer and the
    sort runs independently per slice (the earlier single-stream layout made
    the sort itself superlinear in B).

    MEASURED (2026-08-19, 100k@960x544, tools/tpu_bench_batched.py): B=1
    59.4 ms/step (16.8 cam/s), B=2 126.4 (15.8 cam/s), B=4 320.5 (12.5
    cam/s) — even segmented, per-camera throughput DECREASES with B, because
    the per-call fixed cost this path could amortize is only ~4 ms while the
    B-fold kernel sweep loses pipelining efficiency.  Use this path when
    single-process multi-camera SEMANTICS are wanted (it is the bit-matched
    twin of the camera-DP mesh step, tests/test_parallel.py); for multi-
    camera THROUGHPUT use parallel/data_parallel.py across devices.

    Inputs: ndc [B, P, 3], conic [B, P, 3], colors [B, P, 10],
    opacity [B, P, 1], depth [B, P], valid [B, P], bg [10].
    Returns dict with render [B, 10, H, W], final_T [B, H, W], radii [B, P],
    visibility [B, P], num_rendered (the TRUE total instance count over all
    cameras — the logging/occupancy statistic), and num_rendered_bound
    (B * max per-camera count: capacity and truncation are per camera under
    the segmented layout, so THIS is the value overflow checks must compare
    against the B*P-scaled capacity).

    NOTE: ``cfg.capacity_mult`` (and ``cfg.capacity``) are interpreted
    per-Gaussian as usual; the instance buffer is sized against B * P rows,
    rounded up to a per-camera chunk-aligned split.
    """
    cfg = cfg or C.RasterConfig()
    b, p = ndc.shape[:2]
    flat = lambda x: x.reshape((b * p,) + x.shape[2:])
    image, t_final, radii, visibility, nr_stats = _rasterize_any(
        flat(ndc), flat(conic), flat(colors), flat(opacity), flat(depth),
        flat(valid), bg, width, height, cfg, None, b)
    return {
        "render": image,
        "final_T": t_final,
        "radii": radii,
        "visibility": visibility,
        "num_rendered": nr_stats[0],
        "num_rendered_bound": nr_stats[1],
    }
