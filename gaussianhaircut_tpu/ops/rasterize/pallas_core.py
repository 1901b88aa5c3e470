"""Pallas TPU compositing kernels (the ``renderCUDA`` forward/backward
equivalents, reference: forward.cu:287-400 / backward.cu:402-561) — redesigned
for the MXU instead of translated:

- per-chunk Gaussian evaluation is a quadratic-form **matmul**: a [PIX, 8]
  pixel-polynomial basis times an [8, CH] per-instance coefficient matrix
  gives every (pixel, instance) exponent in one MXU op;
- the front-to-back transmittance recursion becomes a **log-space prefix sum**
  along the instance axis, computed as a matmul with a triangular ones matrix
  (one more MXU op) — including the exact early-termination latch semantics of
  the CUDA kernel (T < 1e-4 stops the pixel, skipped instances don't);
- feature compositing is `[PIX, CH] @ [CH, 16]` (MXU);
- the backward expresses the CUDA back-to-front suffix accumulator as
  ``total - prefix`` so it reuses the same front-to-back sweep, and emits
  per-instance gradients that the caller segment-sums **deterministically**
  (replacing backward.cu's atomicAdd, which is non-deterministic).

Grid = one step per 128-instance chunk; tiles own consecutive chunks, and the
output tile block stays resident in VMEM across its chunks (standard Pallas
accumulation pattern), so there is no manual DMA and the pipeline double-
buffers automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianhaircut_tpu.ops.rasterize import common as C

_F32 = jnp.float32


def _tri_incl(ch: int) -> np.ndarray:
    """Upper-triangular (incl. diagonal) ones: x @ U = inclusive prefix sum
    along the instance axis."""
    return np.triu(np.ones((ch, ch), np.float32))


def _pixel_basis(cfg: C.RasterConfig):
    """[PIX, 8] polynomial basis (px^2, py^2, px*py, px, py, 1, 0, 0) in
    TILE-LOCAL pixel coordinates.

    Local (not absolute) coordinates keep every matmul operand small: with
    absolute coords the quadratic coefficients reach ~1e4 and the MXU's
    bf16-elevated f32 products lose ~0.1-50 in the exponent (observed as a
    deterministic mis-render / exp-overflow NaN on hardware)."""
    pix = cfg.tile_pix
    i = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (i % cfg.tile_w).astype(_F32)
    py = (i // cfg.tile_w).astype(_F32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, one, zero, zero], axis=1)


def _coef_matrix(feat, tile_x0, tile_y0):
    """[8, CH] per-instance quadratic coefficients matching `_pixel_basis`
    (both in tile-local coordinates: gx/gy are shifted by the tile origin).

    power(px, py) = -0.5 a dx^2 - 0.5 c dy^2 - b dx dy with dx = gx - px.
    """
    gx = feat[C.F_GX:C.F_GX + 1, :] - tile_x0.astype(_F32)
    gy = feat[C.F_GY:C.F_GY + 1, :] - tile_y0.astype(_F32)
    a = feat[C.F_CA:C.F_CA + 1, :]
    b = feat[C.F_CB:C.F_CB + 1, :]
    cc = feat[C.F_CC:C.F_CC + 1, :]
    zero = jnp.zeros_like(a)
    return jnp.concatenate([
        -0.5 * a,
        -0.5 * cc,
        -b,
        a * gx + b * gy,
        cc * gy + b * gx,
        -0.5 * (a * gx * gx + cc * gy * gy + 2.0 * b * gx * gy),
        zero, zero,
    ], axis=0)


_HI = jax.lax.Precision.HIGHEST
_BF16 = jnp.bfloat16


def _prefix_matmul_f32(x, u_tri_bf16):
    """Inclusive prefix sum of x [PIX, CH] along CH via one bf16 matmul with
    a 3-way float split (~f32 accuracy at 1/6 the cost of a
    Precision.HIGHEST f32 matmul; the 0/1 triangular matrix is exact in
    bf16 and the MXU accumulates in f32)."""
    hi = x.astype(_BF16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(_BF16).astype(jnp.float32)
    lo = (r - mid).astype(_BF16)
    stacked = jnp.concatenate([hi.astype(_BF16), mid.astype(_BF16), lo], axis=0)
    out = jnp.dot(stacked, u_tri_bf16, preferred_element_type=jnp.float32)
    n = x.shape[0]
    return out[:n] + out[n:2 * n] + out[2 * n:]


def _chunk_blend_quantities(feat, u_tri, basis, t_in, done_in, tile_x0, tile_y0):
    """Shared fwd/bwd per-chunk math.  Returns a dict of [PIX, CH] arrays and
    per-chunk updates, mirroring forward.cu:351-388 semantics exactly.

    Precision strategy: the default TPU matmul precision truncates f32
    operands to bf16 (catastrophic for exponents / log prefix sums), so the
    small matmuls run at Precision.HIGHEST and the big triangular prefix
    matmuls use an exact-enough 3-way bf16 split (_prefix_matmul_f32)."""
    coef = _coef_matrix(feat, tile_x0, tile_y0)
    power = jnp.dot(basis, coef, preferred_element_type=_F32,
                    precision=_HI)                                      # [PIX, CH]
    op = feat[C.F_OP:C.F_OP + 1, :]
    vld = feat[C.F_VALID:C.F_VALID + 1, :]
    expp = jnp.exp(power)
    raw = op * expp
    alpha = jnp.minimum(C.ALPHA_CLAMP, raw)
    cand = (power <= 0.0) & (alpha >= C.ALPHA_MIN) & (vld > 0.5)
    alpha = jnp.where(cand, alpha, 0.0)
    one_m = 1.0 - alpha

    logs = jnp.log1p(-alpha)
    s_incl = _prefix_matmul_f32(logs, u_tri)
    t_incl = jnp.exp(s_incl)
    t_excl = jnp.exp(s_incl - logs)
    test = t_in * t_incl
    fail = cand & (test < C.T_EPS)
    # 0/1 values and counts <= CH are exact in a single bf16 pass
    failcum = jnp.dot(fail.astype(_BF16), u_tri,
                      preferred_element_type=_F32)
    contrib = cand & (failcum < 0.5) & (done_in < 0.5)
    t_before = t_in * t_excl
    w = jnp.where(contrib, alpha * t_before, 0.0)

    lsum = jnp.sum(jnp.where(contrib, logs, 0.0), axis=1, keepdims=True)
    t_new = t_in * jnp.exp(lsum)
    done_new = jnp.maximum(
        done_in, jnp.max(jnp.where(fail, 1.0, 0.0), axis=1, keepdims=True))
    return dict(power=power, expp=expp, raw=raw, alpha=alpha, one_m=one_m,
                contrib=contrib, t_before=t_before, w=w,
                t_new=t_new, done_new=done_new)


# ---------------------------------------------------------------- forward ---

def _fwd_kernel(tof_ref, kit_ref, feat_ref, col_ref, u_ref, out_ref, acc_ref,
                *, cfg: C.RasterConfig, gx_grid: int):
    # The running (color, done, T) accumulator lives in VMEM *scratch*, which
    # is single-buffered and persists across grid steps.  Accumulating through
    # out_ref instead is unsafe: output blocks are multi-buffered and with a
    # scalar-prefetch-driven index map the revisit detection cannot alias the
    # buffers (observed miscompile on real TPU: alternate chunks landed in
    # alternate buffers).
    c = pl.program_id(0)
    tile = tof_ref[c]
    k = kit_ref[c]
    pix = cfg.tile_pix
    lane = jax.lax.broadcasted_iota(jnp.int32, (pix, C.PAD_CHANNELS), 1)

    init = jnp.where(lane == C.CH_TRANS, 1.0, 0.0).astype(_F32)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = init

    acc = acc_ref[:, :]
    done_in = acc[:, C.CH_DONE:C.CH_DONE + 1]
    t_in = acc[:, C.CH_TRANS:C.CH_TRANS + 1]

    # early termination at tile granularity (the block-vote analog of
    # forward.cu:334-337): skip the chunk when every pixel latched done
    @pl.when(jnp.min(done_in) < 0.5)
    def _():
        tile_x0 = (tile % gx_grid) * cfg.tile_w
        tile_y0 = (tile // gx_grid) * cfg.tile_h
        basis = _pixel_basis(cfg)
        q = _chunk_blend_quantities(feat_ref[0], u_ref[:, :], basis, t_in,
                                    done_in, tile_x0, tile_y0)
        d_color = jnp.dot(q["w"], col_ref[0], preferred_element_type=_F32,
                          precision=_HI)
        new_acc = acc + d_color
        new_acc = jnp.where(lane == C.CH_DONE, q["done_new"], new_acc)
        new_acc = jnp.where(lane == C.CH_TRANS, q["t_new"], new_acc)
        acc_ref[:, :] = new_acc

    out_ref[0] = acc_ref[:, :]


def raster_core_pallas_fwd(binned: C.Binned, width: int, height: int,
                           cfg: C.RasterConfig, interpret: bool = False):
    gx_grid, _ = cfg.grid(width, height)
    tc = binned.feat.shape[0]
    ch = cfg.chunk
    pix = cfg.tile_pix
    u_tri = jnp.asarray(_tri_incl(ch), dtype=_BF16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tc,),
        in_specs=[
            pl.BlockSpec((1, 8, ch), lambda c, tof, kit: (c, 0, 0)),
            pl.BlockSpec((1, ch, C.PAD_CHANNELS), lambda c, tof, kit: (c, 0, 0)),
            pl.BlockSpec((ch, ch), lambda c, tof, kit: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, pix, C.PAD_CHANNELS), lambda c, tof, kit: (tof[c], 0, 0)),
        scratch_shapes=[pltpu.VMEM((pix, C.PAD_CHANNELS), _F32)],
    )
    kernel = functools.partial(_fwd_kernel, cfg=cfg, gx_grid=gx_grid)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((binned.num_tiles, pix, C.PAD_CHANNELS), _F32),
        interpret=interpret,
    )(binned.tile_of_chunk, binned.chunk_in_tile, binned.feat, binned.colors, u_tri)


# --------------------------------------------------------------- backward ---

def _bwd_kernel(tof_ref, kit_ref, feat_ref, col_ref, u_ref, gbuf_ref, obuf_ref,
                dfeat_ref, dcol_ref, carry_ref,
                *, cfg: C.RasterConfig, gx_grid: int):
    c = pl.program_id(0)
    tile = tof_ref[c]
    k = kit_ref[c]
    pix = cfg.tile_pix
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (pix, C.PAD_CHANNELS), 1)

    # Drop the cotangent of the (non-differentiable) done channel.
    g = jnp.where(lane16 == C.CH_DONE, 0.0, gbuf_ref[0])

    @pl.when(k == 0)
    def _():
        total = jnp.sum(g * obuf_ref[0], axis=1, keepdims=True)     # [PIX, 1]
        init = jnp.zeros((pix, 8), _F32)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, 8), 1)
        init = jnp.where(lane8 == 0, 1.0, init)                     # T = 1
        init = jnp.where(lane8 == 3, total, init)
        carry_ref[:, :] = init

    carry = carry_ref[:, :]
    t_in = carry[:, 0:1]
    done_in = carry[:, 1:2]
    prefix_in = carry[:, 2:3]
    total = carry[:, 3:4]

    ch = dfeat_ref.shape[-1]
    dfeat_ref[0] = jnp.zeros((8, ch), _F32)
    dcol_ref[0] = jnp.zeros((ch, C.PAD_CHANNELS), _F32)

    # same tile-level early termination as the forward: once every pixel
    # latched done, remaining chunks contribute zero gradient
    @pl.when(jnp.min(done_in) < 0.5)
    def _():
        feat = feat_ref[0]
        col = col_ref[0]
        tile_x0 = (tile % gx_grid) * cfg.tile_w
        tile_y0 = (tile // gx_grid) * cfg.tile_h
        basis = _pixel_basis(cfg)
        q = _chunk_blend_quantities(feat, u_ref[:, :], basis, t_in, done_in,
                                    tile_x0, tile_y0)

        # u[pix, i] = sum_ch g[pix, ch] * col[i, ch]
        u = jax.lax.dot_general(g, col, (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32,
                                precision=_HI)                      # [PIX, CH]
        uw = u * q["w"]
        prefix_incl = prefix_in + _prefix_matmul_f32(uw, u_ref[:, :])
        a_suffix = total - prefix_incl
        dalpha = jnp.where(q["contrib"],
                           u * q["t_before"] - a_suffix / q["one_m"], 0.0)

        # CUDA-compatible: gradient ignores the 0.99 clamp
        # (backward.cu:502-558).
        m = dalpha * q["raw"]                                       # dL/dpower
        d_op = jnp.sum(dalpha * q["expp"], axis=0, keepdims=True)   # [1, CH]

        # moments are in tile-local pixel coords, matching the local basis
        moments = jax.lax.dot_general(m, basis, (((0,), (0,)), ((), ())),
                                      preferred_element_type=_F32,
                                      precision=_HI)                # [CH, 8]
        mxx = moments[:, 0][None, :]
        myy = moments[:, 1][None, :]
        mxy = moments[:, 2][None, :]
        mx = moments[:, 3][None, :]
        my = moments[:, 4][None, :]
        m1 = moments[:, 5][None, :]

        gx = feat[C.F_GX:C.F_GX + 1, :] - tile_x0.astype(_F32)
        gy = feat[C.F_GY:C.F_GY + 1, :] - tile_y0.astype(_F32)
        a = feat[C.F_CA:C.F_CA + 1, :]
        b = feat[C.F_CB:C.F_CB + 1, :]
        cc = feat[C.F_CC:C.F_CC + 1, :]

        s_dx = gx * m1 - mx               # sum_pix m * dx
        s_dy = gy * m1 - my
        s_dx2 = gx * gx * m1 - 2.0 * gx * mx + mxx
        s_dy2 = gy * gy * m1 - 2.0 * gy * my + myy
        s_dxdy = gx * gy * m1 - gx * my - gy * mx + mxy

        d_gx = -(a * s_dx + b * s_dy)
        d_gy = -(cc * s_dy + b * s_dx)
        d_a = -0.5 * s_dx2
        d_b = -s_dxdy
        d_c = -0.5 * s_dy2
        zero = jnp.zeros_like(d_gx)
        dfeat_ref[0] = jnp.concatenate(
            [d_gx, d_gy, d_a, d_b, d_c, d_op, zero, zero], axis=0)  # [8, CH]

        dcol_ref[0] = jax.lax.dot_general(
            q["w"], g, (((0,), (0,)), ((), ())), preferred_element_type=_F32,
            precision=_HI)

        lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, 8), 1)
        prefix_new = prefix_in + jnp.sum(uw, axis=1, keepdims=True)
        new_carry = jnp.where(lane8 == 0, q["t_new"], carry)
        new_carry = jnp.where(lane8 == 1, q["done_new"], new_carry)
        new_carry = jnp.where(lane8 == 2, prefix_new, new_carry)
        carry_ref[:, :] = new_carry


def raster_core_pallas_bwd(binned: C.Binned, tile_buf, gbuf, width: int,
                           height: int, cfg: C.RasterConfig,
                           interpret: bool = False):
    gx_grid, _ = cfg.grid(width, height)
    tc = binned.feat.shape[0]
    ch = cfg.chunk
    pix = cfg.tile_pix
    u_tri = jnp.asarray(_tri_incl(ch), dtype=_BF16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tc,),
        in_specs=[
            pl.BlockSpec((1, 8, ch), lambda c, tof, kit: (c, 0, 0)),
            pl.BlockSpec((1, ch, C.PAD_CHANNELS), lambda c, tof, kit: (c, 0, 0)),
            pl.BlockSpec((ch, ch), lambda c, tof, kit: (0, 0)),
            pl.BlockSpec((1, pix, C.PAD_CHANNELS), lambda c, tof, kit: (tof[c], 0, 0)),
            pl.BlockSpec((1, pix, C.PAD_CHANNELS), lambda c, tof, kit: (tof[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, ch), lambda c, tof, kit: (c, 0, 0)),
            pl.BlockSpec((1, ch, C.PAD_CHANNELS), lambda c, tof, kit: (c, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((pix, 8), _F32)],
    )
    kernel = functools.partial(_bwd_kernel, cfg=cfg, gx_grid=gx_grid)
    dfeat, dcol = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tc, 8, ch), _F32),
            jax.ShapeDtypeStruct((tc, ch, C.PAD_CHANNELS), _F32),
        ],
        interpret=interpret,
    )(binned.tile_of_chunk, binned.chunk_in_tile, binned.feat, binned.colors,
      u_tri, gbuf, tile_buf)
    return dfeat, dcol
