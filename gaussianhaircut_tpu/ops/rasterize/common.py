"""Shared rasterizer machinery: config, per-Gaussian preprocess and the
static-capacity tile binning that replaces the CUDA dynamic binning buffers.

Reference semantics being reproduced (all behavioral, none of the code):
- preprocess: cuda_rasterizer/forward.cu:155-282 (conic-precomp path — cov2d is
  *recovered* from the conic, radius = ceil(3 sqrt(max eigenvalue)) with the
  0.1 discriminant clamp, tile rect via getRect truncation semantics).
- binning: rasterizer_impl.cu:70-138 (duplicateWithKeys + radix sort by
  (tile << 32 | depth-bits) + identifyTileRanges).  On TPU the dynamic
  `resizeFunctional` arena (rasterize_points.cu:27-33) becomes a static
  instance capacity with an overflow count the caller can check, and the radix
  sort becomes one `jax.lax.sort` over (tile, depth, gaussian-id) — the
  trailing id key reproduces the stable ordering of the CUDA radix sort for
  equal depths.

The binning output is *chunk-aligned*: every tile's instance list starts at a
chunk boundary and is padded to a whole number of chunks (>= 1, so empty tiles
still get their output block initialized).  This lets the Pallas kernels walk
`grid=(num_chunks,)` with BlockSpec-driven pipelining and no manual DMA.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Compositing constants — load-bearing for parity with the reference
# (forward.cu:361-377).
ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
NEAR_Z = 0.2

NUM_CHANNELS = 10          # rgb(3) + label/fg(2) + dir2d(3) + orient_conf(1) + depth(1)
PAD_CHANNELS = 16          # channel axis padded to a lane-friendly width
CH_DONE = 14               # tile-buffer channel holding the early-stop latch
CH_TRANS = 15              # tile-buffer channel holding the running transmittance

# feat-row layout inside a [8, chunk] feature chunk
F_GX, F_GY, F_CA, F_CB, F_CC, F_OP, F_VALID, F_PAD = range(8)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (part of jit cache keys)."""
    tile_w: int = 32
    tile_h: int = 32
    chunk: int = 256                # instances per kernel chunk (processed as
                                    # 128-wide sub-chunks in-kernel; 256
                                    # halves grid-step bookkeeping and
                                    # measured ~3 ms faster than 128 at bench
                                    # scale — tools/tpu_sweep_tiles.py; 16/24
                                    # px tiles and chunk 128 all lost)
    capacity: int | None = None     # max instances pre-alignment (None -> mult * P)
    capacity_mult: int = 8
    backend: str = "auto"           # auto | pallas | jnp
    cumsum_method: str = "matmul"   # matmul | scan (kernel-internal prefix op)
    bwd_matmul: str = "bf16x2"      # bf16x2 | highest: backward u/moments/
                                    # d_colT matmuls as 3-pass hi+lo-split
                                    # bf16 (see pallas_core._dot_split2)
                                    # instead of HIGHEST's 6 passes; parity
                                    # holds at the same p99.9 floor and it is
                                    # ~1.4 ms faster fwd+bwd
    sort_mode: str = "packed"       # packed | exact: "packed" quantizes depth
                                    # into one (tile | depth-bits) i32 key (2
                                    # sort operands instead of 3); ties at the
                                    # quantized precision break by gid exactly
                                    # like the CUDA stable radix sort's
                                    # expansion order.  "exact" keeps the full
                                    # f32 depth key (3 operands, the CUDA
                                    # bit-exact ordering).
    segment_chunks: int = 4096      # chunks per pallas_call segment: bounds
                                    # the SMEM scalar-prefetch arrays (a
                                    # single call crashed the worker at ~10k
                                    # chunks); <= 0 means one segment
    power_mode: str = "split3"      # split3 | matmul | vpu | split2: how the
                                    # per-(pixel, instance) Gaussian exponent
                                    # is evaluated.  "split3" (DEFAULT,
                                    # 2026-08-19) = hi+mid+lo coefficient
                                    # split against the bf16-EXACT
                                    # centered-integer basis (tiles <= 32;
                                    # see pallas_core._pixel_basis):
                                    # f32-grade (~2^-24), 3 MXU passes (half
                                    # of HIGHEST).  Hardware parity gate
                                    # PASSED at the r2 floor on the
                                    # 25px-sigma scene that fails split2
                                    # (fwd p99.9 <= 2.9e-3, grad p99.9 <=
                                    # 2.2e-3) and the train step runs 16.3
                                    # -> 18.2 it/s at 100k@960x544.
                                    # "matmul" = the same [PIX, 8] basis @
                                    # [8, CH] coefficient matmul at
                                    # Precision.HIGHEST (6 passes) — the
                                    # parity oracle.  "vpu" = exact f32
                                    # elementwise outer-difference quadratic
                                    # form (dx = gx - px by broadcast; no
                                    # cancellation, no MXU) — bit-accurate
                                    # but ~2 it/s slower than split3 (the
                                    # VPU elementwise quadratic costs more
                                    # than the K=8 matmuls).  "split2" =
                                    # 2-pass hi+lo coef split: parity FAILED
                                    # on hardware (fwd max 0.17 on
                                    # 25px-sigma tails — the coef 2^-17
                                    # error feeds exp) — same speed as
                                    # split3, NOT usable.
    fwd_acc: str = "bf16x2"         # bf16x2 | highest: forward feature-
                                    # compositing matmul w @ colT.  Operands
                                    # are O(1) (w in [0,1], colors in [0,1],
                                    # depth channel O(10)) so the bf16x2
                                    # 3-pass hi+lo split's ~1e-5 relative
                                    # error sits far below the compositing
                                    # parity floor.  Hardware parity gate
                                    # PASSED (2026-08-18: fwd p99.9 <=
                                    # 2.9e-3, grad p99.9 <= 2.2e-3 — the r2
                                    # floor); fwd-only rasterize 47.4 ->
                                    # 23.1 ms at 100k@960x544-uniform and
                                    # the full train step 17.08 -> 17.38
                                    # it/s, so it is the default.  "highest"
                                    # = 6-pass exact (the parity oracle).
    pair_cull: bool = False         # exact per-(gaussian, tile) opacity cull
                                    # at binning time: a pair whose MINIMUM
                                    # conic quadratic over the tile's pixel
                                    # rect exceeds 2 ln(255 op) has alpha <
                                    # 1/255 at every pixel, which both
                                    # kernels skip (forward.cu:366-368 /
                                    # backward.cu alpha test) — dropping it
                                    # is output- and gradient-exact while
                                    # cutting instance counts beyond the
                                    # exact-skip AABB (the AABB keeps the
                                    # ellipse's corner tiles; this removes
                                    # them).  Bits ride ONE extra integer
                                    # expansion chain; pairs whose row-major
                                    # rect index >= 31 (huge rects) are
                                    # conservatively kept.
    reduce_mode: str = "rowmajor"   # rowmajor | featmajor | scatter: how the
                                    # backward per-Gaussian segment reduction
                                    # recovers expansion order.  rowmajor
                                    # re-sorts (gid, slot) in the backward and
                                    # gathers [S, 16] rows; featmajor is the
                                    # same sort with the instance axis minor;
                                    # "scatter" carries the expansion slot as
                                    # an extra VALUE through the forward
                                    # binning sort (Binned.src) and replaces
                                    # the backward's 930k-element lax.sort
                                    # with a 4-byte/slot inverse-permutation
                                    # scatter + the same row gather.  All
                                    # three are bit-identical (a gaussian's
                                    # instances ascend by tile id in both
                                    # expansion and sorted order, so the
                                    # permutations coincide); pick by
                                    # measured time (tools/tpu_profile_r4).
    io_mode: str = "auto"           # auto | manual | outblock: how the
                                    # compositing kernels move tile-sized
                                    # blocks.  "outblock" uses Pallas output
                                    # pipelining with a scalar-prefetch-
                                    # driven (tof-indexed) block map.
                                    # "manual" keeps those buffers in HBM
                                    # (channel-major) and issues explicit
                                    # once-per-tile DMAs from VMEM scratch:
                                    # the r4h H-probe measured the out-block
                                    # machinery + manual payload DMA
                                    # *interaction* at ~18 ms / 3.6k chunks
                                    # (H_fixed 26.7 ms vs H_noout 8.7 ms at
                                    # 100k@960x544) — the dominant per-chunk
                                    # fixed cost; bench r5: 18.78 -> 20.53
                                    # it/s @100k, 2.398 -> 2.486 @1M.
                                    # "auto" (default) resolves to "manual"
                                    # compiled on TPU and "outblock" under
                                    # interpret (api._resolve_io) — manual's
                                    # DMA choreography is pure overhead in
                                    # interpret mode.
    pay_gather: str = "rows"        # rows | cm: payload materialization
                                    # layout.  "rows" gathers [S, 18] rows of
                                    # the per-Gaussian pack (each row lane-
                                    # padded to 128 by Mosaic/XLA tiling);
                                    # "cm" gathers along the MINOR axis of
                                    # the transposed [18, P] pack (18 logical
                                    # f32 per instance) and reshapes — the
                                    # same payload bytes, a different
                                    # gather-axis layout.  The r5d 1M
                                    # decomposition measured the row gather
                                    # at 92 ms of the 193 ms binning; pick by
                                    # bench A/B (bit-identical either way).
    step_chunks: int = 1            # chunks processed per KERNEL GRID STEP
                                    # (manual io_mode only; the outblock
                                    # path's per-chunk block maps can't be
                                    # grouped).  The r4h H-probe measured a
                                    # ~2.4 us/chunk skeleton floor (grid-step
                                    # bookkeeping + per-chunk DMA issue/wait)
                                    # even after manual IO removed the
                                    # out-block machinery; grouping G chunks
                                    # per step divides that floor by G while
                                    # keeping the tile CHUNK alignment at
                                    # cfg.chunk (the r5 chunk re-sweep showed
                                    # bigger ALIGNMENT loses by padding tiles
                                    # — this grows the step, not the
                                    # alignment).  Payload DMA moves G chunks
                                    # per copy; per-chunk early-exit and
                                    # flush logic are unrolled in-kernel.
    reduce_cumsum: str = "trimm"    # trimm | linear: the [cap, 16] inclusive
                                    # prefix-sum in the segment reduction.
                                    # "trimm" (default; r4f hardware-parity
                                    # gated and bench A/B winner at both 100k
                                    # and 1M scales) runs the within-block
                                    # prefix as a [512, 512] lower-triangular
                                    # matmul on the MXU (batched over blocks)
                                    # + an exclusive block-offset add — a
                                    # fixed deterministic summation order,
                                    # but a DIFFERENT association order than
                                    # the linear cumsum (values differ at f32
                                    # rounding, not bit-identical).

    @property
    def tile_pix(self) -> int:
        return self.tile_w * self.tile_h

    def grid(self, width: int, height: int) -> tuple[int, int]:
        gx = -(-width // self.tile_w)
        gy = -(-height // self.tile_h)
        return gx, gy

    def instance_capacity(self, num_points: int) -> int:
        cap = self.capacity if self.capacity is not None else self.capacity_mult * num_points
        return -(-cap // self.chunk) * self.chunk


class Binned(NamedTuple):
    """Chunk-aligned instance buffers consumed by the compositing backends."""
    payload: jnp.ndarray         # [TC, 24, CH]: rows 0..7 = feat (mean2,
                                 # conic3, opacity, valid, pad), rows 8..23 =
                                 # transposed 16-wide color payload.  One
                                 # fused array = one input DMA per kernel
                                 # step (two blocks measurably slow the
                                 # skipped-chunk path)
    tile_of_chunk: jnp.ndarray   # [TC] int32
    chunk_in_tile: jnp.ndarray   # [TC] int32 (0 marks first chunk of its tile)
    gid: jnp.ndarray             # [TC, CH] int32 source Gaussian per slot (P if
                                 # invalid); the key to the deterministic
                                 # segment reduction in the backward
    gauss_offset: jnp.ndarray    # [P] int32 exclusive prefix of tiles_touched
    gauss_count: jnp.ndarray     # [P] int32 tiles_touched
    num_rendered: jnp.ndarray    # scalar int32, pre-truncation instance count
    num_tiles: int               # static
    src: jnp.ndarray | None = None  # [TC, CH] int32 expansion slot per sorted
                                 # slot (cap if masked), carried through the
                                 # binning sort when reduce_mode="scatter" —
                                 # lets the backward invert the permutation
                                 # without re-sorting
    gauss_count_live: jnp.ndarray | None = None  # [P] int32 POST-pair-cull
                                 # instance count (None when pair_cull is
                                 # off): the (gid, slot)-sorted reduce's
                                 # segment lengths — culled pairs never
                                 # reach a chunk window, so gauss_count
                                 # would misalign every segment after the
                                 # first culled pair
    num_rendered_bound: jnp.ndarray | None = None  # scalar int32, batched
                                 # path only: B * max_b(count_b) — the value
                                 # overflow checks must compare against the
                                 # total capacity (capacity and truncation
                                 # are PER CAMERA in the [B, cap_b] layout).
                                 # num_rendered itself is the TRUE instance
                                 # total in both paths, so logging /
                                 # right-sizing consumers see the real count


class Preprocessed(NamedTuple):
    mean_pix: jnp.ndarray        # [P, 2]
    radius: jnp.ndarray          # [P] float (0 for culled)
    tiles_touched: jnp.ndarray   # [P] int32
    rect: tuple                  # (min_x, min_y, max_x, max_y) int32 [P]
    valid: jnp.ndarray           # [P] bool after all culling


def cov2d_from_conic(conic: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Recover the packed 2D covariance from a conic exactly as the CUDA
    preprocess does (forward.cu:240-248).  Returns (cov2d [P, 3], det_ok [P])."""
    det_inv = conic[:, 0] * conic[:, 2] - conic[:, 1] ** 2
    det_ok = det_inv != 0.0
    det = 1.0 / jnp.where(det_ok, det_inv, 1.0)
    cov = jnp.stack([conic[:, 2], -conic[:, 1], conic[:, 0]], axis=-1) * det[:, None]
    return cov, det_ok


def preprocess(mean_pix: jnp.ndarray, conic: jnp.ndarray, depth: jnp.ndarray,
               valid_in: jnp.ndarray, width: int, height: int,
               cfg: RasterConfig, opacity: jnp.ndarray | None = None
               ) -> Preprocessed:
    """Per-Gaussian culling / radius / tile-rect (forward.cu:155-282).

    All inputs are expected stop-gradiented by the caller; this function is
    pure bookkeeping.

    With ``opacity`` given, the binned tile rect shrinks from the CUDA 3-sigma
    box to the *exact-skip* radius sigma*sqrt(2 ln(255 op)): every pixel
    outside it has alpha = op exp(-d^2/2) < 1/255 and is skipped by the
    compositing kernel in BOTH directions (forward.cu:366-368 `if (alpha <
    1/255) continue`, same test recomputed in backward.cu), so dropping those
    instances is output- and gradient-exact while cutting the instance count
    (e.g. 4.8x in covered area at the post-reset opacity 0.01).  The reported
    ``radius`` keeps the reference's 3-sigma value and opacity-independent
    culling semantics (it feeds max_radii2D / visibility stats).
    """
    gx_grid, gy_grid = cfg.grid(width, height)
    cov2d, det_ok = cov2d_from_conic(conic)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    sqrt_d = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam_max = jnp.maximum(mid + sqrt_d, mid - sqrt_d)
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    valid = valid_in & det_ok & (depth > NEAR_Z)

    px, py = mean_pix[:, 0], mean_pix[:, 1]

    def rect(r):
        rmin_x = jnp.clip(((px - r) / cfg.tile_w).astype(jnp.int32), 0, gx_grid)
        rmin_y = jnp.clip(((py - r) / cfg.tile_h).astype(jnp.int32), 0, gy_grid)
        rmax_x = jnp.clip(((px + r + cfg.tile_w - 1) / cfg.tile_w).astype(jnp.int32), 0, gx_grid)
        rmax_y = jnp.clip(((py + r + cfg.tile_h - 1) / cfg.tile_h).astype(jnp.int32), 0, gy_grid)
        return rmin_x, rmin_y, rmax_x, rmax_y

    rect3 = rect(radius)
    area3 = (rect3[2] - rect3[0]) * (rect3[3] - rect3[1])

    if opacity is not None:
        # alpha >= 1/255 iff d_conic^2 <= 2 ln(255 op); radius scales by
        # sqrt(2 ln(255 op)) / 3, clamped to [0, 1] (op <= 1/255 -> empty)
        fac2 = 2.0 * jnp.log(jnp.maximum(opacity[:, 0], 1e-12) * 255.0) / 9.0
        bin_radius = radius * jnp.sqrt(jnp.clip(fac2, 0.0, 1.0))
        bin_rect = rect(bin_radius)
        bin_area = (bin_rect[2] - bin_rect[0]) * (bin_rect[3] - bin_rect[1])
    else:
        bin_rect, bin_area = rect3, area3

    bin_valid = valid & (bin_area > 0)
    tiles_touched = jnp.where(bin_valid, bin_area, 0).astype(jnp.int32)
    # reference radii semantics: 0 only for geometric culls (opacity plays no
    # part in preprocessCUDA's rect test)
    radius = jnp.where(valid & (area3 > 0), radius, 0.0)
    return Preprocessed(mean_pix, radius, tiles_touched, bin_rect, bin_valid)


# Static per-axis extent of the pair-cull bit window: tiles at rect positions
# (r, q) with r < _CULL_RQ, q < _CULL_RQ and row-major index q*rect_w + r < 31
# get an exact cull bit; everything beyond is conservatively kept.  6x6 covers
# every rect the exact-skip radius produces at bench scale (avg ~7 tiles).
_CULL_RQ = 6
_CULL_MARGIN = 1e-3  # q-units (~5e-4 in the exponent): the kernels evaluate
                     # the quadratic via split3 matmuls (~1e-5 absolute); the
                     # margin keeps borderline alpha = 1/255 pixels culled
                     # only when they are provably below threshold


def _min_quad_rect(a, b, c, lx, ux, ly, uy):
    """Exact minimum of q(dx, dy) = a dx^2 + c dy^2 + 2 b dx dy over the box
    [lx, ux] x [ly, uy], valid for ANY quadratic (convex, saddle, concave):
    the min is at the mean (q=0, iff 0 is inside the box), at a corner, or at
    a 1-D edge vertex (only a true edge-min when that edge's leading
    coefficient is positive — otherwise the edge min is at a corner, which is
    already a candidate)."""
    def q(dx, dy):
        return a * dx * dx + c * dy * dy + 2.0 * b * dx * dy

    inf = jnp.float32(jnp.inf)
    cands = [q(lx, ly), q(lx, uy), q(ux, ly), q(ux, uy)]
    # vertical edges (dx fixed): vertex dy* = -b dx / c
    safe_c = jnp.where(c > 1e-12, c, 1.0)
    for dx in (lx, ux):
        dys = jnp.clip(-b * dx / safe_c, ly, uy)
        cands.append(jnp.where(c > 1e-12, q(dx, dys), inf))
    # horizontal edges (dy fixed): vertex dx* = -b dy / a
    safe_a = jnp.where(a > 1e-12, a, 1.0)
    for dy in (ly, uy):
        dxs = jnp.clip(-b * dy / safe_a, lx, ux)
        cands.append(jnp.where(a > 1e-12, q(dxs, dy), inf))
    # the mean itself (q = 0): inside the box the min can't exceed 0
    inside = (lx <= 0.0) & (0.0 <= ux) & (ly <= 0.0) & (0.0 <= uy)
    cands.append(jnp.where(inside, 0.0, inf))
    out = cands[0]
    for v in cands[1:]:
        out = jnp.minimum(out, v)
    return out


def pair_cull_bits(mean_pix, conic, opacity, rect, cfg: RasterConfig):
    """[P] int32 bitmask: bit (q * rect_w + r) set iff the tile at rect
    position (r, q) provably receives alpha < 1/255 from this gaussian at
    every pixel (so both kernels skip it and the pair can be dropped
    exactly).  Pure bookkeeping — inputs are treated as constants."""
    mean_pix = jax.lax.stop_gradient(mean_pix)
    conic = jax.lax.stop_gradient(conic)
    opacity = jax.lax.stop_gradient(opacity)
    rmin_x, rmin_y, rmax_x, rmax_y = rect
    rect_w = jnp.maximum(rmax_x - rmin_x, 1).astype(jnp.int32)
    gx, gy = mean_pix[:, 0], mean_pix[:, 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    # alpha >= 1/255 iff q <= 2 ln(255 op)
    tau = 2.0 * jnp.log(jnp.maximum(opacity[:, 0], 1e-12) * 255.0)
    bits = jnp.zeros(mean_pix.shape[0], jnp.int32)
    for qi in range(_CULL_RQ):
        for ri in range(_CULL_RQ):
            tx = rmin_x + ri
            ty = rmin_y + qi
            in_rect = (tx < rmax_x) & (ty < rmax_y)
            # continuous pixel box (integer pixel coords span
            # [t*tile, t*tile + tile - 1]); dx = gx - px
            x0 = (tx * cfg.tile_w).astype(jnp.float32)
            y0 = (ty * cfg.tile_h).astype(jnp.float32)
            minq = _min_quad_rect(a, b, c,
                                  gx - (x0 + cfg.tile_w - 1), gx - x0,
                                  gy - (y0 + cfg.tile_h - 1), gy - y0)
            kap = qi * rect_w + ri
            cull = in_rect & (minq > tau + _CULL_MARGIN) & (kap < 31)
            bits = bits | jnp.where(cull,
                                    jnp.left_shift(1, jnp.minimum(kap, 30)),
                                    0)
    return bits


def bin_instances(pre: Preprocessed, mean_pix: jnp.ndarray, conic: jnp.ndarray,
                  opacity: jnp.ndarray, colors: jnp.ndarray, depth: jnp.ndarray,
                  width: int, height: int, cfg: RasterConfig,
                  n_batch: int = 1) -> Binned:
    """Expand Gaussians into depth-sorted, tile-grouped, chunk-aligned
    instance buffers.

    The gathers of (mean, conic, opacity, colors) into instance slots are the
    only differentiable operations here; their autodiff transpose is the
    deterministic scatter-add that replaces the CUDA backward's atomics.

    With ``n_batch`` > 1 the [P] axis is a flattened batch of ``n_batch``
    cameras' Gaussians (camera b owns rows [b*P/n_batch, (b+1)*P/n_batch));
    each camera's instances get their tile ids offset by b * tiles-per-image,
    producing one depth-sorted instance stream over a virtual grid of
    ``n_batch * gx * gy`` tiles — the batched-camera step composites every
    camera in a single kernel sweep.  Kernels recover camera-local tile
    coordinates via (tile // gx) % gy.
    """
    p = pre.mean_pix.shape[0]
    cap = cfg.instance_capacity(p)
    gx_grid, gy_grid = cfg.grid(width, height)
    num_tiles = n_batch * gx_grid * gy_grid
    ch = cfg.chunk

    rmin_x, rmin_y, rmax_x, rmax_y = pre.rect
    # computed in camera-local tile coords, BEFORE the batched row shift
    cull_bits = (pair_cull_bits(mean_pix, conic, opacity, pre.rect, cfg)
                 if cfg.pair_cull else None)
    if n_batch > 1:
        # shift each camera's tile rows into its slice of the virtual grid
        assert p % n_batch == 0
        row_base = jnp.broadcast_to(
            (jnp.arange(n_batch, dtype=jnp.int32) * gy_grid)[:, None],
            (n_batch, p // n_batch)).reshape(p)
        rmin_y = rmin_y + row_base
        return _bin_instances_batched(
            pre, mean_pix, conic, opacity, colors, depth, width, height, cfg,
            n_batch, (rmin_x, rmin_y, rmax_x, rmax_y), cull_bits)
    offsets = (jnp.cumsum(pre.tiles_touched)
               - pre.tiles_touched).astype(jnp.int32)              # exclusive
    total = offsets[-1] + pre.tiles_touched[-1]

    # --- duplicateWithKeys (rasterizer_impl.cu:70-111), static capacity ---
    # Expansion with NO per-instance gathers: every per-Gaussian quantity
    # expands [P] -> [cap] by a scatter of value DELTAS at segment starts
    # followed by an i32 cumsum (deltas telescope, so position i in gaussian
    # g's range recovers vals[g] exactly; zero-count gaussians' deltas
    # collide at the next start and scatter-ADD collapses them).  ~2.2x
    # faster than the previous scatter-max/cummax + [cap, 4] row-gather
    # (tools/tpu_profile_r3b.py A_expansion_*: 12.6 -> 5.6 ms at bench
    # scale).  Everything stays in the INTEGER domain — small ints through
    # f32 bitcasts get denormal-flushed on TPU (see the gid note below).
    iota_p = jnp.arange(p, dtype=jnp.int32)
    iota_cap = jnp.arange(cap, dtype=jnp.int32)

    def expand_i32(vals):
        vals = vals.astype(jnp.int32)
        d = vals - jnp.roll(vals, 1).at[0].set(0)
        return jnp.cumsum(jnp.zeros(cap, jnp.int32).at[offsets].add(
            d, mode="drop"))

    rect_w = jnp.maximum(rmax_x - rmin_x, 1).astype(jnp.int32)
    # pack (rect_w, rmin_x, rmin_y) into one i32 chain when the static bit
    # widths fit; field widths come from the grid dims so the chain is exact
    bw = max(int(gx_grid).bit_length(), 1)
    by = max(int(n_batch * gy_grid).bit_length(), 1)
    if 2 * bw + by <= 31:
        geo = (rect_w << (bw + by)) | (rmin_x.astype(jnp.int32) << by) \
            | rmin_y.astype(jnp.int32)
        geo_i = expand_i32(geo)
        rw = geo_i >> (bw + by)
        rx = (geo_i >> by) & ((1 << bw) - 1)
        ry = geo_i & ((1 << by) - 1)
    else:  # huge grids: two chains
        geo_i = expand_i32((rect_w << bw) | rmin_x.astype(jnp.int32))
        rw = geo_i >> bw
        rx = geo_i & ((1 << bw) - 1)
        ry = expand_i32(rmin_y)
    off_i = expand_i32(offsets)
    gid = expand_i32(iota_p)
    inst_valid = iota_cap < total
    within = iota_cap - off_i
    # integer div/mod by a VECTOR divisor is emulated (slow) on TPU; the
    # +0.5 float trick is exact for within < 2^23, rect_w <= grid width
    q = jnp.floor((within.astype(jnp.float32) + 0.5)
                  / rw.astype(jnp.float32)).astype(jnp.int32)
    tile_x = rx + (within - q * rw)
    tile_y = ry + q
    tile_id = jnp.where(inst_valid, tile_y * gx_grid + tile_x, num_tiles).astype(jnp.int32)
    if cull_bits is not None:
        # culled pairs take the sentinel tile: the sort pushes them past
        # every real tile and searchsorted's counts exclude them, so they
        # cost no kernel chunks (capacity/num_rendered stay PRE-cull — the
        # expansion buffer still holds every pair)
        bits_i = expand_i32(cull_bits)
        culled = (within < 31) & (
            ((bits_i >> jnp.minimum(within, 30)) & 1) == 1)
        tile_id = jnp.where(culled, num_tiles, tile_id)
    cnt_live = None
    if cull_bits is not None:
        ncull = jax.lax.population_count(cull_bits)
        cnt_live = (pre.tiles_touched
                    - jnp.where(pre.tiles_touched > 0, ncull, 0)
                    ).astype(jnp.int32)

    # --- the radix sort: (tile, depth, gid) lexicographic, like the stable
    # CUDA sort on (tile << 32 | depth-bits).  gid as the trailing KEY both
    # totally orders the instances (a gaussian appears at most once per tile,
    # and the CUDA stable order for equal (tile, depth) is expansion order =
    # gid order) and makes gid directly available per sorted position —
    # recovering it afterwards (gid[orig_sorted[src]]) cost ~5 ms of chained
    # element gathers at bench scale.
    #
    # sort_mode="packed": tile and depth share ONE i32 key — tile in the top
    # ceil(log2(num_tiles+1)) bits, the remaining bits hold the high bits of
    # the depth's f32 bit pattern (monotone for positive floats; depth >
    # NEAR_Z > 0 by the preprocess cull).  Sort operands drop 3 -> 2, which
    # is most of the sort's cost on TPU; depths equal at the quantized
    # precision (>= 20 mantissa+exponent bits here) tie-break by gid, the
    # same deterministic order the CUDA stable radix gives exact ties. ---
    # depth rides the expansion as its (monotone, for positives) f32 bit
    # pattern — depth > NEAR_Z > 0 for every gaussian that owns instances
    dbits_i = expand_i32(
        jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32))
    # reduce_mode="scatter": the expansion slot index rides the sort as a
    # VALUE, so the backward can invert the binning permutation with one i32
    # scatter instead of re-sorting (gid stays a key: the CUDA stable order)
    carry_src = cfg.reduce_mode == "scatter"
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    if cfg.sort_mode == "packed" and tile_bits <= 11:
        depth_bits = 31 - tile_bits
        # positive f32 -> monotone nonneg i32; invalid -> the max bucket
        dq = jnp.where(inst_valid, dbits_i, jnp.int32(0x7F800000)) >> (31 - depth_bits)
        dq = jnp.clip(dq, 0, (1 << depth_bits) - 1)
        key = tile_id * (1 << depth_bits) + dq
        if carry_src:
            key_sorted, gid_sorted, src_sorted = jax.lax.sort(
                (key, gid, iota_cap), num_keys=2)
        else:
            key_sorted, gid_sorted = jax.lax.sort((key, gid), num_keys=2)
        tile_sorted = key_sorted >> depth_bits
        search_keys = jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits
        bounds = jnp.searchsorted(key_sorted, search_keys)
    else:
        inst_depth = jnp.where(
            inst_valid,
            jax.lax.bitcast_convert_type(dbits_i, jnp.float32), jnp.inf)
        if carry_src:
            tile_sorted, _, gid_sorted, src_sorted = jax.lax.sort(
                (tile_id, inst_depth, gid, iota_cap), num_keys=3)
        else:
            tile_sorted, _, gid_sorted = jax.lax.sort(
                (tile_id, inst_depth, gid), num_keys=3)
        bounds = jnp.searchsorted(tile_sorted,
                                  jnp.arange(num_tiles + 1, dtype=jnp.int32))

    # --- identifyTileRanges -> chunk-aligned layout ---
    # per-tile counts from the SORTED keys via binary search (a scatter
    # histogram here costs ~20ms on TPU; two searchsorted passes are ~free)
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    tile_start = bounds[:-1].astype(jnp.int32)                     # packed starts
    return _chunk_layout(pre, mean_pix, conic, opacity, colors, counts,
                         tile_start, gid_sorted,
                         src_sorted if carry_src else None,
                         offsets, total, p, cap, ch, num_tiles,
                         cnt_live, pay_cm=cfg.pay_gather == "cm")


def _chunk_layout(pre, mean_pix, conic, opacity, colors, counts, tile_start,
                  gid_sorted, src_sorted, gauss_offset, total, p, cap, ch,
                  num_tiles, cnt_live=None, total_bound=None,
                  pay_cm=False) -> Binned:
    """Shared chunk-aligned layout + payload materialization: sorted streams
    (flat [>= cap]) -> Binned.  ``tile_start`` holds each tile's position in
    the flat sorted stream (per-camera base included in the batched path)."""
    nchunks = jnp.maximum(1, -(-counts // ch))
    chunk_start = jnp.cumsum(nchunks) - nchunks                    # chunk index per tile
    total_chunks = cap // ch + num_tiles                           # static upper bound

    chunk_ids = jnp.arange(total_chunks, dtype=jnp.int32)
    tile_of_chunk = jnp.searchsorted(chunk_start, chunk_ids, side="right").astype(jnp.int32) - 1
    tile_of_chunk = jnp.clip(tile_of_chunk, 0, num_tiles - 1)
    chunk_in_tile = chunk_ids - chunk_start[tile_of_chunk]

    # Per-CHUNK bookkeeping gathered from tiny [T]-tables and broadcast to
    # slots — per-SLOT gathers of the same data cost ~5 ms at bench scale
    # (S-sized random ELEMENT gathers are the dominant binning cost on TPU).
    cinfo = jnp.stack([counts, tile_start], axis=-1)[tile_of_chunk]  # [TC, 2]
    lane = jnp.arange(ch, dtype=jnp.int32)[None, :]
    off_in_tile = chunk_in_tile[:, None] * ch + lane                 # [TC, CH]
    slot_ok = off_in_tile < cinfo[:, 0:1]

    # --- slot materialization: gid windows, then ONE row gather ---
    # Every chunk fetches its contiguous ch-wide gid window at tile_start +
    # k*ch (vmapped dynamic_slice over the sorted gid stream — cheap), masks
    # the tail slots that belong to the next tile to gid = P, and then a
    # single [TC*ch]-row gather of the 18 REAL payload columns (the 6
    # always-zero colT pad rows are appended after the gather) materializes
    # the kernel payload.  Indexing the zero pad row P for masked slots
    # zeroes opacity AND the valid column, so masked slots contribute
    # nothing in the kernels.  (tools/tpu_profile_r3b.py A_payload_*:
    # 22.2 -> 19.8 ms for the rowgather shape, minus the pad columns.)
    #
    # gid stays in the INTEGER domain end to end: an earlier version rode it
    # through the payload as an i32->f32 bitcast column, which silently
    # zeroed most ids on hardware (ids < 2^23 are f32 DENORMALS and the TPU
    # flushes them somewhere in the copy chain) — forward parity held but
    # every gradient was misattributed (round-3 regression, caught by
    # tools/tpu_parity_check.py grad p99.9 ~0.5).
    starts = jnp.minimum(cinfo[:, 1] + chunk_in_tile * ch, cap)
    gid_pad = jnp.concatenate([gid_sorted,
                               jnp.full((ch,), p, jnp.int32)])
    gid_win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(gid_pad, (s,), (ch,)))(starts)
    gid_slot = jnp.where(slot_ok, gid_win, p).astype(jnp.int32)      # [TC, ch]

    src_slot = None
    if src_sorted is not None:
        # masked tail slots (slot_ok false) duplicate the NEXT tile's sorted
        # positions, so they must scatter out of range (cap = dropped) — the
        # true owner chunk writes those expansion slots
        src_pad = jnp.concatenate([src_sorted,
                                   jnp.full((ch,), cap, jnp.int32)])
        src_win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(src_pad, (s,), (ch,)))(starts)
        src_slot = jnp.where(slot_ok, src_win, cap).astype(jnp.int32)

    ncol = 8 + colors.shape[1]                                       # 18
    pack = jnp.concatenate([
        mean_pix, conic, opacity,
        jnp.ones((p, 1), mean_pix.dtype), jnp.zeros((p, 1), mean_pix.dtype),
        colors,
    ], axis=-1)                                                      # [P, ncol]
    pack = jnp.pad(pack, ((0, 1), (0, 0)))                           # row P = 0
    if pay_cm:
        # channel-major gather: 18 logical f32 per instance along the minor
        # axis of [ncol, P+1] instead of [S, ncol] rows lane-padded to 128
        # (see RasterConfig.pay_gather); identical payload bytes
        tc_n = gid_slot.shape[0]
        cols_g = jnp.take(pack.T, gid_slot.reshape(-1), axis=1)      # [ncol, S]
        rows_t = cols_g.reshape(ncol, tc_n, ch).transpose(1, 0, 2)   # [TC, ncol, ch]
    else:
        rows_t = pack[gid_slot].swapaxes(1, 2)                       # [TC, ncol, ch]
    payload = jnp.pad(rows_t,
                      ((0, 0), (0, 8 + PAD_CHANNELS - ncol), (0, 0)))

    # chunks past the last real one (static capacity headroom) are marked -1
    # AFTER the slot math: the kernels treat them as permanently skipped
    # instead of attributing them to the last tile (which would run full
    # compute on empty slots whenever that tile is unsaturated)
    used_chunks = chunk_start[-1] + nchunks[-1]
    chunk_in_tile = jnp.where(chunk_ids < used_chunks, chunk_in_tile, -1)

    return Binned(payload=payload, tile_of_chunk=tile_of_chunk,
                  chunk_in_tile=chunk_in_tile,
                  gid=gid_slot.reshape(total_chunks, ch),
                  gauss_offset=gauss_offset.astype(jnp.int32),
                  gauss_count=pre.tiles_touched,
                  num_rendered=total.astype(jnp.int32), num_tiles=num_tiles,
                  src=src_slot, gauss_count_live=cnt_live,
                  num_rendered_bound=(None if total_bound is None
                                      else total_bound.astype(jnp.int32)))


def _bin_instances_batched(pre, mean_pix, conic, opacity, colors, depth,
                           width, height, cfg: RasterConfig, n_batch: int,
                           rect, cull_bits=None) -> Binned:
    """Batched-camera binning: per-camera SEGMENTED expansion and sort.

    The flattened [B*P] layout sorted as one stream made the batched step's
    sort superlinear in B (measured: B=4 cost 4.75x the B=1 step, defeating
    the amortization rasterize_batched promises).  Here each camera owns a
    chunk-aligned slice of the instance buffer ([B, cap_b]) and
    ``jax.lax.sort`` sorts the B slices INDEPENDENTLY along the last axis —
    per-camera cost identical to single-camera, perfectly linear in B.  Tile
    ids stay global (camera b's rows shifted by b*gy, see bin_instances), so
    the concatenated per-camera sorted streams feed the same chunk layout and
    kernels.

    num_rendered is the TRUE total instance count (sum over cameras) so
    logging / occupancy / right-sizing consumers see the real statistic;
    overflow checks must use num_rendered_bound = B * max_b(count_b),
    because capacity and truncation are PER CAMERA under this layout.
    """
    p = pre.mean_pix.shape[0]
    pb = p // n_batch
    gx_grid, gy_grid = cfg.grid(width, height)
    tpc = gx_grid * gy_grid                     # tiles per camera
    num_tiles = n_batch * tpc
    ch = cfg.chunk
    capb = -(-cfg.instance_capacity(p) // (n_batch * ch)) * ch
    cap = capb * n_batch
    rmin_x, rmin_y, rmax_x, rmax_y = rect

    tt2 = pre.tiles_touched.reshape(n_batch, pb)
    off2 = (jnp.cumsum(tt2, axis=1) - tt2).astype(jnp.int32)     # per-camera
    totals = off2[:, -1] + tt2[:, -1]                            # [B]
    base = jnp.cumsum(totals) - totals                           # contiguous
    iota_capb = jnp.broadcast_to(jnp.arange(capb, dtype=jnp.int32)[None, :],
                                 (n_batch, capb))

    def expand2(vals):
        """[P]-like -> [B, capb] via per-camera delta scatter + row cumsum
        (the expand_i32 trick, batched)."""
        vals = vals.astype(jnp.int32).reshape(n_batch, pb)
        d = vals - jnp.roll(vals, 1, axis=1).at[:, 0].set(0)
        scat = jax.vmap(
            lambda z, o, dd: z.at[o].add(dd, mode="drop"))(
                jnp.zeros((n_batch, capb), jnp.int32), off2, d)
        return jnp.cumsum(scat, axis=1)

    rect_w = jnp.maximum(rmax_x - rmin_x, 1).astype(jnp.int32)
    bw = max(int(gx_grid).bit_length(), 1)
    by = max(int(n_batch * gy_grid).bit_length(), 1)
    if 2 * bw + by <= 31:
        geo = (rect_w << (bw + by)) | (rmin_x.astype(jnp.int32) << by) \
            | rmin_y.astype(jnp.int32)
        geo_i = expand2(geo)
        rw = geo_i >> (bw + by)
        rx = (geo_i >> by) & ((1 << bw) - 1)
        ry = geo_i & ((1 << by) - 1)
    else:
        geo_i = expand2((rect_w << bw) | rmin_x.astype(jnp.int32))
        rw = geo_i >> bw
        rx = geo_i & ((1 << bw) - 1)
        ry = expand2(rmin_y)
    off_i = expand2(off2.reshape(p))
    gid = expand2(jnp.arange(p, dtype=jnp.int32))
    inst_valid = iota_capb < totals[:, None]
    within = iota_capb - off_i
    q = jnp.floor((within.astype(jnp.float32) + 0.5)
                  / rw.astype(jnp.float32)).astype(jnp.int32)
    tile_x = rx + (within - q * rw)
    tile_y = ry + q
    tile_id = jnp.where(inst_valid, tile_y * gx_grid + tile_x,
                        num_tiles).astype(jnp.int32)
    if cull_bits is not None:
        bits_i = expand2(cull_bits)
        culled = (within < 31) & (
            ((bits_i >> jnp.minimum(within, 30)) & 1) == 1)
        tile_id = jnp.where(culled, num_tiles, tile_id)

    dbits_i = expand2(
        jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32))
    carry_src = cfg.reduce_mode == "scatter"
    # src carries CONTIGUOUS global expansion indices so gauss_offset (the
    # contiguous cumsum) stays the segment key for every reduce_mode
    src_iota = base[:, None] + iota_capb
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    cam_rows = jnp.arange(n_batch, dtype=jnp.int32)[:, None]
    if cfg.sort_mode == "packed" and tile_bits <= 11:
        depth_bits = 31 - tile_bits
        dq = jnp.where(inst_valid, dbits_i,
                       jnp.int32(0x7F800000)) >> (31 - depth_bits)
        dq = jnp.clip(dq, 0, (1 << depth_bits) - 1)
        key = tile_id * (1 << depth_bits) + dq
        # lax.sort sorts each leading-axis slice independently: B per-camera
        # sorts in one op, no cross-camera key traffic
        if carry_src:
            key_sorted, gid_sorted, src_sorted = jax.lax.sort(
                (key, gid, src_iota), num_keys=2, dimension=1)
        else:
            key_sorted, gid_sorted = jax.lax.sort((key, gid), num_keys=2,
                                                  dimension=1)
            src_sorted = None
        search = (jnp.arange(tpc + 1, dtype=jnp.int32)[None, :]
                  + cam_rows * tpc) << depth_bits
        bounds = jax.vmap(jnp.searchsorted)(key_sorted, search)  # [B, tpc+1]
    else:
        inst_depth = jnp.where(
            inst_valid,
            jax.lax.bitcast_convert_type(dbits_i, jnp.float32), jnp.inf)
        if carry_src:
            tile_sorted, _, gid_sorted, src_sorted = jax.lax.sort(
                (tile_id, inst_depth, gid, src_iota), num_keys=3, dimension=1)
        else:
            tile_sorted, _, gid_sorted = jax.lax.sort(
                (tile_id, inst_depth, gid), num_keys=3, dimension=1)
            src_sorted = None
        search = (jnp.arange(tpc + 1, dtype=jnp.int32)[None, :]
                  + cam_rows * tpc)
        bounds = jax.vmap(jnp.searchsorted)(tile_sorted, search)

    counts = (bounds[:, 1:] - bounds[:, :-1]).astype(jnp.int32).reshape(
        num_tiles)
    tile_start = (bounds[:, :-1].astype(jnp.int32)
                  + cam_rows * capb).reshape(num_tiles)
    gauss_offset = (off2 + base[:, None]).reshape(p)             # contiguous
    total = jnp.sum(totals)                                      # true count
    total_bound = n_batch * jnp.max(totals)      # per-camera overflow bound
    cnt_live = None
    if cull_bits is not None:
        ncull = jax.lax.population_count(cull_bits)
        cnt_live = (pre.tiles_touched
                    - jnp.where(pre.tiles_touched > 0, ncull, 0)
                    ).astype(jnp.int32)
    return _chunk_layout(pre, mean_pix, conic, opacity, colors, counts,
                         tile_start, gid_sorted.reshape(cap),
                         src_sorted.reshape(cap) if carry_src else None,
                         gauss_offset, total, p, cap, ch, num_tiles,
                         cnt_live, total_bound=total_bound,
                         pay_cm=cfg.pay_gather == "cm")


def assemble_image(tile_buf: jnp.ndarray, bg: jnp.ndarray, width: int,
                   height: int, cfg: RasterConfig):
    """tile_buf [T, PIX, 16] -> (image [10, H, W], final_T [H, W]).

    Blends the background exactly like forward.cu:397-398:
    out = C + T_final * bg.
    """
    gx_grid, gy_grid = cfg.grid(width, height)
    t_final = tile_buf[:, :, CH_TRANS]
    img = tile_buf[:, :, :NUM_CHANNELS] + t_final[:, :, None] * bg[None, None, :NUM_CHANNELS]
    img = img.reshape(gy_grid, gx_grid, cfg.tile_h, cfg.tile_w, NUM_CHANNELS)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        NUM_CHANNELS, gy_grid * cfg.tile_h, gx_grid * cfg.tile_w)
    t_final = t_final.reshape(gy_grid, gx_grid, cfg.tile_h, cfg.tile_w)
    t_final = t_final.transpose(0, 2, 1, 3).reshape(
        gy_grid * cfg.tile_h, gx_grid * cfg.tile_w)
    return img[:, :height, :width], t_final[:height, :width]
