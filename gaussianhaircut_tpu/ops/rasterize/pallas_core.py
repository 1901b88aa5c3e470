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

Grid = one step per chunk (tiles own consecutive chunks), split into
segments of cfg.segment_chunks pallas_calls to bound SMEM scalar-prefetch
growth; the payload is streamed by a MANUAL double-buffered DMA so chunks
skipped by the early-exit vote cost no memory traffic at all; running tile
state lives in VMEM scratch and crosses segment boundaries through small
carry arrays.  Chunks larger than 128 instances are processed as in-kernel
128-wide sub-chunks.
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


def _subchunk(cfg: C.RasterConfig) -> int:
    """In-kernel math granularity: chunks larger than 128 instances are
    processed as a sequence of 128-wide sub-chunks (VMEM temporaries and the
    triangular prefix matmul stay 128-wide)."""
    sub = min(cfg.chunk, 128)
    assert cfg.chunk % sub == 0, f"chunk {cfg.chunk} not a multiple of {sub}"
    return sub


def _tri_incl(ch: int) -> np.ndarray:
    """Upper-triangular (incl. diagonal) ones: x @ U = inclusive prefix sum
    along the instance axis."""
    return np.triu(np.ones((ch, ch), np.float32))


def _half(cfg: C.RasterConfig) -> tuple[int, int]:
    """Tile-center offset for the CENTERED pixel basis."""
    return cfg.tile_w // 2, cfg.tile_h // 2


def _pixel_basis(cfg: C.RasterConfig):
    """[PIX, 8] polynomial basis (px^2, py^2, px*py, px, py, 1, 0, 0) in
    CENTERED tile-local pixel coordinates (px - tile_w/2 in [-16, 16) for
    the default 32-tile).

    Local (not absolute) coordinates keep every matmul operand small: with
    absolute coords the quadratic coefficients reach ~1e4 and the MXU's
    bf16-elevated f32 products lose ~0.1-50 in the exponent (observed as a
    deterministic mis-render / exp-overflow NaN on hardware).  CENTERED
    integer coordinates additionally make every basis entry an integer of
    magnitude <= 256 for tiles up to 32px — EXACT in bf16 — so matmuls
    against the basis need to split only the other operand (2 bf16 passes
    instead of HIGHEST's 6 / both-split's 3)."""
    pix = cfg.tile_pix
    hx, hy = _half(cfg)
    i = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (i % cfg.tile_w).astype(_F32) - float(hx)
    py = (i // cfg.tile_w).astype(_F32) - float(hy)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, one, zero, zero], axis=1)


def _basis_exact_bf16(cfg: C.RasterConfig) -> bool:
    """True when every _pixel_basis entry is exactly representable in bf16
    (integers of magnitude <= 256, i.e. centered tiles up to 32x32)."""
    hx, hy = _half(cfg)
    return max(cfg.tile_w - hx, hx) * max(cfg.tile_h - hy, hy) <= 256


_POWER_MODES = ("matmul", "vpu", "split2", "split3")


def _resolve_power_mode(cfg: C.RasterConfig) -> str:
    """Validated power mode for this config.  split2/split3 rely on the
    centered-integer pixel basis being bf16-EXACT (tiles <= 32); for larger
    tiles the bf16 basis cast would silently corrupt the Gaussian exponent,
    so those modes fall back to the HIGHEST 6-pass matmul path (the same
    guard the backward moments path applies per-dot)."""
    mode = cfg.power_mode
    if mode not in _POWER_MODES:
        raise ValueError(
            f"unknown power_mode: {mode!r} (expected one of {_POWER_MODES})")
    if mode in ("split2", "split3") and not _basis_exact_bf16(cfg):
        return "matmul"
    return mode


def _coef_matrix(feat, tile_x0, tile_y0, half_x=0, half_y=0):
    """[8, CH] per-instance quadratic coefficients matching `_pixel_basis`
    (both in centered tile-local coordinates: gx/gy are shifted by the tile
    origin plus the tile half-size).

    power(px, py) = -0.5 a dx^2 - 0.5 c dy^2 - b dx dy with dx = gx - px.
    """
    gx = feat[C.F_GX:C.F_GX + 1, :] - (tile_x0.astype(_F32) + half_x)
    gy = feat[C.F_GY:C.F_GY + 1, :] - (tile_y0.astype(_F32) + half_y)
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


def _split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_split2(a, b, dims=None):
    """f32 matmul as THREE bf16 MXU passes on hi+lo splits of BOTH operands
    (hi*hi + hi*lo + lo*hi; lo*lo is ~2^-32 relative, below f32 rounding).
    ~1e-5 relative per product vs HIGHEST's 6-pass ~6e-8 — fine for the
    backward's u/moments/d_colT gradient matmuls (parity-gated on hardware:
    grad p99.9 stays under the 5e-3 gate; plain bf16's 4e-3 per-product
    error failed it at 2.2e-2), NOT for the forward `power` matmul whose
    absolute error feeds exp()."""
    ah, al = _split2(a)
    bh, bl = _split2(b)
    if dims is None:
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    else:
        d = lambda x, y: jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _dot_split2_lhs(a, b_exact, dims=None):
    """f32 matmul as TWO bf16 MXU passes: hi+lo split of `a` against an
    operand whose f32 values are EXACTLY representable in bf16 (e.g. the
    centered-integer pixel basis, _basis_exact_bf16).  Error is just a's
    ~17-bit representation (~7e-6 relative) — tighter than _dot_split2's
    3 passes at 2/3 the cost."""
    ah, al = _split2(a)
    b16 = b_exact.astype(jnp.bfloat16)
    if dims is None:
        d = lambda x: jnp.dot(x, b16, preferred_element_type=jnp.float32)
    else:
        d = lambda x: jax.lax.dot_general(
            x, b16, dims, preferred_element_type=jnp.float32)
    return d(ah) + d(al)


def _dot_split2_rhs(a_exact, b, dims=None):
    """Mirror of _dot_split2_lhs with the EXACT operand on the left: hi+lo
    split of `b` against bf16-exact `a` (2 MXU passes, no transposes)."""
    bh, bl = _split2(b)
    a16 = a_exact.astype(jnp.bfloat16)
    if dims is None:
        d = lambda y: jnp.dot(a16, y, preferred_element_type=jnp.float32)
    else:
        d = lambda y: jax.lax.dot_general(
            a16, y, dims, preferred_element_type=jnp.float32)
    return d(bh) + d(bl)


def _dot_split3_rhs(a_exact, b, dims=None):
    """Three-way (hi+mid+lo, ~2^-24 relative — f32-grade) split of `b`
    against bf16-exact `a`: 3 MXU passes, HALF of HIGHEST's 6, with none of
    the 2-way split's tail error (split2 left ~2^-17-of-coef absolute error
    in the exponent, which the hardware parity gate rejected at max 0.17
    alpha-relative on 25px-sigma scenes)."""
    bh = b.astype(jnp.bfloat16)
    r1 = b - bh.astype(jnp.float32)
    bm = r1.astype(jnp.bfloat16)
    bl = (r1 - bm.astype(jnp.float32)).astype(jnp.bfloat16)
    a16 = a_exact.astype(jnp.bfloat16)
    if dims is None:
        d = lambda y: jnp.dot(a16, y, preferred_element_type=jnp.float32)
    else:
        d = lambda y: jax.lax.dot_general(
            a16, y, dims, preferred_element_type=jnp.float32)
    return d(bh) + d(bm) + d(bl)


def _prefix_matmul_f32(x, u_tri_f32):
    """Inclusive prefix sum of x [PIX, SUB] along SUB via a triangular-ones
    matmul, computed as TWO bf16 MXU passes on a hi+lo split of x.

    The trick: the ones matrix is EXACT in bf16 and the MXU accumulates in
    f32, so the only error is x's representation — and bf16(x) + bf16(x -
    bf16(x)) carries ~17 mantissa bits (~7e-6 relative), far below the
    2.7e-3 algorithmic parity floor.  Two bf16 passes + three cheap VPU ops
    replace Precision.HIGHEST's six passes on the kernels' dominant matmul.
    (Plain bf16x1 is catastrophic here: 2^-8 relative on a log-space
    transmittance sum reaching -9.2 is a 3-4% error in T.)"""
    u16 = u_tri_f32.astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(hi, u16, preferred_element_type=jnp.float32)
            + jnp.dot(lo, u16, preferred_element_type=jnp.float32))


_LOG_T_EPS = float(np.log(C.T_EPS))  # log-domain early-stop threshold


def _chunk_blend_quantities(feat, u_tri, basis, lt_in, done_in, tile_x0,
                            tile_y0, power_mode="matmul", half=(0, 0)):
    """Shared fwd/bwd per-chunk math.  Returns a dict of [PIX, CH] arrays and
    per-chunk updates, mirroring forward.cu:351-388 semantics exactly.

    The running transmittance is carried in LOG space (lt_in = log T):
    the early-stop test compares logs (lt_in + s_incl >= log T_EPS instead
    of T * exp(s_incl) >= T_EPS), t_before needs a single exp of
    (lt_test - logs) — replacing exp(s_incl) + a divide + a multiply — and
    the chunk update lt_new = lt_in + lsum costs an add instead of an exp
    and a multiply.  Net: one full-[PIX, CH] transcendental, one divide and
    one multiply removed per sub-chunk from BOTH kernels (the VPU
    elementwise chain is the measured bottleneck; r3f profile).  Values
    differ from the linear-domain recurrence only at f32 rounding.

    Precision strategy: the default TPU matmul precision truncates f32
    operands to bf16 (catastrophic for exponents / log prefix sums), so
    every matmul here runs at Precision.HIGHEST.  power_mode="vpu" sidesteps
    the precision question entirely: the quadratic form is evaluated on the
    centered differences dx = gx - px (broadcast outer difference, pure f32
    VPU) instead of the expanded polynomial, so there is no large-term
    cancellation and no MXU pass at all.  power_mode="split2" exploits the
    bf16-EXACT centered-integer basis (tiles <= 32): only the coefficient
    operand is hi+lo split, so power costs 2 MXU passes instead of 6; the
    getRect truncation bounds |coef| by ~(16/sigma + 3)^2 <= ~4e2, so the
    coefficients' ~2^-17 representation error contributes <~ 6e-3 absolute
    to the exponent — inside the alpha-threshold parity floor (gate on
    hardware regardless)."""
    if power_mode == "vpu":
        px = basis[:, 3:4]                                              # [PIX, 1]
        py = basis[:, 4:5]
        gx = feat[C.F_GX:C.F_GX + 1, :] - (tile_x0.astype(_F32) + half[0])
        gy = feat[C.F_GY:C.F_GY + 1, :] - (tile_y0.astype(_F32) + half[1])
        a = feat[C.F_CA:C.F_CA + 1, :]
        b = feat[C.F_CB:C.F_CB + 1, :]
        cc = feat[C.F_CC:C.F_CC + 1, :]
        dx = gx - px                                                    # [PIX, CH]
        dy = gy - py
        power = -0.5 * (a * (dx * dx) + cc * (dy * dy)) - b * (dx * dy)
    elif power_mode == "split2":
        coef = _coef_matrix(feat, tile_x0, tile_y0, half[0], half[1])
        power = _dot_split2_rhs(basis, coef)                            # [PIX, CH]
    elif power_mode == "split3":
        coef = _coef_matrix(feat, tile_x0, tile_y0, half[0], half[1])
        power = _dot_split3_rhs(basis, coef)                            # [PIX, CH]
    elif power_mode == "matmul":
        coef = _coef_matrix(feat, tile_x0, tile_y0, half[0], half[1])
        power = jnp.dot(basis, coef, preferred_element_type=_F32,
                        precision=_HI)                                  # [PIX, CH]
    else:
        raise ValueError(f"unknown power_mode: {power_mode!r}")
    op = feat[C.F_OP:C.F_OP + 1, :]
    expp = jnp.exp(power)
    raw = op * expp
    alpha = jnp.minimum(C.ALPHA_CLAMP, raw)
    # no explicit valid test: masked/invalid slots read the zero pad row
    # (_chunk_layout), so op = 0 -> alpha = 0 < ALPHA_MIN already excludes
    # them — the F_VALID payload row is redundant with F_OP here
    cand = (power <= 0.0) & (alpha >= C.ALPHA_MIN)
    alpha = jnp.where(cand, alpha, 0.0)
    one_m = 1.0 - alpha

    logs = jnp.log1p(-alpha)
    s_incl = _prefix_matmul_f32(logs, u_tri)
    # fold the done latch into an effective log T: latched pixels drop to
    # -1e9, so every lt_test comparison fails and t_before underflows to
    # exactly 0 — this replaces a [PIX, CH] AND with a [PIX, 1] where.
    # lt_in itself keeps the TRUE latched value (lsum is 0 when nothing
    # contributes), which the tile output needs.
    lt_eff = jnp.where(done_in > 0.5, jnp.float32(-1e9), lt_in)
    lt_test = lt_eff + s_incl         # log(T after instance i, inclusive)
    # lt_test is monotone non-increasing along the chunk, so "no instance
    # j <= i failed the T_EPS stop" is simply lt_test_i >= log T_EPS — the
    # explicit fail prefix (a second triangular matmul) is redundant
    contrib = cand & (lt_test >= _LOG_T_EPS)
    t_before = jnp.exp(lt_test - logs)     # T before instance i (linear)
    w = jnp.where(contrib, alpha * t_before, 0.0)

    lsum = jnp.sum(jnp.where(contrib, logs, 0.0), axis=1, keepdims=True)
    lt_new = lt_in + lsum
    done_new = jnp.maximum(
        done_in, (lt_test[:, -1:] < _LOG_T_EPS).astype(_F32))
    return dict(expp=expp, raw=raw, one_m=one_m, op=op,
                contrib=contrib, t_before=t_before, w=w,
                lt_new=lt_new, done_new=done_new)


# ---------------------------------------------------------------- forward ---

def _pay_dma(pay_hbm_ref, pay_buf_ref, sems_ref, gidx, group):
    """Async copy of grid step `gidx`'s `group` payload chunks HBM -> VMEM
    slot gidx % 2 (one DMA moves the whole group)."""
    slot = jax.lax.rem(gidx, 2)
    if group == 1:
        return pltpu.make_async_copy(pay_hbm_ref.at[gidx],
                                     pay_buf_ref.at[slot, 0],
                                     sems_ref.at[slot])
    return pltpu.make_async_copy(pay_hbm_ref.at[pl.ds(gidx * group, group)],
                                 pay_buf_ref.at[slot],
                                 sems_ref.at[slot])


def _any_k(kit_ref, base, group, pred):
    """Scalar OR of pred(kit) over a group's chunks (static unroll)."""
    out = pred(kit_ref[base])
    for i in range(1, group):
        out = out | pred(kit_ref[base + i])
    return out


def _pay_pipeline_start(kit_ref, pay_hbm_ref, pay_buf_ref, sems_ref,
                        issued_ref, g, flag_ref, group):
    """Manual payload pipeline, start-of-step half: wait for the DMA the
    previous step issued for this step's group (tracked by an SMEM bit),
    cold-start group 0, then OPTIMISTICALLY prefetch group g+1 if any of its
    chunks may compute (a new tile starts in it, or it continues a tile that
    is either currently not done or (re)starts within THIS group — the done
    flag is only updated chunk-by-chunk inside the compute loop, so the
    group-level decision must cover the reset case) so the copy overlaps
    this group's compute.

    Why manual: the automatic per-step block fetch costs ~2.9 us of DMA
    latency even for chunks the early-exit vote skips — the dominant kernel
    cost on saturated scenes.  Skipped groups here issue no DMA at all
    (the CUDA kernel's early loop exit, forward.cu:334-337).  The only
    wasted prefetch is the one group right after a tile latches done."""
    ng = pl.num_programs(0)
    base = g * group

    @pl.when((g > 0) & (issued_ref[0] == 1))
    def _():
        _pay_dma(pay_hbm_ref, pay_buf_ref, sems_ref, g, group).wait()

    # group 0 cold start: a new tile starts inside it, or its first chunk
    # continues a not-done tile (flag restored by the segment-continuation
    # branch, which runs before this)
    may0 = _any_k(kit_ref, 0, group, lambda k: k == 0) | (
        (kit_ref[0] > 0) & (flag_ref[0] < 0.5))

    @pl.when((g == 0) & may0)
    def _():
        dma = _pay_dma(pay_hbm_ref, pay_buf_ref, sems_ref, g, group)
        dma.start()
        dma.wait()

    nxt = jnp.minimum(g + 1, ng - 1) * group
    any_new_nxt = _any_k(kit_ref, nxt, group, lambda k: k == 0)
    any_cont_nxt = _any_k(kit_ref, nxt, group, lambda k: k > 0)
    cur_new = _any_k(kit_ref, base, group, lambda k: k == 0)
    prefetch = (g + 1 < ng) & (
        any_new_nxt
        | (any_cont_nxt & ((flag_ref[0] < 0.5) | cur_new)))
    issued_ref[0] = prefetch.astype(jnp.int32)

    @pl.when(prefetch)
    def _():
        _pay_dma(pay_hbm_ref, pay_buf_ref, sems_ref, g + 1, group).start()


def _fwd_kernel(tof_ref, kit_ref, pay_hbm_ref, u_ref, basis_ref,
                bigbuf_ref, acc_in_ref, dt_in_ref,
                out_ref, acc_out_ref, dt_out_ref,
                acc_ref, dt_ref, flag_ref, pay_buf_ref, sems_ref, issued_ref,
                flush_buf_ref=None, fsem_ref=None, fstate_ref=None,
                *, cfg: C.RasterConfig, gx_grid: int, gy_grid: int,
                group: int, seg_len: int):
    # The running accumulators live in VMEM *scratch*, which is
    # single-buffered and persists across grid steps.  Accumulating through
    # out_ref instead is unsafe: output blocks are multi-buffered and with a
    # scalar-prefetch-driven index map the revisit detection cannot alias the
    # buffers (observed miscompile on real TPU: alternate chunks landed in
    # alternate buffers).
    #
    # Per-chunk fixed cost matters as much as the math: [PIX, 16]/[PIX, 8]
    # arrays are padded to 128 lanes by Mosaic, so every extra pass over the
    # accumulator costs like a full [PIX, CH] pass (measured ~6.4 us/chunk of
    # pure overhead at PIX=1024 before this layout).  Hence: the pixel basis
    # arrives as a constant input (not recomputed per chunk), (T, done) live
    # in a slim [PIX, 2] scratch, the output tile is written ONCE per tile at
    # its last chunk instead of every chunk, and `group` chunks share one
    # grid step + one payload DMA (cfg.step_chunks: the grid-step skeleton
    # itself is the measured floor after the manual-IO change).
    g = pl.program_id(0)
    base = g * group
    pix = cfg.tile_pix
    ng = pl.num_programs(0)

    # a tile continuing from the previous SEGMENT restores its running state
    # (the segment loop bounds the SMEM scalar-prefetch arrays; a single
    # pallas_call over all chunks crashed the worker at ~10k chunks)
    @pl.when((g == 0) & (kit_ref[0] != 0))
    def _():
        acc_ref[:, :] = acc_in_ref[:, :]
        dt_ref[:, :] = dt_in_ref[:, :]
        flag_ref[0] = jnp.min(dt_in_ref[:, 1:2])

    if cfg.io_mode == "manual":
        # fstate: [0] = a flush is in flight, [1] = its destination tile.
        @pl.when(g == 0)
        def _():
            fstate_ref[0] = 0
            fstate_ref[1] = 0

    _pay_pipeline_start(kit_ref, pay_hbm_ref, pay_buf_ref, sems_ref,
                        issued_ref, g, flag_ref, group)
    slot = jax.lax.rem(g, 2)

    # early termination at tile granularity (the block-vote analog of
    # forward.cu:334-337): skip a chunk when every pixel latched done.
    # The vote is a scalar SMEM flag maintained by the active branch — a
    # per-chunk [PIX]-min reduction costs ~1 us even on skipped chunks.
    # Each chunk is processed as SUB-chunks of <= 128 instances FUSED into
    # one predicated body: (log T, done) flow through registers between
    # sub-chunks and the accumulator/carry refs are touched ONCE per chunk
    # (the per-sub-chunk acc/dt read-write passes over 128-lane-padded
    # [PIX, 16] arrays were pure overhead; the only loss is the mid-chunk
    # done-latch skip, which fires at most once per tile).
    sub = _subchunk(cfg)

    def _merged():
        lane = jax.lax.broadcasted_iota(jnp.int32, (pix, C.PAD_CHANNELS), 1)
        merged = jnp.where(lane == C.CH_DONE, dt_ref[:, 1:2], acc_ref[:, :])
        # the carry holds log T; the tile buffer contract stays linear T
        return jnp.where(lane == C.CH_TRANS, jnp.exp(dt_ref[:, 0:1]), merged)

    for i in range(group):
        c = base + i
        tile = tof_ref[c]
        k = kit_ref[c]

        @pl.when(k == 0)
        def _(k=k):
            acc_ref[:, :] = jnp.zeros((pix, C.PAD_CHANNELS), _F32)
            # dt carries (log T, done): T = 1 -> log T = 0
            dt_ref[:, :] = jnp.zeros((pix, 2), _F32)
            flag_ref[0] = 0.0

        @pl.when((k >= 0) & (flag_ref[0] < 0.5))
        def _(i=i, tile=tile):
            lt = dt_ref[:, 0:1]
            done = dt_ref[:, 1:2]
            # % gy_grid: in the batched-camera virtual grid the tile id is
            # offset by cam * gx * gy, but instance coordinates stay in each
            # camera's own pixel frame
            tile_x0 = (tile % gx_grid) * cfg.tile_w
            tile_y0 = ((tile // gx_grid) % gy_grid) * cfg.tile_h
            adims = (((1,), (1,)), ((), ()))
            acc_new = None
            for j in range(cfg.chunk // sub):
                q = _chunk_blend_quantities(
                    pay_buf_ref[slot, i, :8, j * sub:(j + 1) * sub],
                    u_ref[:, :],
                    basis_ref[:, :], lt, done, tile_x0, tile_y0,
                    power_mode=_resolve_power_mode(cfg), half=_half(cfg))
                # colT rows 10..15 are zero-padded, so += never touches the
                # done/trans lanes
                if cfg.fwd_acc == "bf16x2":
                    d = _dot_split2(
                        q["w"],
                        pay_buf_ref[slot, i, 8:24, j * sub:(j + 1) * sub],
                        adims)
                else:
                    d = jax.lax.dot_general(
                        q["w"],
                        pay_buf_ref[slot, i, 8:24, j * sub:(j + 1) * sub],
                        adims, preferred_element_type=_F32, precision=_HI)
                acc_new = d if acc_new is None else acc_new + d
                lt, done = q["lt_new"], q["done_new"]
            acc_ref[:, :] += acc_new
            dt_ref[:, :] = jnp.concatenate([lt, done], axis=1)
            flag_ref[0] = jnp.min(done)

        is_last = (c == seg_len - 1) | (
            tof_ref[jnp.minimum(c + 1, seg_len - 1)] != tile)

        if cfg.io_mode == "manual":
            # MANUAL tile flush: the finished tile goes to the HBM output
            # through an explicit DMA from a VMEM staging buffer instead of
            # the automatic tof-indexed out-block pipeline (whose interaction
            # with the manual payload DMA is the measured per-chunk
            # fixed-cost floor — see RasterConfig.io_mode).  The HBM tile
            # buffer is CHANNEL-MAJOR [tiles, PAD_CHANNELS, pix]: a
            # pixel-major [tiles, pix, 16] layout is not DMA-sliceable
            # (Mosaic requires tile-aligned slices and pads the 16-channel
            # minor axis to 128 lanes); channel-major slices are (16, 1024)
            # = whole sublane/lane tiles, like the payload buffer.  The
            # kernel math stays pixel-major; one per-tile [pix, 16] -> [16,
            # pix] transpose at the flush is the entire relayout cost.
            # Single staging slot: at most one flush is in flight; the next
            # tile's >= 1 chunk of compute hides the copy, and the wait
            # below settles it before reuse.
            @pl.when(is_last)
            def _(tile=tile):
                @pl.when(fstate_ref[0] == 1)
                def _():
                    pltpu.make_async_copy(flush_buf_ref,
                                          out_ref.at[fstate_ref[1]],
                                          fsem_ref).wait()
                flush_buf_ref[:, :] = _merged().T
                pltpu.make_async_copy(flush_buf_ref, out_ref.at[tile],
                                      fsem_ref).start()
                fstate_ref[0] = 1
                fstate_ref[1] = tile
        else:
            @pl.when(is_last)
            def _():
                out_ref[0] = _merged()

    @pl.when(g == ng - 1)
    def _():
        if cfg.io_mode == "manual":
            # drain before the pallas_call returns (the last is_last flush
            # has already fired, so at most one copy is in flight)
            @pl.when(fstate_ref[0] == 1)
            def _():
                pltpu.make_async_copy(flush_buf_ref,
                                      out_ref.at[fstate_ref[1]],
                                      fsem_ref).wait()
                fstate_ref[0] = 0
        # hand the running state to the next segment
        acc_out_ref[:, :] = acc_ref[:, :]
        dt_out_ref[:, :] = dt_ref[:, :]


def _segments(tc: int, seg: int) -> list[tuple[int, int]]:
    """[(start, length)] covering [0, tc) in chunks of <= seg."""
    if seg <= 0:
        seg = tc
    return [(s, min(seg, tc - s)) for s in range(0, max(tc, 1), seg)]


def _resolve_group(cfg: C.RasterConfig) -> int:
    """Effective step-group size: cfg.step_chunks under manual IO, else 1
    (the outblock path's per-chunk block index maps cannot be grouped)."""
    if cfg.io_mode != "manual":
        return 1
    g = max(1, int(cfg.step_chunks))
    if cfg.segment_chunks > 0:
        assert cfg.segment_chunks % g == 0, (
            f"segment_chunks {cfg.segment_chunks} not a multiple of "
            f"step_chunks {g}")
    return g


def _grouped_segments(tc: int, seg: int, group: int
                      ) -> list[tuple[int, int, int]]:
    """[(start, length, group)] covering [0, tc): each _segments window is
    split into a group-aligned grouped part plus an ungrouped (group=1)
    ragged tail, so the total chunk count never needs padding."""
    out = []
    for start, length in _segments(tc, seg):
        gl = length - (length % group)
        if gl:
            out.append((start, gl, group))
        if length % group:
            out.append((start + gl, length % group, 1))
    return out


def raster_core_pallas_fwd(binned: C.Binned, width: int, height: int,
                           cfg: C.RasterConfig, interpret: bool = False):
    """Segmented forward: the grid is split into segments of
    cfg.segment_chunks chunks, each a pallas_call whose scalar-prefetch
    arrays are bounded (SMEM scales with them; one call over all chunks
    crashed the TPU worker at ~10k chunks).  The output tile buffer threads
    through the segments via input_output_aliases; the in-progress tile's
    (color, T, done) state crosses the boundary in small carry arrays."""
    gx_grid, gy_grid = cfg.grid(width, height)
    tc = binned.payload.shape[0]
    ch = cfg.chunk
    pix = cfg.tile_pix
    sub = _subchunk(cfg)
    u_tri = jnp.asarray(_tri_incl(sub), dtype=_F32)
    basis = _pixel_basis(cfg)

    acc_c = jnp.zeros((pix, C.PAD_CHANNELS), _F32)
    dt_c = jnp.zeros((pix, 2), _F32)

    manual = cfg.io_mode == "manual"
    group = _resolve_group(cfg)
    if manual:
        # Channel-major HBM buffer (see the flush comment in _fwd_kernel):
        # explicit HBM, and [tiles, 16, pix] so the per-tile DMA slice is
        # sublane/lane tile-aligned.
        tile_shape = (binned.num_tiles, C.PAD_CHANNELS, pix)
        tile_out_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        tile_shape = (binned.num_tiles, pix, C.PAD_CHANNELS)
        tile_out_spec = pl.BlockSpec((1, pix, C.PAD_CHANNELS),
                                     lambda c, tof, kit: (tof[c], 0, 0))
    bigbuf = jnp.zeros(tile_shape, _F32)
    for start, length, grp in _grouped_segments(tc, cfg.segment_chunks,
                                                group):
        kernel = functools.partial(_fwd_kernel, cfg=cfg, gx_grid=gx_grid,
                                   gy_grid=gy_grid, group=grp,
                                   seg_len=length)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(length // grp,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # payload (manual DMA)
                pl.BlockSpec((sub, sub), lambda c, tof, kit: (0, 0)),
                pl.BlockSpec((pix, 8), lambda c, tof, kit: (0, 0)),
                # aliased tile buffer; HBM when manual (matches tile_out_spec)
                tile_out_spec if manual else pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((pix, C.PAD_CHANNELS), lambda c, tof, kit: (0, 0)),
                pl.BlockSpec((pix, 2), lambda c, tof, kit: (0, 0)),
            ],
            out_specs=[
                tile_out_spec,
                pl.BlockSpec((pix, C.PAD_CHANNELS), lambda c, tof, kit: (0, 0)),
                pl.BlockSpec((pix, 2), lambda c, tof, kit: (0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((pix, C.PAD_CHANNELS), _F32),
                            pltpu.VMEM((pix, 2), _F32),
                            pltpu.SMEM((1,), _F32),
                            pltpu.VMEM((2, grp, 24, ch), _F32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SMEM((1,), jnp.int32)]
            + ([pltpu.VMEM((C.PAD_CHANNELS, pix), _F32),   # flush staging (cm)
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((2,), jnp.int32)] if manual else []),
        )
        bigbuf, acc_c, dt_c = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(tile_shape, _F32),
                jax.ShapeDtypeStruct((pix, C.PAD_CHANNELS), _F32),
                jax.ShapeDtypeStruct((pix, 2), _F32),
            ],
            input_output_aliases={5: 0},  # bigbuf (3 tensor args after the
                                          # 2 prefetch scalars) -> output 0
            interpret=interpret,
        )(binned.tile_of_chunk[start:start + length],
          binned.chunk_in_tile[start:start + length],
          binned.payload[start:start + length],
          u_tri, basis, bigbuf, acc_c, dt_c)
    if manual:
        # restore the pixel-major contract (one fused XLA pass over the
        # buffer; ~0.3 ms at 1M/1080p vs the ~18 ms the manual IO removes)
        return jnp.swapaxes(bigbuf, 1, 2)
    return bigbuf


# --------------------------------------------------------------- backward ---

def _bwd_kernel(tof_ref, kit_ref, pay_hbm_ref, u_ref, basis_ref,
                gbuf_ref, obuf_ref, carry_in_ref,
                dpay_ref, carry_out_ref,
                carry_ref, flag_ref, pay_buf_ref, sems_ref, issued_ref,
                g_buf_ref=None, o_stage_ref=None, g_pix_ref=None,
                go_sem_ref=None,
                dstage_ref=None, dsem_ref=None, dstate_ref=None,
                *, cfg: C.RasterConfig, gx_grid: int, gy_grid: int,
                group: int, seg_len: int):
    gstep = pl.program_id(0)
    base = gstep * group
    pix = cfg.tile_pix
    manual = cfg.io_mode == "manual"

    if manual:
        # MANUAL tile-block IO (see RasterConfig.io_mode): the cotangent and
        # forward tile buffers live in HBM, CHANNEL-MAJOR [tiles, 16, pix]
        # (the DMA-sliceable layout; see the forward's flush comment); at
        # each tile start one DMA brings the g/o blocks into VMEM staging,
        # g is transposed once into the pixel-major g_pix scratch the math
        # uses, and o's single consumer is the `total` reduction computed
        # here (same op order as the auto path, so results are
        # bit-identical).  dstate: [0] = a dpay store is in flight,
        # [1] = its destination chunk.
        @pl.when(gstep == 0)
        def _():
            dstate_ref[0] = 0
            dstate_ref[1] = 0

    # tile continuing from the previous segment
    @pl.when((gstep == 0) & (kit_ref[0] != 0))
    def _():
        carry_ref[:, :] = carry_in_ref[:, :]
        flag_ref[0] = jnp.min(carry_in_ref[:, 1:2])
        if manual:
            # the g staging scratch is fresh in this pallas_call: re-fetch
            # the continued tile's cotangent block (total is in the carry,
            # so obuf is not needed again)
            tile0 = tof_ref[0]
            pltpu.make_async_copy(gbuf_ref.at[tile0], g_buf_ref,
                                  go_sem_ref.at[0]).start()
            pltpu.make_async_copy(gbuf_ref.at[tile0], g_buf_ref,
                                  go_sem_ref.at[0]).wait()
            g_pix_ref[:, :] = g_buf_ref[:, :].T

    if manual:
        ch = dstage_ref.shape[-1]
    else:
        ch = dpay_ref.shape[-1]
        dpay_ref[0] = jnp.zeros((6 + C.NUM_CHANNELS, ch), _F32)

    _pay_pipeline_start(kit_ref, pay_hbm_ref, pay_buf_ref, sems_ref,
                        issued_ref, gstep, flag_ref, group)
    slot = jax.lax.rem(gstep, 2)

    # same tile-level early termination as the forward: once every pixel
    # latched done, remaining chunks contribute zero gradient.  Sub-chunks
    # are FUSED into one predicated body like the forward's: (log T, done,
    # prefix) flow through registers and the carry ref is touched once per
    # chunk.
    sub = _subchunk(cfg)

    for i in range(group):
        _bwd_chunk(base + i, i, slot, tof_ref, kit_ref, u_ref, basis_ref,
                   gbuf_ref, obuf_ref, dpay_ref, carry_ref, flag_ref,
                   pay_buf_ref, g_buf_ref, o_stage_ref, g_pix_ref,
                   go_sem_ref, dstage_ref, dsem_ref, dstate_ref,
                   cfg=cfg, gx_grid=gx_grid, gy_grid=gy_grid, pix=pix,
                   manual=manual, ch=ch, sub=sub)

    @pl.when(gstep == pl.num_programs(0) - 1)
    def _():
        if manual:
            # drain the last in-flight dpay store
            @pl.when(dstate_ref[0] == 1)
            def _():
                pltpu.make_async_copy(dstage_ref,
                                      dpay_ref.at[dstate_ref[1]],
                                      dsem_ref).wait()
                dstate_ref[0] = 0
        carry_out_ref[:, :] = carry_ref[:, :]


def _bwd_chunk(c, i, slot, tof_ref, kit_ref, u_ref, basis_ref,
               gbuf_ref, obuf_ref, dpay_ref, carry_ref, flag_ref,
               pay_buf_ref, g_buf_ref, o_stage_ref, g_pix_ref,
               go_sem_ref, dstage_ref, dsem_ref, dstate_ref,
               *, cfg: C.RasterConfig, gx_grid: int, gy_grid: int, pix: int,
               manual: bool, ch: int, sub: int):
    """One chunk of the backward sweep (unrolled `group` times per step)."""
    tile = tof_ref[c]
    k = kit_ref[c]

    if manual:
        @pl.when(k == 0)
        def _():
            pltpu.make_async_copy(gbuf_ref.at[tile], g_buf_ref,
                                  go_sem_ref.at[0]).start()
            pltpu.make_async_copy(obuf_ref.at[tile], o_stage_ref,
                                  go_sem_ref.at[1]).start()
            pltpu.make_async_copy(gbuf_ref.at[tile], g_buf_ref,
                                  go_sem_ref.at[0]).wait()
            pltpu.make_async_copy(obuf_ref.at[tile], o_stage_ref,
                                  go_sem_ref.at[1]).wait()
            g_pix_ref[:, :] = g_buf_ref[:, :].T
            total = jnp.sum(g_pix_ref[:, :] * o_stage_ref[:, :].T, axis=1,
                            keepdims=True)
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, 8), 1)
            # lane 0 carries log T: T = 1 -> 0
            init = jnp.where(lane8 == 3, total, jnp.zeros((pix, 8), _F32))
            carry_ref[:, :] = init
            flag_ref[0] = 0.0
    else:
        @pl.when(k == 0)
        def _():
            # The done-channel cotangent is zeroed on the host side
            # (_disassemble_cotangent fills channels 10..14 with zeros), so
            # gbuf is usable as-is.
            total = jnp.sum(gbuf_ref[0] * obuf_ref[0], axis=1,
                            keepdims=True)                         # [PIX, 1]
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, 8), 1)
            # lane 0 carries log T: T = 1 -> 0
            init = jnp.where(lane8 == 3, total, jnp.zeros((pix, 8), _F32))
            carry_ref[:, :] = init
            flag_ref[0] = 0.0

    compute = (k >= 0) & (flag_ref[0] < 0.5)

    @pl.when(compute)
    def _():
        if manual:
            # wait for the previous chunk's in-flight dpay store before
            # reusing the staging buffer (it has had this chunk's DMA wait +
            # payload compute to complete; in steady state this never blocks)
            @pl.when(dstate_ref[0] == 1)
            def _():
                pltpu.make_async_copy(dstage_ref,
                                      dpay_ref.at[dstate_ref[1]],
                                      dsem_ref).wait()
                dstate_ref[0] = 0
        # the cotangent load must sit INSIDE this branch: at a segment-
        # continuation step the g staging fetch happens in the (c==0, k!=0)
        # branch of the caller, and an earlier load would read pre-fetch
        # garbage
        g = g_pix_ref[:, :] if manual else gbuf_ref[0]
        carry = carry_ref[:, :]
        lt = carry[:, 0:1]
        done = carry[:, 1:2]
        prefix = carry[:, 2:3]
        total = carry[:, 3:4]
        # % gy_grid: see the forward kernel (batched-camera virtual grid)
        tile_x0 = (tile % gx_grid) * cfg.tile_w
        tile_y0 = ((tile // gx_grid) % gy_grid) * cfg.tile_h
        for j in range(cfg.chunk // sub):
            sl = slice(j * sub, (j + 1) * sub)
            feat = pay_buf_ref[slot, i, :8, sl]
            colT = pay_buf_ref[slot, i, 8:24, sl]                   # [16, SUB]
            q = _chunk_blend_quantities(feat, u_ref[:, :], basis_ref[:, :],
                                        lt, done, tile_x0, tile_y0,
                                        power_mode=_resolve_power_mode(cfg),
                                        half=_half(cfg))

            # u[pix, i] = sum_ch g[pix, ch] * colT[ch, i]
            if cfg.bwd_matmul == "bf16x2":
                u = _dot_split2(g, colT)                            # [PIX, SUB]
            else:
                u = jnp.dot(g, colT, preferred_element_type=_F32,
                            precision=_HI)                          # [PIX, SUB]
            uw = u * q["w"]
            prefix_incl = prefix + _prefix_matmul_f32(uw, u_ref[:, :])
            a_suffix = total - prefix_incl
            dalpha = jnp.where(q["contrib"],
                               u * q["t_before"] - a_suffix / q["one_m"], 0.0)

            # CUDA-compatible: gradient ignores the 0.99 clamp
            # (backward.cu:502-558).
            m = dalpha * q["raw"]                                   # dL/dpower

            # moments are in centered tile-local pixel coords, matching the
            # basis.  The basis is bf16-exact for tiles <= 32
            # (_basis_exact_bf16), so the bf16x2 route needs only the m
            # split: 2 passes, and STRICTLY more accurate than both-split.
            mdims = (((0,), (0,)), ((), ()))
            if cfg.bwd_matmul == "bf16x2":
                if _basis_exact_bf16(cfg):
                    moments = _dot_split2_lhs(m, basis_ref[:, :], mdims)
                else:
                    moments = _dot_split2(m, basis_ref[:, :], mdims)  # [SUB, 8]
            else:
                moments = jax.lax.dot_general(m, basis_ref[:, :], mdims,
                                              preferred_element_type=_F32,
                                              precision=_HI)        # [SUB, 8]
            mxx = moments[:, 0][None, :]
            myy = moments[:, 1][None, :]
            mxy = moments[:, 2][None, :]
            mx = moments[:, 3][None, :]
            my = moments[:, 4][None, :]
            m1 = moments[:, 5][None, :]

            # d_op = sum_pix dalpha * expp.  m = dalpha * op * expp, and
            # basis column 5 is the constant 1, so m1 = sum_pix m = op *
            # d_op — the explicit [PIX, CH] multiply + column reduction
            # collapse to one [1, CH] divide (op = 0 slots are the zero pad
            # row: m is identically 0 there, so guard-and-zero is exact)
            d_op = jnp.where(q["op"] > 0.0, m1 / jnp.maximum(q["op"], 1e-30),
                             0.0)

            hx, hy = _half(cfg)
            gx = feat[C.F_GX:C.F_GX + 1, :] - (tile_x0.astype(_F32) + hx)
            gy = feat[C.F_GY:C.F_GY + 1, :] - (tile_y0.astype(_F32) + hy)
            a = feat[C.F_CA:C.F_CA + 1, :]
            b = feat[C.F_CB:C.F_CB + 1, :]
            cc = feat[C.F_CC:C.F_CC + 1, :]

            s_dx = gx * m1 - mx           # sum_pix m * dx
            s_dy = gy * m1 - my
            s_dx2 = gx * gx * m1 - 2.0 * gx * mx + mxx
            s_dy2 = gy * gy * m1 - 2.0 * gy * my + myy
            s_dxdy = gx * gy * m1 - gx * my - gy * mx + mxy

            d_gx = -(a * s_dx + b * s_dy)
            d_gy = -(cc * s_dy + b * s_dx)
            d_a = -0.5 * s_dx2
            d_b = -s_dxdy
            d_c = -0.5 * s_dy2
            # dL/d(colT) [16, SUB] = g^T @ w; rows NUM_CHANNELS..15 are
            # exactly zero (the host zeroes those cotangent lanes), so only
            # the real rows are emitted — dpay is [16, SUB] not [24, SUB],
            # which cuts the segment-reduction gather bytes by a third
            if cfg.bwd_matmul == "bf16x2":
                d_colT = _dot_split2(g, q["w"], (((0,), (0,)), ((), ())))
            else:
                d_colT = jax.lax.dot_general(
                    g, q["w"], (((0,), (0,)), ((), ())),
                    preferred_element_type=_F32, precision=_HI)
            drow = jnp.concatenate(
                [d_gx, d_gy, d_a, d_b, d_c, d_op,
                 d_colT[:C.NUM_CHANNELS]], axis=0)                  # [16, SUB]
            if manual:
                dstage_ref[:, sl] = drow
            else:
                dpay_ref[0, :, sl] = drow

            prefix = prefix + jnp.sum(uw, axis=1, keepdims=True)
            lt, done = q["lt_new"], q["done_new"]

        if manual:
            # ship this chunk's gradients to HBM; skipped chunks store
            # nothing (the dpay buffer is zero-initialized and aliased, so
            # their slots stay exactly zero — matching the auto path)
            pltpu.make_async_copy(dstage_ref, dpay_ref.at[c], dsem_ref).start()
            dstate_ref[0] = 1
            dstate_ref[1] = c
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, 8), 1)
        new_carry = jnp.where(lane8 == 0, lt, carry)
        new_carry = jnp.where(lane8 == 1, done, new_carry)
        new_carry = jnp.where(lane8 == 2, prefix, new_carry)
        carry_ref[:, :] = new_carry
        flag_ref[0] = jnp.min(done)


def raster_core_pallas_bwd(binned: C.Binned, tile_buf, gbuf, width: int,
                           height: int, cfg: C.RasterConfig,
                           interpret: bool = False):
    """Segmented like the forward; the in-progress tile's
    (T, done, prefix, total) state crosses segment boundaries in a small
    carry array."""
    gx_grid, gy_grid = cfg.grid(width, height)
    tc = binned.payload.shape[0]
    ch = cfg.chunk
    pix = cfg.tile_pix
    sub = _subchunk(cfg)
    u_tri = jnp.asarray(_tri_incl(sub), dtype=_F32)
    basis = _pixel_basis(cfg)

    carry_c = jnp.zeros((pix, 8), _F32)
    manual = cfg.io_mode == "manual"
    group = _resolve_group(cfg)
    if manual:
        # Explicit HBM + channel-major (the DMA-sliceable layout; see the
        # forward's flush comment).  One XLA transpose per buffer here vs
        # the auto out-block machinery's per-chunk cost.
        tile_buf = jnp.swapaxes(tile_buf, 1, 2)
        gbuf = jnp.swapaxes(gbuf, 1, 2)
        tile_in_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        dpay_out_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        tile_in_spec = pl.BlockSpec((1, pix, C.PAD_CHANNELS),
                                    lambda c, tof, kit: (tof[c], 0, 0))
        dpay_out_spec = pl.BlockSpec((1, 6 + C.NUM_CHANNELS, ch),
                                     lambda c, tof, kit: (c, 0, 0))
    dpays = []
    for start, length, grp in _grouped_segments(tc, cfg.segment_chunks,
                                                group):
        kernel = functools.partial(_bwd_kernel, cfg=cfg, gx_grid=gx_grid,
                                   gy_grid=gy_grid, group=grp,
                                   seg_len=length)
        if manual:
            def kernel_m(tof, kit, pay, u, bas, gb, ob, cin, dz, dpay, cout,
                         *scratch, _kern=kernel):
                del dz  # zero-initialized HBM buffer aliased to dpay
                return _kern(tof, kit, pay, u, bas, gb, ob, cin, dpay, cout,
                             *scratch)
            call_kernel = kernel_m
        else:
            call_kernel = kernel
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(length // grp,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # payload (manual DMA)
                pl.BlockSpec((sub, sub), lambda c, tof, kit: (0, 0)),
                pl.BlockSpec((pix, 8), lambda c, tof, kit: (0, 0)),
                tile_in_spec,
                tile_in_spec,
                pl.BlockSpec((pix, 8), lambda c, tof, kit: (0, 0)),
            ] + ([dpay_out_spec] if manual else []),  # zero buf aliased to dpay
            out_specs=[
                dpay_out_spec,
                pl.BlockSpec((pix, 8), lambda c, tof, kit: (0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((pix, 8), _F32),
                            pltpu.SMEM((1,), _F32),
                            pltpu.VMEM((2, grp, 24, ch), _F32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SMEM((1,), jnp.int32)]
            + ([pltpu.VMEM((C.PAD_CHANNELS, pix), _F32),   # g staging (cm)
                pltpu.VMEM((C.PAD_CHANNELS, pix), _F32),   # o staging (cm)
                pltpu.VMEM((pix, C.PAD_CHANNELS), _F32),   # g transposed
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((6 + C.NUM_CHANNELS, ch), _F32),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((2,), jnp.int32)] if manual else []),
        )
        ins = [binned.tile_of_chunk[start:start + length],
               binned.chunk_in_tile[start:start + length],
               binned.payload[start:start + length],
               u_tri, basis, gbuf, tile_buf, carry_c]
        alias = {}
        if manual:
            # skipped chunks never store: their dpay slots must pre-exist as
            # zeros, so a zero buffer is donated/aliased to the output
            # (inputs 0..7 = tof, kit, payload, u, basis, gbuf, obuf, carry)
            ins.append(jnp.zeros((length, 6 + C.NUM_CHANNELS, ch), _F32))
            alias = {8: 0}
        dpay_s, carry_c = pl.pallas_call(
            call_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((length, 6 + C.NUM_CHANNELS, ch), _F32),
                jax.ShapeDtypeStruct((pix, 8), _F32),
            ],
            input_output_aliases=alias,
            interpret=interpret,
        )(*ins)
        dpays.append(dpay_s)
    if len(dpays) == 1:
        return dpays[0]
    return jnp.concatenate(dpays, axis=0)
