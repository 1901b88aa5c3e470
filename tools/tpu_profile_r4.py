"""Round-4: price the backward segment-reduce variants + bigger chunks.

The r3f clean profile put the step at binning 11.0 / fwd 13.4 / bwd 19.1 /
reduce 11.0 ms with a <7 ms compute floor — the reduce and per-grid-step
fixed costs are the headroom (VERDICT r4 next #2).  Variants measured here:

  A. current reduce: lax.sort((gid, iota)) + gather + cumsum + extract
  B. sort-free: the FORWARD binning sort carries the expansion slot as an
     extra value (src), the backward scatter-SETS dpay rows into expansion
     order (unique indices), then cumsum + extract as before.  Prices both
     the backward scatter and the forward sort's 3rd operand.
  C. direct scatter-add zeros[P+1, 16].at[gid].add(rows) (no sort, no cumsum)
  D. chunk 512 / 1024 end-to-end rasterize+grad (fewer grid steps; the
     subchunk loop keeps math at 128 and the reduce is measured separately
     since its s grows with chunk).

Everything passes big arrays as jit ARGUMENTS (the large-constant rule).
"""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import math
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize import pallas_core
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.scene.cameras import camera_geom

P = int(os.environ.get("PROF_P", 100_000))
W = int(os.environ.get("PROF_W", 960))
H = int(os.environ.get("PROF_H", 544))
N = int(os.environ.get("PROF_N", 20))
ONLY = os.environ.get("PROF_ONLY", "")

rng = np.random.default_rng(0)
pts = rng.normal(scale=0.3, size=(P, 3)).astype(np.float32)
cols = rng.uniform(0.2, 0.8, size=(P, 3)).astype(np.float32)
state = gm.create_from_pcd(pts, cols, P, 3, 1.0)

fov = math.radians(50)
center = np.array([0.0, 0.3, 2.5])
fwdv = -center / np.linalg.norm(center)
up = np.array([0.0, 1.0, 0.0])
right = np.cross(up, fwdv); right /= np.linalg.norm(right)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = np.stack([right, np.cross(fwdv, right), fwdv], axis=0)
w2c[:3, 3] = -w2c[:3, :3] @ center
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov), W, H,
                  None)


@jax.jit
def make_inputs(params, alive):
    f = renderer.fields_from_params(params, alive)
    return renderer.prepare_raster_inputs(f, 3, cam)


ndc, conic, colors, opacity, depth, valid = jax.block_until_ready(
    make_inputs(state.params, state.aux.alive))


def mkcfg(**kw):
    kw.setdefault("chunk", 256)
    return RasterConfig(backend="pallas", capacity_mult=8, sort_mode="packed",
                        bwd_matmul="bf16x2", **kw)


cfg0 = mkcfg()
bg = jnp.zeros(10, jnp.float32)


@jax.jit
def make_binned(ndc, conic, colors, opacity, depth, valid):
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg0, opacity=opacity)
    return C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg0)


b = jax.block_until_ready(
    make_binned(ndc, conic, colors, opacity, depth, valid))
cap0 = cfg0.instance_capacity(P)
print(f"# P={P} {W}x{H} num_rendered={int(b.num_rendered)} "
      f"cap={cap0} chunks={b.payload.shape[0]}", flush=True)

jits = {}


def run(name, fn, *args, n=N):
    # PROF_ONLY: comma-separated substring filters (any match runs)
    if ONLY and not any(tok and tok in name for tok in ONLY.split(",")):
        return
    if name not in jits:
        jits[name] = jax.jit(fn)
    g = jits[name]
    r = g(jnp.float32(0), *args)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = g(jnp.float32(i) * 1e-6, *args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


def chk(x):
    return x.reshape(-1)[::1013].astype(jnp.float32).sum()


tc0 = b.payload.shape[0]
dpay0 = jnp.asarray(
    np.random.default_rng(1).normal(size=(tc0, 16, cfg0.chunk)), jnp.float32)


# ---- A. current reduce (sort in the backward) -------------------------------
def reduce_A(eps, dpay, gid, off, cnt):
    s = tc0 * cfg0.chunk
    dpay = dpay + eps
    gidf = gid.reshape(s)
    _, order = jax.lax.sort((gidf, jnp.arange(s, dtype=jnp.int32)),
                            num_keys=2)
    g16 = dpay.swapaxes(1, 2).reshape(s, 16)
    g16 = g16[order[:cap0]]
    csum = jnp.cumsum(g16, axis=0)
    end = jnp.clip(off + cnt - 1, 0, cap0 - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


# A-split: just the sort; just gather+cumsum+extract
def reduce_A_sort(eps, gid):
    s = tc0 * cfg0.chunk
    gidf = gid.reshape(s) + (eps * 0).astype(jnp.int32)
    _, order = jax.lax.sort((gidf, jnp.arange(s, dtype=jnp.int32)),
                            num_keys=2)
    return order[::1013].sum()


def reduce_A_rest(eps, dpay, order, off, cnt):
    s = tc0 * cfg0.chunk
    dpay = dpay + eps
    g16 = dpay.swapaxes(1, 2).reshape(s, 16)
    g16 = g16[order[:cap0]]
    csum = jnp.cumsum(g16, axis=0)
    end = jnp.clip(off + cnt - 1, 0, cap0 - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


# ---- B. fwd-carried src + scatter-set into expansion order ------------------
# src[sorted_pos] = expansion slot (what the fwd sort would carry as a value)
def make_src():
    s = tc0 * cfg0.chunk
    gidf = np.asarray(b.gid).reshape(s)
    order = np.lexsort((np.arange(s), gidf))  # positions sorted by (gid, pos)
    # order maps expansion-rank -> sorted position; src = inverse
    src = np.empty(s, np.int64)
    src[order] = np.arange(s)
    # src[sorted_pos... ] hmm: order[e] = sorted position of expansion slot e
    return jnp.asarray(order[:cap0], jnp.int32), jnp.asarray(
        np.argsort(order)[: s], jnp.int32)


ORDER_E2S, SRC_S2E = make_src()  # order: expansion->sorted; src: sorted->expansion


def reduce_B_scatter_rows(eps, dpay, src, off, cnt):
    """dpay rows scatter-SET to expansion positions (unique indices), then
    cumsum+extract.  src [S] = expansion slot of each sorted position (slots
    whose expansion position >= cap are dropped via mode=drop)."""
    s = tc0 * cfg0.chunk
    dpay = dpay + eps
    g16 = dpay.swapaxes(1, 2).reshape(s, 16)
    exp_rows = jnp.zeros((cap0, 16), jnp.float32).at[src].set(
        g16, mode="drop", unique_indices=True)
    csum = jnp.cumsum(exp_rows, axis=0)
    end = jnp.clip(off + cnt - 1, 0, cap0 - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


def reduce_B_gather_rows(eps, dpay, order, off, cnt):
    """Same but with the precomputed expansion->sorted gather (order) —
    identical math to A_rest; prices gather vs scatter."""
    return reduce_A_rest(eps, dpay, order, off, cnt)


# ---- C. direct scatter-add by gid -------------------------------------------
def reduce_C(eps, dpay, gid, _off, _cnt):
    s = tc0 * cfg0.chunk
    dpay = dpay + eps
    g16 = dpay.swapaxes(1, 2).reshape(s, 16)
    out = jnp.zeros((P + 1, 16), jnp.float32).at[gid.reshape(s)].add(
        g16, mode="drop")
    return chk(out[:P])


def reduce_B2_inv_gather(eps, dpay, src, off, cnt):
    """Scatter only the INVERSE PERMUTATION (i32, 4B/slot) then row-gather:
    inv[e] = sorted position of expansion slot e; rows move once, in gather
    form (the pattern the current reduce already uses)."""
    s = tc0 * cfg0.chunk
    dpay = dpay + eps
    inv = jnp.zeros((cap0,), jnp.int32).at[src].set(
        jnp.arange(s, dtype=jnp.int32), mode="drop", unique_indices=True)
    g16 = dpay.swapaxes(1, 2).reshape(s, 16)
    g16 = g16[inv]
    csum = jnp.cumsum(g16, axis=0)
    end = jnp.clip(off + cnt - 1, 0, cap0 - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


run("A_reduce_full", reduce_A, dpay0, b.gid, b.gauss_offset, b.gauss_count)
run("A_sort_only", reduce_A_sort, b.gid)
run("A_rest(gather+cumsum)", reduce_A_rest, dpay0, ORDER_E2S,
    b.gauss_offset, b.gauss_count)
run("B_scatter_rows", reduce_B_scatter_rows, dpay0, SRC_S2E,
    b.gauss_offset, b.gauss_count)
run("B2_scatter_inv_gather", reduce_B2_inv_gather, dpay0, SRC_S2E,
    b.gauss_offset, b.gauss_count)
run("C_scatter_add", reduce_C, dpay0, b.gid, b.gauss_offset, b.gauss_count)


# ---- fwd binning sort: 2 vs 3 operands (price carrying src) -----------------
KEYS = jnp.asarray(np.random.default_rng(2).integers(
    0, 2**30, size=cap0), jnp.int32)
GIDS = jnp.asarray(np.random.default_rng(3).integers(
    0, P, size=cap0), jnp.int32)


def sort2(eps, keys, gids):
    keys = keys + (eps * 0).astype(jnp.int32)
    ks, gs = jax.lax.sort((keys, gids), num_keys=2)
    return ks[::1013].sum() + gs[::1013].sum()


def sort3(eps, keys, gids):
    keys = keys + (eps * 0).astype(jnp.int32)
    ks, gs, src = jax.lax.sort(
        (keys, gids, jnp.arange(cap0, dtype=jnp.int32)), num_keys=2)
    return ks[::1013].sum() + gs[::1013].sum() + src[::1013].sum()


run("S_fwdsort_2op", sort2, KEYS, GIDS)
run("S_fwdsort_3op", sort3, KEYS, GIDS)


# ---- D. end-to-end rasterize+grad at chunk 256/512/1024 ---------------------
def raster_grad(cfg):
    from gaussianhaircut_tpu.ops.rasterize import rasterize

    def loss(eps, ndc, conic, colors, opacity):
        out = rasterize(ndc + eps, conic, colors, opacity, depth, valid,
                        bg, W, H, cfg)
        return jnp.sum(out["render"] ** 2)
    return jax.grad(loss, argnums=(1, 2, 3, 4))


args_r = (ndc, conic, colors, opacity)
for ch in (256, 512, 1024):
    run(f"E_rast_grad chunk={ch}", raster_grad(mkcfg(chunk=ch)), *args_r)
def raster_fwd(cfg):
    from gaussianhaircut_tpu.ops.rasterize import rasterize

    def f(eps, ndc, conic, colors, opacity):
        out = rasterize(ndc + eps, conic, colors, opacity, depth, valid,
                        bg, W, H, cfg)
        return out["render"].sum()
    return f


run("E_rast_grad scatter", raster_grad(mkcfg(reduce_mode="scatter")), *args_r)
run("E_rast_grad scatter chunk=512",
    raster_grad(mkcfg(reduce_mode="scatter", chunk=512)), *args_r)
run("E_rast_fwd scatter", raster_fwd(mkcfg(reduce_mode="scatter")), *args_r)
run("E_rast_fwd rowmajor", raster_fwd(mkcfg()), *args_r)

# ---- E2: pair_cull x chunk end-to-end ---------------------------------------
run("E2_rast_fwd cull", raster_fwd(mkcfg(pair_cull=True)), *args_r)
run("E2_rast_grad cull", raster_grad(mkcfg(pair_cull=True)), *args_r)
run("E2_rast_grad cull chunk=512",
    raster_grad(mkcfg(pair_cull=True, chunk=512)), *args_r)

# ---- F. reduce sub-breakdown (what inside A_rest's 10.3 ms?) ----------------
SORTED_ROWS = jnp.asarray(
    np.random.default_rng(4).normal(size=(cap0, 16)), jnp.float32)


def F_relayout_only(eps, dpay):
    """[tc, 16, chunk] -> [s, 16] swapaxes+reshape (pure relayout)."""
    s = tc0 * cfg0.chunk
    return chk((dpay + eps).swapaxes(1, 2).reshape(s, 16))


def F_gather_only(eps, dpay, order):
    s = tc0 * cfg0.chunk
    g16 = (dpay + eps).swapaxes(1, 2).reshape(s, 16)
    return chk(g16[order[:cap0]])


def F_cumsum_only(eps, rows):
    return chk(jnp.cumsum(rows + eps, axis=0))


def F_cumsum_trimm(eps, rows):
    """Blocked MXU cumsum: within-block inclusive prefix as a [B,512,512] x
    [B,512,16] triangular matmul + exclusive block-offset add."""
    blk = 512
    nb = cap0 // blk
    r = (rows + eps)[: nb * blk].reshape(nb, blk, 16)
    tri = jnp.asarray(np.tril(np.ones((blk, blk), np.float32)))
    within = jnp.einsum("ij,bjc->bic", tri, r,
                        preferred_element_type=jnp.float32)
    bsum = within[:, -1]                       # [nb, 16]
    boff = jnp.cumsum(bsum, axis=0) - bsum     # exclusive
    return chk(within + boff[:, None])


def F_extract_only(eps, csum, off, cnt):
    end = jnp.clip(off + cnt - 1, 0, cap0 - 1)
    seg = (csum + eps)[end] - jnp.where((off > 0)[:, None],
                                        csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


def F_rest_bf16pay(eps, dpay16, order, off, cnt):
    """A_rest with a bf16 slot payload: gather moves half the bytes, cumsum
    still f32."""
    s = tc0 * cfg0.chunk
    g16 = (dpay16 + eps.astype(jnp.bfloat16)).swapaxes(1, 2).reshape(s, 16)
    g16 = g16[order[:cap0]].astype(jnp.float32)
    csum = jnp.cumsum(g16, axis=0)
    end = jnp.clip(off + cnt - 1, 0, cap0 - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


def F_rest_trimm(eps, dpay, order, off, cnt):
    """A_rest but with the blocked tri-matmul cumsum."""
    s = tc0 * cfg0.chunk
    g16 = (dpay + eps).swapaxes(1, 2).reshape(s, 16)
    g16 = g16[order[:cap0]]
    blk = 512
    nb = cap0 // blk
    r = g16[: nb * blk].reshape(nb, blk, 16)
    tri = jnp.asarray(np.tril(np.ones((blk, blk), np.float32)))
    within = jnp.einsum("ij,bjc->bic", tri, r,
                        preferred_element_type=jnp.float32)
    bsum = within[:, -1]
    boff = jnp.cumsum(bsum, axis=0) - bsum
    csum = (within + boff[:, None]).reshape(nb * blk, 16)
    end = jnp.clip(off + cnt - 1, 0, nb * blk - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    return chk(jnp.where((cnt > 0)[:, None], seg, 0.0))


# ---- G. binning sub-breakdown (what inside the ~11 ms?) ---------------------
MP = ndc_xy_to_pixel(ndc, W, H)
PRE = C.preprocess(MP, conic, depth, valid, W, H, cfg0, opacity=opacity)


def G_preprocess(eps, ndc, conic, opacity, depth, valid):
    mp = ndc_xy_to_pixel(ndc + eps, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg0, opacity=opacity)
    return chk(pre.tiles_touched) + chk(pre.rect[0])


def G_bin_full(eps, ndc, conic, colors, opacity, depth, valid):
    mp = ndc_xy_to_pixel(ndc + eps, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg0, opacity=opacity)
    bb = C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg0)
    return chk(bb.payload) + chk(bb.gid)


def G_expand4(eps, tt, offsets, rect, depth):
    """The four expand_i32 delta-scatter+cumsum chains (geo, off, gid, dbits)
    in isolation."""
    p = tt.shape[0]
    rmin_x, rmin_y, rmax_x, rmax_y = rect
    rmin_x = rmin_x + (eps * 0).astype(jnp.int32)
    rect_w = jnp.maximum(rmax_x - rmin_x, 1).astype(jnp.int32)
    gx_grid, gy_grid = cfg0.grid(W, H)
    bw = max(int(gx_grid).bit_length(), 1)
    by = max(int(gy_grid).bit_length(), 1)

    def expand_i32(vals):
        vals = vals.astype(jnp.int32)
        d = vals - jnp.roll(vals, 1).at[0].set(0)
        return jnp.cumsum(jnp.zeros(cap0, jnp.int32).at[offsets].add(
            d, mode="drop"))

    geo = (rect_w << (bw + by)) | (rmin_x.astype(jnp.int32) << by) \
        | rmin_y.astype(jnp.int32)
    geo_i = expand_i32(geo)
    off_i = expand_i32(offsets)
    gid = expand_i32(jnp.arange(p, dtype=jnp.int32))
    dbits_i = expand_i32(
        jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32))
    return chk(geo_i) + chk(off_i) + chk(gid) + chk(dbits_i)


def G_searchsorted(eps, keys):
    keys = keys + (eps * 0).astype(jnp.int32)
    num_tiles = cfg0.grid(W, H)[0] * cfg0.grid(W, H)[1]
    search = jnp.arange(num_tiles + 1, dtype=jnp.int32) << 20
    return jnp.searchsorted(keys, search).sum()


GID_SLOT = jnp.asarray(np.random.default_rng(5).integers(
    0, P + 1, size=(tc0, cfg0.chunk)), jnp.int32)
PACK = jnp.asarray(np.random.default_rng(6).normal(
    size=(P + 1, 18)), jnp.float32)


def G_paygather(eps, pack, gid_slot):
    rows = (pack + eps)[gid_slot]                      # [TC, ch, 18]
    payload = jnp.pad(rows.swapaxes(1, 2),
                      ((0, 0), (0, 24 - 18), (0, 0)))
    return chk(payload)


def G_paygather_noT(eps, pack, gid_slot):
    """Same row gather WITHOUT the [TC, ch, 18] -> [TC, 18, ch] transpose:
    prices the swapaxes relayout inside the payload materialization."""
    rows = (pack + eps)[gid_slot]
    return chk(rows)


PACK_T = jnp.asarray(np.asarray(PACK).T)               # [18, P+1]


def G_paygather_cm(eps, pack_t, gid_slot):
    """CHANNEL-MAJOR payload gather: take along the minor axis of [18, P+1]
    so the gather moves 18 logical f32 per instance instead of [S, 18] rows
    lane-padded to 128 (the r5d decomposition put the row gather at 92 ms of
    the 193 ms 1M binning) — then one linear [18, S] -> [TC, 18, ch]
    reshape; the payload's channel-major chunk layout needs no swapaxes."""
    s = gid_slot.shape[0] * gid_slot.shape[1]
    cols = jnp.take(pack_t + eps, gid_slot.reshape(s), axis=1)  # [18, S]
    payload = jnp.pad(cols.reshape(18, gid_slot.shape[0], -1)
                      .transpose(1, 0, 2), ((0, 0), (0, 24 - 18), (0, 0)))
    return chk(payload)


def G_windows(eps, gid_sorted, starts):
    gid_pad = jnp.concatenate(
        [gid_sorted + (eps * 0).astype(jnp.int32),
         jnp.full((cfg0.chunk,), P, jnp.int32)])
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(gid_pad, (s,), (cfg0.chunk,)))(starts)
    return win[::7, ::3].sum()


STARTS = jnp.asarray(np.random.default_rng(7).integers(
    0, cap0, size=(tc0,)), jnp.int32)
GID_SORTED = jnp.asarray(np.random.default_rng(8).integers(
    0, P, size=(cap0,)), jnp.int32)

run("G_preprocess", G_preprocess, ndc, conic, opacity, depth, valid)
run("G_bin_full", G_bin_full, ndc, conic, colors, opacity, depth, valid)
run("G_expand4", G_expand4, PRE.tiles_touched,
    (jnp.cumsum(PRE.tiles_touched) - PRE.tiles_touched).astype(jnp.int32),
    PRE.rect, depth)
run("G_searchsorted", G_searchsorted, jnp.sort(KEYS))
run("G_paygather", G_paygather, PACK, GID_SLOT)
run("G_paygather_noT", G_paygather_noT, PACK, GID_SLOT)
run("G_paygather_cm", G_paygather_cm, PACK_T, GID_SLOT)
run("G_windows", G_windows, GID_SORTED, STARTS)

# ---- H. per-chunk FIXED-cost probe -------------------------------------------
# A pallas_call with the forward kernel's exact skeleton (grid over chunks,
# scalar-prefetch tof/kit, manual double-buffered payload DMA with the
# skip-aware prefetch, acc scratch, per-tile output flush) but TRIVIAL math:
# acc += column-0 broadcast of the payload.  fwd_kernel_time - H_fixed ~=
# the pair-math cost; H_fixed is the floor that only fewer/bigger grid
# steps can cut.  Variants isolate the skeleton pieces:
#   H_fixed_probe   full skeleton (DMA + tof-indexed out + branches)
#   H_nodma         no payload DMA (reads the uninitialized VMEM slot)
#   H_noout         constant out-block index (no per-step block tracking)
#   H_grid_only     neither DMA nor tof-indexed out (bare grid + branches)
def _h_fixed_probe(binned, cfg, dma=True, tof_out=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gaussianhaircut_tpu.ops.rasterize.pallas_core import (
        _pay_pipeline_start)

    pix = cfg.tile_pix
    ch = cfg.chunk

    def kernel(tof_ref, kit_ref, pay_hbm_ref, bigbuf_ref, out_ref,
               acc_ref, flag_ref, pay_buf_ref, sems_ref, issued_ref):
        c = pl.program_id(0)
        tile = tof_ref[c]
        k = kit_ref[c]

        @pl.when(k == 0)
        def _():
            acc_ref[:, :] = jnp.zeros((pix, C.PAD_CHANNELS), jnp.float32)
            flag_ref[0] = 0.0

        if dma:
            _pay_pipeline_start(kit_ref, pay_hbm_ref, pay_buf_ref, sems_ref,
                                issued_ref, c, flag_ref)
        slot = jax.lax.rem(c, 2)

        @pl.when((k >= 0) & (flag_ref[0] < 0.5))
        def _():
            # one trivial op touching the DMA'd payload so nothing is DCE'd
            acc_ref[:, :] += jnp.sum(pay_buf_ref[slot, :1, :]) * jnp.ones(
                (pix, C.PAD_CHANNELS), jnp.float32)

        nc = pl.num_programs(0)
        is_last = (c == nc - 1) | (tof_ref[jnp.minimum(c + 1, nc - 1)] != tile)

        @pl.when(is_last)
        def _():
            out_ref[0] = acc_ref[:, :]

    tc = binned.payload.shape[0]
    from gaussianhaircut_tpu.ops.rasterize.pallas_core import _segments

    def f(eps, payload, tof, kit):
        payload = payload + eps
        bigbuf = jnp.zeros((binned.num_tiles, pix, C.PAD_CHANNELS),
                           jnp.float32)
        for start, length in _segments(tc, cfg.segment_chunks):
            if tof_out:
                out_spec = pl.BlockSpec((1, pix, C.PAD_CHANNELS),
                                        lambda c, tof, kit: (tof[c], 0, 0))
            else:
                out_spec = pl.BlockSpec((1, pix, C.PAD_CHANNELS),
                                        lambda c, tof, kit: (0, 0, 0))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(length,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[out_spec],
                scratch_shapes=[
                    pltpu.VMEM((pix, C.PAD_CHANNELS), jnp.float32),
                    pltpu.SMEM((1,), jnp.float32),
                    pltpu.VMEM((2, 24, ch), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SMEM((1,), jnp.int32)],
            )
            from gaussianhaircut_tpu.ops.rasterize.api import _interpret
            (bigbuf,) = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct(
                    (binned.num_tiles, pix, C.PAD_CHANNELS), jnp.float32)],
                input_output_aliases={3: 0},
                interpret=_interpret(),
            )(tof[start:start + length], kit[start:start + length],
              payload[start:start + length], bigbuf)
        return chk(bigbuf)

    return f


run("H_fixed_probe", _h_fixed_probe(b, cfg0), b.payload, b.tile_of_chunk,
    b.chunk_in_tile)
run("H_nodma", _h_fixed_probe(b, cfg0, dma=False), b.payload,
    b.tile_of_chunk, b.chunk_in_tile)
run("H_noout", _h_fixed_probe(b, cfg0, tof_out=False), b.payload,
    b.tile_of_chunk, b.chunk_in_tile)
run("H_grid_only", _h_fixed_probe(b, cfg0, dma=False, tof_out=False),
    b.payload, b.tile_of_chunk, b.chunk_in_tile)


def F_featmajor_trimm(eps, dpay, order, off, cnt):
    """The featmajor reduce end-to-end: [TC,16,ch] -> [16,S] major-axis
    permute (no lane/sublane swap), lane-axis gather, trimm cumsum along
    lanes, lane-axis extract."""
    s = tc0 * cfg0.chunk
    ch = cfg0.chunk
    g16t = (dpay + eps).transpose(1, 0, 2).reshape(16, s)
    g16t = jnp.take(g16t, order[:cap0], axis=1)
    blk = 512
    nb = -(-cap0 // blk)
    r = jnp.pad(g16t, ((0, 0), (0, nb * blk - cap0))).reshape(16, nb, blk)
    tri = jnp.asarray(np.tril(np.ones((blk, blk), np.float32)))
    within = jnp.einsum("ij,cbj->cbi", tri, r,
                        preferred_element_type=jnp.float32)
    bsum = within[:, :, -1]
    boff = jnp.cumsum(bsum, axis=1) - bsum
    csum = (within + boff[:, :, None]).reshape(16, nb * blk)
    end = jnp.clip(off + cnt - 1, 0, nb * blk - 1)
    seg = (jnp.take(csum, end, axis=1)
           - jnp.where((off > 0)[None, :],
                       jnp.take(csum, jnp.maximum(off - 1, 0), axis=1), 0.0))
    return chk(jnp.where((cnt > 0)[None, :], seg, 0.0).T)


DPAY16 = dpay0.astype(jnp.bfloat16)
run("F_featmajor_trimm", F_featmajor_trimm, dpay0, ORDER_E2S,
    b.gauss_offset, b.gauss_count)
run("F_relayout_only", F_relayout_only, dpay0)
run("F_gather_only", F_gather_only, dpay0, ORDER_E2S)
run("F_cumsum_only", F_cumsum_only, SORTED_ROWS)
run("F_cumsum_trimm", F_cumsum_trimm, SORTED_ROWS)
run("F_extract_only", F_extract_only, SORTED_ROWS,
    b.gauss_offset, b.gauss_count)
run("F_rest_bf16pay", F_rest_bf16pay, DPAY16, ORDER_E2S,
    b.gauss_offset, b.gauss_count)
run("F_rest_trimm", F_rest_trimm, dpay0, ORDER_E2S,
    b.gauss_offset, b.gauss_count)
print("rc=0", flush=True)
