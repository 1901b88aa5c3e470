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
    if ONLY and ONLY not in name:
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


DPAY16 = dpay0.astype(jnp.bfloat16)
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
