"""Round-3b layout micro-profile.

Hypothesis under test: TPU HBM tiling pads the minor dim of f32/i32 arrays
to 128 lanes, so every [N, small-k] materialization in binning / the
backward segment reduction / precompute moves 5-32x its logical bytes.
Variants below re-express the same math with instance-minor or 1-D layouts.

Sections (PROF_ONLY substring-filters):
  A. binning fwd: expansion + payload variants
  B. backward segment-reduction variants
  C. SSIM variants
  D. precompute fwd vs fwd+bwd

Methodology as tpu_profile_r2/r3: vary an input per iteration, pass all
tensors as jit arguments, N-iteration wall clock after a warmup call.
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
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.ops.ssim import ssim, _band_matrix
from gaussianhaircut_tpu.scene.cameras import camera_geom

P = int(os.environ.get("PROF_P", 100_000))
W = int(os.environ.get("PROF_W", 960))
H = int(os.environ.get("PROF_H", 544))
CAP_MULT = int(os.environ.get("PROF_CAP_MULT", 8))
N = int(os.environ.get("PROF_N", 20))
ONLY = os.environ.get("PROF_ONLY", "")

rng = np.random.default_rng(0)
pts = rng.normal(scale=0.3, size=(P, 3)).astype(np.float32)
cols = rng.uniform(0.2, 0.8, size=(P, 3)).astype(np.float32)
state = gm.create_from_pcd(pts, cols, P, 3, 1.0)

fov = math.radians(50)
center = np.array([0.0, 0.3, 2.5])
fwd = -center / np.linalg.norm(center)
up = np.array([0.0, 1.0, 0.0])
right = np.cross(up, fwd); right /= np.linalg.norm(right)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
w2c[:3, 3] = -w2c[:3, :3] @ center
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov), W, H, None)

cfg = RasterConfig(backend="pallas", capacity_mult=CAP_MULT, sort_mode="packed")
cap = cfg.instance_capacity(P)
gx_grid, gy_grid = cfg.grid(W, H)
num_tiles = gx_grid * gy_grid
ch = cfg.chunk
TC = cap // ch + num_tiles


@jax.jit
def make_inputs(params, alive, jitter):
    f = renderer.fields_from_params(params, alive)
    f = f._replace(xyz=f.xyz + jitter)
    return renderer.prepare_raster_inputs(f, 3, cam)


ndc, conic, colors, opacity, depth, valid = jax.block_until_ready(
    make_inputs(state.params, state.aux.alive, jnp.zeros(3)))
print(f"# P={P} {W}x{H} cap={cap} TC={TC} tiles={num_tiles}", flush=True)

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


# ---------------------------------------------------------------- section A
def chk(x):
    return x.reshape(-1)[::1013].astype(jnp.float32).sum()


def mk_pre(eps):
    mp = ndc_xy_to_pixel(ndc, W, H) + eps
    return mp, C.preprocess(mp, conic, depth, valid, W, H, cfg, opacity=opacity)


def a_preprocess(eps):
    mp, pre = mk_pre(eps)
    return chk(pre.tiles_touched) + chk(pre.rect[0])


def a_binning_full(eps):
    mp, pre = mk_pre(eps)
    b = C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg)
    return chk(b.payload[:, 0]) + chk(b.gid[:, 0])


def _expansion_current(pre):
    """Replicates bin_instances' expansion: gid + tile_id + packed key."""
    rmin_x, rmin_y, rmax_x, rmax_y = pre.rect
    offsets = jnp.cumsum(pre.tiles_touched) - pre.tiles_touched
    total = offsets[-1] + pre.tiles_touched[-1]
    iota_p = jnp.arange(P, dtype=jnp.int32)
    base = jnp.zeros(cap, jnp.int32).at[offsets.astype(jnp.int32)].max(
        iota_p, mode="drop")
    gid = jax.lax.cummax(base)
    inst_valid = jnp.arange(cap, dtype=jnp.int32) < total
    ggeo = jnp.stack([offsets.astype(jnp.int32),
                      jnp.maximum(rmax_x - rmin_x, 1), rmin_x, rmin_y],
                     axis=-1)[gid]
    within = jnp.arange(cap, dtype=jnp.int32) - ggeo[:, 0]
    rect_w = ggeo[:, 1]
    q = jnp.floor((within.astype(jnp.float32) + 0.5)
                  / rect_w.astype(jnp.float32)).astype(jnp.int32)
    tile_x = ggeo[:, 2] + (within - q * rect_w)
    tile_y = ggeo[:, 3] + q
    tile_id = jnp.where(inst_valid, tile_y * gx_grid + tile_x,
                        num_tiles).astype(jnp.int32)
    inst_depth = jnp.where(inst_valid, depth[gid], jnp.inf)
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 31 - tile_bits
    dq = jax.lax.bitcast_convert_type(inst_depth, jnp.int32) >> (31 - depth_bits)
    dq = jnp.clip(dq, 0, (1 << depth_bits) - 1)
    key = tile_id * (1 << depth_bits) + dq
    return key, gid


def _expansion_cumsum(pre):
    """Expansion with NO [cap, k] row gathers / element gathers: every
    per-gaussian quantity expands by scatter-delta + cumsum on 1-D [cap]
    (exact in i32; depth via its monotone bit pattern)."""
    rmin_x, rmin_y, rmax_x, rmax_y = pre.rect
    offsets = (jnp.cumsum(pre.tiles_touched) - pre.tiles_touched).astype(jnp.int32)
    total = offsets[-1] + pre.tiles_touched[-1]
    iota_cap = jnp.arange(cap, dtype=jnp.int32)

    def expand_i32(vals):
        d = vals - jnp.roll(vals, 1).at[0].set(0)
        return jnp.cumsum(jnp.zeros(cap, jnp.int32).at[offsets].add(
            d, mode="drop"))

    rect_w = jnp.maximum(rmax_x - rmin_x, 1)
    # rect_w <= 64, rmin_x < 64, rmin_y < 2^20: one packed chain
    geo = ((rect_w << 26) | (rmin_x << 20) | rmin_y).astype(jnp.int32)
    geo_i = expand_i32(geo)
    off_i = expand_i32(offsets)
    dbits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    dbits_i = expand_i32(dbits)
    gid = expand_i32(jnp.arange(P, dtype=jnp.int32))

    inst_valid = iota_cap < total
    within = iota_cap - off_i
    rw = geo_i >> 26
    rx = (geo_i >> 20) & 63
    ry = geo_i & ((1 << 20) - 1)
    q = jnp.floor((within.astype(jnp.float32) + 0.5)
                  / rw.astype(jnp.float32)).astype(jnp.int32)
    tile_id = jnp.where(inst_valid, (ry + q) * gx_grid + rx + within - q * rw,
                        num_tiles).astype(jnp.int32)
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 31 - tile_bits
    dq = jnp.where(inst_valid, dbits_i, jnp.int32(0x7F800000)) >> (31 - depth_bits)
    dq = jnp.clip(dq, 0, (1 << depth_bits) - 1)
    key = tile_id * (1 << depth_bits) + dq
    return key, gid


def a_expansion_current(eps):
    mp, pre = mk_pre(eps)
    key, gid = _expansion_current(pre)
    return chk(key) + chk(gid)


def a_expansion_cumsum(eps):
    mp, pre = mk_pre(eps)
    key, gid = _expansion_cumsum(pre)
    return chk(key) + chk(gid)


def a_expansion_match(eps):
    mp, pre = mk_pre(eps)
    k1, g1 = _expansion_current(pre)
    k2, g2 = _expansion_cumsum(pre)
    tot = pre.tiles_touched.sum()
    iv = jnp.arange(cap) < tot
    return (jnp.where(iv, k1 - k2, 0) != 0).sum() + (
        jnp.where(iv, g1 - g2, 0) != 0).sum()


# --- payload variants: shared post-sort bookkeeping ---
def _sorted_and_tables(eps):
    mp, pre = mk_pre(eps)
    key, gid = _expansion_current(pre)
    key_sorted, gid_sorted = jax.lax.sort((key, gid), num_keys=2)
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 31 - tile_bits
    search_keys = jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits
    bounds = jnp.searchsorted(key_sorted, search_keys)
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    tile_start = bounds[:-1].astype(jnp.int32)
    nchunks = jnp.maximum(1, -(-counts // ch))
    chunk_start = jnp.cumsum(nchunks) - nchunks
    chunk_ids = jnp.arange(TC, dtype=jnp.int32)
    tile_of_chunk = jnp.clip(
        jnp.searchsorted(chunk_start, chunk_ids, side="right") - 1,
        0, num_tiles - 1).astype(jnp.int32)
    chunk_in_tile = chunk_ids - chunk_start[tile_of_chunk]
    cinfo = jnp.stack([counts, tile_start], axis=-1)[tile_of_chunk]
    starts = jnp.minimum(cinfo[:, 1] + chunk_in_tile * ch, cap)
    lane = jnp.arange(ch, dtype=jnp.int32)[None, :]
    slot_ok = chunk_in_tile[:, None] * ch + lane < cinfo[:, 0:1]
    return mp, gid_sorted, starts, slot_ok


def _pack24(mp):
    return jnp.concatenate([
        mp, conic, opacity,
        jnp.ones((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32),
        colors, jnp.zeros((P, C.PAD_CHANNELS - colors.shape[1]), jnp.float32),
    ], axis=-1)


def a_payload_current(eps):
    mp, gid_sorted, starts, slot_ok = _sorted_and_tables(eps)
    pack24 = _pack24(mp)
    safe = jnp.minimum(gid_sorted, P - 1)
    sorted_rows = jnp.concatenate([
        pack24[safe],
        jax.lax.bitcast_convert_type(gid_sorted, jnp.float32)[:, None],
    ], axis=1)
    sorted_rows = jnp.pad(sorted_rows, ((0, ch), (0, 0)))
    slices = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sorted_rows, (s, 0), (ch, 25))
    )(starts)
    payload = (slices[:, :, :24]
               * slot_ok[:, :, None].astype(jnp.float32)).swapaxes(1, 2)
    gid_slot = jnp.where(
        slot_ok, jax.lax.bitcast_convert_type(slices[:, :, 24], jnp.int32), P)
    return chk(payload[:, 0]) + chk(gid_slot)


def _gid_chunk(gid_sorted, starts, slot_ok):
    gpad = jnp.concatenate([gid_sorted, jnp.full((ch,), P, jnp.int32)])
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(gpad, (s,), (ch,)))(starts)
    return jnp.where(slot_ok, win, P)                               # [TC, ch]


def a_payload_chunk_rowgather(eps):
    """gid windows first, then ONE row gather straight to [TC, ch, 24] with
    the mask folded into the index (row P = zeros)."""
    mp, gid_sorted, starts, slot_ok = _sorted_and_tables(eps)
    gid_chunk = _gid_chunk(gid_sorted, starts, slot_ok)
    pack = jnp.pad(_pack24(mp), ((0, 1), (0, 0)))                   # row P = 0
    payload = pack[gid_chunk].swapaxes(1, 2)                        # [TC,24,ch]
    return chk(payload[:, 0]) + chk(gid_chunk)


def a_payload_chunk_featmajor(eps):
    """Feature-major gather: minor dim is the instance axis everywhere."""
    mp, gid_sorted, starts, slot_ok = _sorted_and_tables(eps)
    gid_chunk = _gid_chunk(gid_sorted, starts, slot_ok)
    packT = jnp.pad(_pack24(mp), ((0, 1), (0, 0))).T                # [24, P+1]
    payload = jnp.take(packT, gid_chunk.reshape(-1), axis=1)
    payload = payload.reshape(24, TC, ch).transpose(1, 0, 2)
    return chk(payload[:, 0]) + chk(gid_chunk)


def a_payload_match(eps):
    mp, gid_sorted, starts, slot_ok = _sorted_and_tables(eps)
    pack24 = _pack24(mp)
    safe = jnp.minimum(gid_sorted, P - 1)
    sorted_rows = jnp.pad(jnp.concatenate([
        pack24[safe],
        jax.lax.bitcast_convert_type(gid_sorted, jnp.float32)[:, None],
    ], axis=1), ((0, ch), (0, 0)))
    slices = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sorted_rows, (s, 0), (ch, 25))
    )(starts)
    pay0 = (slices[:, :, :24]
            * slot_ok[:, :, None].astype(jnp.float32)).swapaxes(1, 2)
    gid_chunk = _gid_chunk(gid_sorted, starts, slot_ok)
    pack = jnp.pad(pack24, ((0, 1), (0, 0)))
    pay1 = pack[gid_chunk].swapaxes(1, 2)
    return jnp.abs(pay0 - pay1).max()


for nm, f in [("A_preprocess", a_preprocess),
              ("A_binning_full", a_binning_full),
              ("A_expansion_current", a_expansion_current),
              ("A_expansion_cumsum", a_expansion_cumsum),
              ("A_payload_current", a_payload_current),
              ("A_payload_chunk_rowgather", a_payload_chunk_rowgather),
              ("A_payload_chunk_featmajor", a_payload_chunk_featmajor)]:
    run(nm, f)
if not ONLY or "match" in ONLY:
    print("A_expansion_match (want 0):",
          jax.jit(a_expansion_match)(jnp.float32(0.0)), flush=True)
    print("A_payload_match (want 0):",
          jax.jit(a_payload_match)(jnp.float32(0.0)), flush=True)


# ---------------------------------------------------------------- section B
s_slots = TC * ch
rngb = np.random.default_rng(2)
dpay_rand = jnp.asarray(rngb.normal(size=(TC, 24, ch)), jnp.float32)
gid_rand = jnp.asarray(
    np.sort(rngb.integers(0, P, s_slots)).astype(np.int32).reshape(TC, ch))
off_rand = jnp.asarray(np.searchsorted(
    np.asarray(gid_rand).reshape(-1), np.arange(P)).astype(np.int32))
cnt_rand = jnp.asarray(np.diff(np.append(np.asarray(off_rand),
                                         s_slots)).astype(np.int32))


def b_reduce_current(eps, dpay, gid, off, cnt):
    g24 = (dpay + eps).swapaxes(1, 2).reshape(s_slots, 24)
    gidf = gid.reshape(s_slots)
    _, order = jax.lax.sort((gidf, jnp.arange(s_slots, dtype=jnp.int32)),
                            num_keys=2)
    g24 = g24[order[:cap]]
    csum = jnp.cumsum(g24, axis=0)
    end = jnp.clip(off + cnt - 1, 0, cap - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    seg = jnp.where((cnt > 0)[:, None], seg, 0.0)
    return chk(seg)


def b_reduce_featmajor(eps, dpay, gid, off, cnt):
    g24T = (dpay + eps).transpose(1, 0, 2).reshape(24, s_slots)
    gidf = gid.reshape(s_slots)
    _, order = jax.lax.sort((gidf, jnp.arange(s_slots, dtype=jnp.int32)),
                            num_keys=2)
    g24T = jnp.take(g24T, order[:cap], axis=1, mode="clip")
    csum = jnp.cumsum(g24T, axis=1)                                # [24, cap]
    end = jnp.clip(off + cnt - 1, 0, cap - 1)
    seg = (jnp.take(csum, end, axis=1, mode="clip")
           - jnp.where((off > 0)[None, :],
                       jnp.take(csum, jnp.maximum(off - 1, 0), axis=1,
                                mode="clip"), 0.0))
    seg = jnp.where((cnt > 0)[None, :], seg, 0.0)
    return chk(seg.T)


def b_reduce_blockmm(eps, dpay, gid, off, cnt):
    """Row-major, but the [cap, 24] cumsum is a block matmul prefix:
    tri^T per 128-block on the MXU + a tiny inter-block cumsum."""
    g24 = (dpay + eps).swapaxes(1, 2).reshape(s_slots, 24)
    gidf = gid.reshape(s_slots)
    _, order = jax.lax.sort((gidf, jnp.arange(s_slots, dtype=jnp.int32)),
                            num_keys=2)
    g24 = g24[order[:cap]]
    nb = cap // 128
    blocks = g24.reshape(nb, 128, 24)
    tri = jnp.asarray(np.triu(np.ones((128, 128), np.float32)))
    intra = jax.lax.dot_general(
        jnp.broadcast_to(tri.T, (nb, 128, 128)), blocks,
        (((2,), (1,)), ((0,), (0,))), precision=jax.lax.Precision.HIGHEST)
    tots = blocks.sum(axis=1)
    base = jnp.cumsum(tots, axis=0) - tots
    csum = (intra + base[:, None, :]).reshape(cap, 24)
    end = jnp.clip(off + cnt - 1, 0, cap - 1)
    seg = csum[end] - jnp.where((off > 0)[:, None],
                                csum[jnp.maximum(off - 1, 0)], 0.0)
    seg = jnp.where((cnt > 0)[:, None], seg, 0.0)
    return chk(seg)


def b_sort_only(eps, gid):
    gidf = gid.reshape(s_slots)
    _, order = jax.lax.sort((gidf + (eps * 0).astype(jnp.int32),
                             jnp.arange(s_slots, dtype=jnp.int32)), num_keys=2)
    return chk(order)


def b_gather_only(eps, dpay):
    g24 = (dpay + eps).swapaxes(1, 2).reshape(s_slots, 24)
    order = jnp.arange(cap, dtype=jnp.int32) * 7 % s_slots
    return chk(g24[order])


def b_cumsum_only(eps, dpay):
    g24 = (dpay + eps).swapaxes(1, 2).reshape(s_slots, 24)[:cap]
    return chk(jnp.cumsum(g24, axis=0))


for nm, f, a in [("B_reduce_current", b_reduce_current,
                  (dpay_rand, gid_rand, off_rand, cnt_rand)),
                 ("B_reduce_featmajor", b_reduce_featmajor,
                  (dpay_rand, gid_rand, off_rand, cnt_rand)),
                 ("B_reduce_blockmm", b_reduce_blockmm,
                  (dpay_rand, gid_rand, off_rand, cnt_rand)),
                 ("B_sort_only", b_sort_only, (gid_rand,)),
                 ("B_gather_only", b_gather_only, (dpay_rand,)),
                 ("B_cumsum_only", b_cumsum_only, (dpay_rand,))]:
    run(nm, f, *a)
if not ONLY or "match" in ONLY:
    z = jnp.float32(0.0)
    r0 = jax.jit(b_reduce_current)(z, dpay_rand, gid_rand, off_rand, cnt_rand)
    r1 = jax.jit(b_reduce_featmajor)(z, dpay_rand, gid_rand, off_rand, cnt_rand)
    r2 = jax.jit(b_reduce_blockmm)(z, dpay_rand, gid_rand, off_rand, cnt_rand)
    print(f"B_match fm={float(abs(r1 - r0)):.3e} mm={float(abs(r2 - r0)):.3e}",
          flush=True)


# ---------------------------------------------------------------- section C
img_a = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
img_b = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)


def c_ssim_current(eps, a, b):
    return jax.value_and_grad(lambda x: 1 - ssim(x, b))(a + eps)[0]


def _blur_var(img, precision, bf16x2=False):
    c, h, w = img.shape
    bh = jnp.asarray(_band_matrix(h, 11, 1.5))
    bw = jnp.asarray(_band_matrix(w, 11, 1.5))
    if bf16x2:
        bh16, bw16 = bh.astype(jnp.bfloat16), bw.astype(jnp.bfloat16)

        def mm(x, m):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jnp.einsum("chw,wj->chj", hi, m,
                               preferred_element_type=jnp.float32)
                    + jnp.einsum("chw,wj->chj", lo, m,
                                 preferred_element_type=jnp.float32))
        x = mm(img.swapaxes(1, 2), bh16).swapaxes(1, 2)
        return mm(x, bw16)
    x = jnp.einsum("chw,hk->ckw", img, bh, precision=precision)
    return jnp.einsum("ckw,wj->ckj", x, bw, precision=precision)


def _ssim_with(blur, a, b):
    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 * mu1
    s2 = blur(b * b) - mu2 * mu2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def c_ssim_default_prec(eps, a, b):
    f = lambda x: 1 - _ssim_with(
        lambda i: _blur_var(i, jax.lax.Precision.DEFAULT), x, b)
    return jax.value_and_grad(f)(a + eps)[0]


def c_ssim_bf16x2(eps, a, b):
    f = lambda x: 1 - _ssim_with(
        lambda i: _blur_var(i, None, bf16x2=True), x, b)
    return jax.value_and_grad(f)(a + eps)[0]


def _blur_split3(img):
    """Both operands hi+lo split: 3 bf16 passes per matmul, ~1e-5 relative."""
    c, h, w = img.shape
    bh = jnp.asarray(_band_matrix(h, 11, 1.5))
    bw = jnp.asarray(_band_matrix(w, 11, 1.5))

    def mm(x, m):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        mh = m.astype(jnp.bfloat16)
        ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda p, q: jnp.einsum("chw,wj->chj", p, q,
                                    preferred_element_type=jnp.float32)
        return d(xh, mh) + d(xh, ml) + d(xl, mh)
    x = mm(img.swapaxes(1, 2), bh).swapaxes(1, 2)
    return mm(x, bw)


def c_ssim_bf16x3(eps, a, b):
    f = lambda x: 1 - _ssim_with(_blur_split3, x, b)
    return jax.value_and_grad(f)(a + eps)[0]


def c_ssim_cached_gt(eps, a, b):
    blur = lambda i: _blur_var(i, jax.lax.Precision.HIGHEST)
    mu2 = blur(b)
    s2 = blur(b * b) - mu2 * mu2

    def f(x):
        mu1 = blur(x)
        s1 = blur(x * x) - mu1 * mu1
        s12 = blur(x * b) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        return 1 - jnp.mean(m)
    return jax.value_and_grad(f)(a + eps)[0]


for nm, f in [("C_ssim_current", c_ssim_current),
              ("C_ssim_default_prec", c_ssim_default_prec),
              ("C_ssim_bf16x2", c_ssim_bf16x2),
              ("C_ssim_bf16x3", c_ssim_bf16x3),
              ("C_ssim_cached_gt", c_ssim_cached_gt)]:
    run(nm, f, img_a, img_b)
if not ONLY or "match" in ONLY:
    z = jnp.float32(0.0)
    v0 = jax.jit(c_ssim_current)(z, img_a, img_b)
    v2 = jax.jit(c_ssim_bf16x2)(z, img_a, img_b)
    v3 = jax.jit(c_ssim_bf16x3)(z, img_a, img_b)
    print(f"C_match bf16x2 dssim={float(abs(v2 - v0)):.3e} "
          f"bf16x3 dssim={float(abs(v3 - v0)):.3e}", flush=True)


# ---------------------------------------------------------------- section D
def d_precompute_fwd(eps, params, alive):
    fl = renderer.fields_from_params(
        params._replace(xyz=params.xyz + eps), alive)
    ndc_, conic_, colors_, opacity_, depth_, _ = (
        renderer.prepare_raster_inputs(fl, 3, cam))
    return chk(ndc_) + chk(conic_) + chk(colors_) + chk(opacity_)


def d_precompute_fwdbwd(eps, params, alive):
    def f(xyz, scaling, rotation, feats):
        p2 = params._replace(xyz=xyz + eps, scaling=scaling,
                             rotation=rotation, features_rest=feats)
        fl = renderer.fields_from_params(p2, alive)
        ndc_, conic_, colors_, opacity_, _, _ = (
            renderer.prepare_raster_inputs(fl, 3, cam))
        return (jnp.sum(ndc_ * 0.1) + jnp.sum(conic_ * 1e-4)
                + jnp.sum(colors_ * 1e-3) + jnp.sum(opacity_))
    g = jax.grad(f, argnums=(0, 1, 2, 3))(params.xyz, params.scaling,
                                          params.rotation,
                                          params.features_rest)
    return sum(chk(x) for x in g[:3])


run("D_precompute_fwd", d_precompute_fwd, state.params, state.aux.alive)
run("D_precompute_fwdbwd", d_precompute_fwdbwd, state.params, state.aux.alive)


# ---------------------------------------------------------------- section E
# HBM layout probe: same element count, different minor-dim widths.  If
# [N, k<128] is lane-padded in HBM, the narrow shapes run ~128/k slower than
# flat on a pure copy (y = x * s), which would explain the binning/precompute
# costs and argue for feature-major or flat layouts throughout.
NE = 8_000_000


def e_copy(shape):
    def f(eps, x):
        return (x * (1.0 + eps)).reshape(-1)[::1013].sum()
    return f


for k in (1, 3, 24, 128):
    shp = (NE // k, k) if k > 1 else (NE,)
    x = jnp.asarray(rng.normal(size=shp), jnp.float32)
    run(f"E_copy_{'x'.join(map(str, shp))}", e_copy(shp), x)
x3 = jnp.asarray(rng.normal(size=(NE // 45, 15, 3)), jnp.float32)
run("E_copy_fresty", e_copy(None), x3)
print("rc=0", flush=True)
