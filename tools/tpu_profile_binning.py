"""Bisect the binning cost stage by stage."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel

P = 20000
W, H = 256, 256
rng = np.random.default_rng(0)
mean_pix = rng.uniform([-5, -5], [W + 5, H + 5], size=(P, 2)).astype(np.float32)
size = np.array([W, H], np.float32)
ndc = np.concatenate([(2 * mean_pix + 1) / size - 1, np.zeros((P, 1), np.float32)], -1)
conic = np.tile(np.array([[0.1, 0.0, 0.1]], np.float32), (P, 1))
colors = rng.uniform(0, 1, (P, 10)).astype(np.float32)
opacity = rng.uniform(0.1, 1.0, (P, 1)).astype(np.float32)
depth = rng.uniform(0.5, 10.0, P).astype(np.float32)
valid = np.ones(P, bool)
jd = jnp.asarray
cfg = RasterConfig(capacity_mult=8)
A = (jd(ndc), jd(conic), jd(colors), jd(opacity))


def timeit(name, f, n=20):
    r = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(i)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


def make_stage(stage):
    @jax.jit
    def f(opac):
        mp = ndc_xy_to_pixel(A[0], W, H)
        pre = C.preprocess(mp, A[1], jd(depth), jd(valid), W, H, cfg)
        gx_grid, gy_grid = cfg.grid(W, H)
        num_tiles = gx_grid * gy_grid
        cap = cfg.instance_capacity(P)
        ch = cfg.chunk
        rmin_x, rmin_y, rmax_x, rmax_y = pre.rect
        offsets = jnp.cumsum(pre.tiles_touched) - pre.tiles_touched
        total = offsets[-1] + pre.tiles_touched[-1]
        if stage == "A_preprocess":
            return pre.tiles_touched.sum() + opac.sum()
        gid = jnp.repeat(jnp.arange(P, dtype=jnp.int32), pre.tiles_touched,
                         total_repeat_length=cap)
        if stage == "B_repeat":
            return gid[::17].sum() + opac.sum()
        inst_valid = jnp.arange(cap, dtype=jnp.int32) < total
        within = jnp.arange(cap, dtype=jnp.int32) - offsets[gid].astype(jnp.int32)
        rect_w = jnp.maximum(rmax_x - rmin_x, 1)[gid]
        q = jnp.floor((within.astype(jnp.float32) + 0.5)
                      / rect_w.astype(jnp.float32)).astype(jnp.int32)
        tile_x = rmin_x[gid] + (within - q * rect_w)
        tile_y = rmin_y[gid] + q
        tile_id = jnp.where(inst_valid, tile_y * gx_grid + tile_x,
                            num_tiles).astype(jnp.int32)
        if stage == "C_tileids":
            return tile_id[::17].sum() + opac.sum()
        inst_depth = jnp.where(inst_valid, jd(depth)[gid], jnp.inf).astype(jnp.float32)
        inst_idx = jnp.arange(cap, dtype=jnp.int32)
        tile_sorted, _, gid_sorted, orig_sorted = jax.lax.sort(
            (tile_id, inst_depth, gid, inst_idx), num_keys=3)
        if stage == "D_sort":
            return gid_sorted[::17].sum() + opac.sum()
        bounds = jnp.searchsorted(tile_sorted,
                                  jnp.arange(num_tiles + 1, dtype=jnp.int32))
        counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
        tile_start = bounds[:-1].astype(jnp.int32)
        nchunks = jnp.maximum(1, -(-counts // ch))
        chunk_start = jnp.cumsum(nchunks) - nchunks
        total_chunks = cap // ch + num_tiles
        chunk_ids = jnp.arange(total_chunks, dtype=jnp.int32)
        tile_of_chunk = jnp.searchsorted(chunk_start, chunk_ids,
                                         side="right").astype(jnp.int32) - 1
        tile_of_chunk = jnp.clip(tile_of_chunk, 0, num_tiles - 1)
        slot = jnp.arange(total_chunks * ch, dtype=jnp.int32)
        slot_tile = tile_of_chunk[slot // ch]
        off_in_tile = slot - chunk_start[slot_tile] * ch
        slot_ok = off_in_tile < counts[slot_tile]
        src = jnp.where(slot_ok, tile_start[slot_tile] + off_in_tile, cap - 1)
        gid_slot = jnp.where(slot_ok, gid_sorted[src], P).astype(jnp.int32)
        if stage == "E_slots":
            return gid_slot[::17].sum() + opac.sum()
        safe_gid = jnp.minimum(gid_slot, P - 1)
        okf = slot_ok.astype(jnp.float32)
        feat_cols = jnp.stack([
            mp[safe_gid, 0] * okf, mp[safe_gid, 1] * okf,
            A[1][safe_gid, 0] * okf, A[1][safe_gid, 1] * okf,
            A[1][safe_gid, 2] * okf, opac[safe_gid, 0] * okf,
            okf, jnp.zeros_like(okf)], axis=-1)
        feat = feat_cols.reshape(total_chunks, ch, 8).swapaxes(1, 2)
        col = A[2][safe_gid] * okf[:, None]
        col = jnp.pad(col, ((0, 0), (0, 6)))
        col = col.reshape(total_chunks, ch, 16)
        return feat[::7].sum() + col[::7].sum()
    return f


for stage in ("A_preprocess", "B_repeat", "C_tileids", "D_sort", "E_slots",
              "F_full"):
    f = make_stage(stage)
    timeit(stage, lambda i, f=f: f(A[3] * (1.0 - 1e-5 * i)))
