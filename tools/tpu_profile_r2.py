"""Round-2 profile: bisect binning stages + kernels at the bench config
(100k Gaussians, 960x544, realistic conics from the bench scene).

Stages B..F mirror common.bin_instances — keep in sync when editing it.
Timing methodology: vary an input every iteration (the relay memoizes
identical executions), check linearity separately with tpu_timing_sanity.
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
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel, _disassemble_cotangent
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.ops import projection as proj
from gaussianhaircut_tpu.scene.cameras import CameraStatic, camera_geom

P = int(os.environ.get("PROF_P", 100_000))
W = int(os.environ.get("PROF_W", 960))
H = int(os.environ.get("PROF_H", 544))
TILE = int(os.environ.get("PROF_TILE", 32))
CHUNK = int(os.environ.get("PROF_CHUNK", 128))
CAP_MULT = int(os.environ.get("PROF_CAP_MULT", 4))
N = int(os.environ.get("PROF_N", 20))

cfg = RasterConfig(backend="pallas", tile_w=TILE, tile_h=TILE, chunk=CHUNK,
                   capacity_mult=CAP_MULT)

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
bg = renderer.default_background(False)


@jax.jit
def make_inputs(params, alive):
    f = renderer.fields_from_params(params, alive)
    cov3d = proj.covariance_3d(f.scaling, f.rotation_matrix)
    cov2d = proj.covariance_2d(f.xyz, cov3d, cam)
    conic = proj.conic_from_cov2d(cov2d)
    ndc = proj.project_ndc(f.xyz, cam.projmatrix)
    depth = proj.depths(f.xyz, cam)
    from gaussianhaircut_tpu.ops import sh as sh_ops
    from gaussianhaircut_tpu.ops.quaternion import normalize
    dirs = normalize(f.xyz - cam.campos[None, :])
    rgb = jnp.maximum(sh_ops.eval_sh(3, f.features, dirs) + 0.5, 0.0)
    dir2d = proj.direction_2d(f.xyz, f.scaling, f.rotation_matrix, cam)
    colors = jnp.concatenate([rgb, f.label, jnp.ones_like(f.label), dir2d,
                              f.orient_conf, depth], axis=-1)
    return ndc, conic, colors, f.opacity, depth[:, 0], f.valid


ndc, conic, colors, opacity, depth, valid = jax.block_until_ready(
    make_inputs(state.params, state.aux.alive))
print(f"# P={P} {W}x{H} tile={TILE} chunk={CHUNK} cap_mult={CAP_MULT}", flush=True)


def timeit(name, f, n=N):
    r = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(i)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


def make_stage(stage):
    # all tensors are ARGUMENTS (not closures): closed-over constants get
    # constant-folded at compile time, which silently removes the whole
    # index pipeline from stages A..F (observed in the first run of this
    # profile: D_sort "faster" than C_tileids).  Stages mirror
    # common.bin_instances EXACTLY (keep in sync when editing it).
    @jax.jit
    def f(ndc, conic, depth, opac):
        mp = ndc_xy_to_pixel(ndc, W, H)
        pre = C.preprocess(mp, conic, depth, valid, W, H, cfg, opacity=opac)
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
        if stage == "C_tileids":
            return tile_id[::17].sum() + opac.sum()
        inst_depth = jnp.where(inst_valid, depth[gid], jnp.inf).astype(jnp.float32)
        inst_idx = jnp.arange(cap, dtype=jnp.int32)
        tile_sorted, _, _, gid_sorted = jax.lax.sort(
            (tile_id, inst_depth, inst_idx, gid), num_keys=3)
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
        chunk_in_tile = chunk_ids - chunk_start[tile_of_chunk]
        cinfo = jnp.stack([counts, tile_start], axis=-1)[tile_of_chunk]
        lane = jnp.arange(ch, dtype=jnp.int32)[None, :]
        off_in_tile = chunk_in_tile[:, None] * ch + lane
        slot_ok = off_in_tile < cinfo[:, 0:1]
        src = jnp.where(slot_ok, cinfo[:, 1:2] + off_in_tile, cap - 1)
        if stage == "E_chunktables":
            return src[::17].sum() + opac.sum()
        gid_raw = gid_sorted[src.reshape(-1)]
        ok_flat = slot_ok.reshape(-1)
        gid_slot = jnp.where(ok_flat, gid_raw, P).astype(jnp.int32)
        if stage == "F_idgather":
            return gid_slot[::17].sum() + opac.sum()
        safe_gid = jnp.minimum(gid_slot, P - 1)
        okf = ok_flat.astype(jnp.float32)
        pack24 = jnp.concatenate([
            mp, conic, opac,
            jnp.ones((P, 1), mp.dtype), jnp.zeros((P, 1), mp.dtype),
            colors,
            jnp.zeros((P, C.PAD_CHANNELS - colors.shape[1]), mp.dtype),
        ], axis=-1)
        payload = pack24[safe_gid] * okf[:, None]
        payload = payload.reshape(total_chunks, ch, 24).swapaxes(1, 2)
        return payload[::7].sum() + opac.sum()
    return f


for stage in ("A_preprocess", "B_repeat", "C_tileids", "D_sort",
              "E_chunktables", "F_idgather", "G_payload"):
    timeit(stage, lambda i, f=make_stage(stage): f(
        ndc * (1.0 + 1e-7 * i), conic, depth * (1.0 + 1e-7 * i),
        opacity * (1.0 - 1e-5 * i)))


# ---- kernels only (binned precomputed; vary opacity row of feat) ----
@jax.jit
def prepare(opac):
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg, opacity=opac)
    return C.bin_instances(pre, mp, conic, opac, colors, depth, W, H, cfg)


binned = jax.block_until_ready(prepare(opacity))
print(f"# num_rendered={int(binned.num_rendered)} cap={cfg.instance_capacity(P)}"
      f" TC={binned.payload.shape[0]}", flush=True)


@jax.jit
def fwd_only(pay):
    b = binned._replace(payload=pay)
    return pallas_core.raster_core_pallas_fwd(b, W, H, cfg).sum()


timeit("K_fwd", lambda i: fwd_only(binned.payload * (1.0 - 1e-6 * i)))


tile_buf = jax.jit(lambda f: pallas_core.raster_core_pallas_fwd(
    binned._replace(payload=f), W, H, cfg))(binned.payload)
jax.block_until_ready(tile_buf)
gimg = jnp.ones((10, H, W), jnp.float32)
gt_ = jnp.zeros((H, W), jnp.float32)
gbuf = jax.jit(lambda: _disassemble_cotangent(gimg, gt_, bg, W, H, cfg))()
jax.block_until_ready(gbuf)


@jax.jit
def bwd_only(pay):
    b = binned._replace(payload=pay)
    dpay = pallas_core.raster_core_pallas_bwd(b, tile_buf, gbuf, W, H, cfg)
    return dpay.sum()


timeit("K_bwd", lambda i: bwd_only(binned.payload * (1.0 - 1e-6 * i)))


# ---- full rasterize fwd+bwd ----
from gaussianhaircut_tpu.ops.rasterize import rasterize


def loss(ndc_, conic_, colors_, opac_):
    out = rasterize(ndc_, conic_, colors_, opac_, depth, valid, bg, W, H, cfg)
    return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])


gfull = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
timeit("FULL_fwd_bwd", lambda i: gfull(ndc, conic, colors,
                                       opacity * (1.0 - 1e-5 * i)))

ffull = jax.jit(loss)
timeit("FULL_fwd", lambda i: ffull(ndc, conic, colors,
                                   opacity * (1.0 - 1e-5 * i)))


# ---- (tile, chunk) sweep over the full fwd+bwd ----
if os.environ.get("PROF_SWEEP"):
    for tw, th, ck in ((32, 32, 128), (16, 16, 128), (16, 16, 64),
                       (32, 16, 128), (16, 16, 256), (32, 32, 64)):
        scfg = RasterConfig(backend="pallas", tile_w=tw, tile_h=th, chunk=ck,
                            capacity_mult=CAP_MULT)

        def loss_s(ndc_, conic_, colors_, opac_, scfg=scfg):
            out = rasterize(ndc_, conic_, colors_, opac_, depth, valid, bg,
                            W, H, scfg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])

        try:
            g = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))
            nr = int(jax.jit(lambda o: rasterize(
                ndc, conic, colors, o, depth, valid, bg, W, H,
                scfg)["num_rendered"])(opacity))
            cap = scfg.instance_capacity(P)
            gx, gy = scfg.grid(W, H)
            tc = cap // ck + gx * gy
            timeit(f"SWEEP t{tw}x{th} c{ck} (nr={nr} cap={cap} TC={tc})",
                   lambda i: g(ndc, conic, colors, opacity * (1.0 - 1e-5 * i)))
        except Exception as e:
            print(f"SWEEP t{tw}x{th} c{ck}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
