"""step_chunks (grouped grid steps) isolation sweep at the bench scene:
K_fwd / K_bwd / K_fwd+bwd under io_mode=manual for group sizes
PROF_GROUPS (default "1,2,4,8"), plus a bit-identity check of every group
against the ungrouped kernel on hardware.

Env: PROF_P / PROF_W / PROF_H / PROF_N as in tpu_profile_r5.py.
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
GROUPS = [int(g) for g in os.environ.get("PROF_GROUPS", "1,2,4,8").split(",")]

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
    return RasterConfig(backend="pallas", capacity_mult=8, io_mode="manual",
                        **kw)


cfg0 = mkcfg()


@jax.jit
def make_binned(ndc, conic, colors, opacity, depth, valid):
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg0, opacity=opacity)
    return C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg0)


b = jax.block_until_ready(
    make_binned(ndc, conic, colors, opacity, depth, valid))
print(f"# P={P} {W}x{H} num_rendered={int(b.num_rendered)} "
      f"cap={cfg0.instance_capacity(P)} chunks={b.payload.shape[0]}",
      flush=True)


def run(name, fn, *args, n=N):
    g = jax.jit(fn)
    r = g(jnp.float32(0), *args)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = g(jnp.float32(i) * 1e-6, *args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return float(jax.block_until_ready(g(jnp.float32(0), *args)))


def chk(x):
    return x.reshape(-1)[::1013].astype(jnp.float32).sum()


def fwd_kernel(cfg):
    def f(eps, payload, tof, kit):
        bb = b._replace(payload=payload + eps, tile_of_chunk=tof,
                        chunk_in_tile=kit)
        buf = pallas_core.raster_core_pallas_fwd(bb, W, H, cfg)
        return chk(buf)
    return f


def fwdbwd_kernel(cfg):
    def f(eps, payload, tof, kit):
        bb = b._replace(payload=payload + eps, tile_of_chunk=tof,
                        chunk_in_tile=kit)
        buf = pallas_core.raster_core_pallas_fwd(bb, W, H, cfg)
        gbuf = buf * 1e-3 + 1.0
        gbuf = gbuf.at[..., C.NUM_CHANNELS:].set(0.0)
        dpay = pallas_core.raster_core_pallas_bwd(bb, buf, gbuf, W, H, cfg)
        return chk(dpay)
    return f


def bwd_kernel_only(cfg):
    buf0 = jax.jit(lambda: pallas_core.raster_core_pallas_fwd(b, W, H, cfg))()
    buf0 = jax.block_until_ready(buf0)

    def f(eps, payload, tof, kit, buf):
        bb = b._replace(payload=payload + eps, tile_of_chunk=tof,
                        chunk_in_tile=kit)
        gbuf = buf * 1e-3 + 1.0
        gbuf = gbuf.at[..., C.NUM_CHANNELS:].set(0.0)
        dpay = pallas_core.raster_core_pallas_bwd(bb, buf, gbuf, W, H, cfg)
        return chk(dpay)
    return f, buf0


args_k = (b.payload, b.tile_of_chunk, b.chunk_in_tile)
vals = {}
for grp in GROUPS:
    cfg = mkcfg(step_chunks=grp)
    vf = run(f"K_fwd g={grp}", fwd_kernel(cfg), *args_k)
    vfb = run(f"K_fwd+bwd g={grp}", fwdbwd_kernel(cfg), *args_k)
    f, buf0 = bwd_kernel_only(cfg)
    run(f"K_bwd g={grp}", f, *args_k, buf0)
    vals[grp] = (vf, vfb)

ref = vals[GROUPS[0]]
ok = all(v == ref for v in vals.values())
print(f"# value check across groups {GROUPS}: "
      f"{'BIT-IDENTICAL' if ok else 'MISMATCH ' + repr(vals)}", flush=True)
print("rc=0", flush=True)
