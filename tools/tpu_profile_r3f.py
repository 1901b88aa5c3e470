"""Round-3f: fwd-kernel vs bwd-kernel vs reduce split at the BENCH scene
(normal-cloud 100k @ 960x544, the scene bench.py times), under the precision
knobs.  Answers: why did fwd_acc=bf16x2 halve fwd-only rasterize but leave
fwd+grad flat in tools/tpu_sweep_knobs.py (uniform scene)?

Everything passes binned arrays as jit ARGUMENTS (the large-constant rule).
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
from gaussianhaircut_tpu.ops.rasterize.api import (
    ndc_xy_to_pixel, _disassemble_cotangent)
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
    return RasterConfig(backend="pallas", capacity_mult=8, sort_mode="packed",
                        chunk=256, bwd_matmul="bf16x2", **kw)


cfg0 = mkcfg()
bg = jnp.zeros(10, jnp.float32)


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
        dpay = pallas_core.raster_core_pallas_bwd(bb, buf, gbuf, W, H, cfg)
        return chk(dpay)
    return f


args_k = (b.payload, b.tile_of_chunk, b.chunk_in_tile)
for acc in ("highest", "bf16x2"):
    run(f"K_fwd acc={acc}", fwd_kernel(mkcfg(fwd_acc=acc)), *args_k)
    run(f"K_fwd+bwd acc={acc}", fwdbwd_kernel(mkcfg(fwd_acc=acc)), *args_k)
run("K_fwd+bwd acc=bf16x2 power=vpu",
    fwdbwd_kernel(mkcfg(fwd_acc="bf16x2", power_mode="vpu")), *args_k)


def reduce_only(cfg):
    tc = b.payload.shape[0]
    ch = cfg.chunk
    dpay0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(tc, 16, ch)), jnp.float32)

    def f(eps, dpay, gid, off, cnt):
        dpay = dpay + eps
        s = tc * ch
        cap = cfg.instance_capacity(P)
        gidf = gid.reshape(s)
        _, order = jax.lax.sort((gidf, jnp.arange(s, dtype=jnp.int32)),
                                num_keys=2)
        if cfg.reduce_mode == "featmajor":
            g16t = dpay.transpose(1, 0, 2).reshape(16, s)
            g16t = jnp.take(g16t, order[:cap], axis=1)
            csum = jnp.cumsum(g16t, axis=1)
            end = jnp.clip(off + cnt - 1, 0, cap - 1)
            seg = (jnp.take(csum, end, axis=1)
                   - jnp.where((off > 0)[None, :],
                               jnp.take(csum, jnp.maximum(off - 1, 0), axis=1),
                               0.0))
            seg = jnp.where((cnt > 0)[None, :], seg, 0.0).T
        else:
            g16 = dpay.swapaxes(1, 2).reshape(s, 16)
            g16 = g16[order[:cap]]
            csum = jnp.cumsum(g16, axis=0)
            end = jnp.clip(off + cnt - 1, 0, cap - 1)
            seg = csum[end] - jnp.where((off > 0)[:, None],
                                        csum[jnp.maximum(off - 1, 0)], 0.0)
            seg = jnp.where((cnt > 0)[:, None], seg, 0.0)
        return chk(seg)
    return f, dpay0


for mode in ("rowmajor", "featmajor"):
    f, dpay0 = reduce_only(mkcfg(reduce_mode=mode))
    run(f"R_reduce {mode}", f, dpay0, b.gid, b.gauss_offset, b.gauss_count)


def raster_e2e(cfg, grad):
    from gaussianhaircut_tpu.ops.rasterize import rasterize

    if grad:
        def loss(eps, ndc, conic, colors, opacity):
            out = rasterize(ndc + eps, conic, colors, opacity, depth, valid,
                            bg, W, H, cfg)
            return jnp.sum(out["render"] ** 2)
        return jax.grad(loss, argnums=(1, 2, 3, 4))
    def f(eps, ndc, conic, colors, opacity):
        out = rasterize(ndc + eps, conic, colors, opacity, depth, valid,
                        bg, W, H, cfg)
        return out["render"].sum()
    return f


args_r = (ndc, conic, colors, opacity)
for acc in ("highest", "bf16x2"):
    run(f"E_rast_fwd acc={acc}", raster_e2e(mkcfg(fwd_acc=acc), False), *args_r)
    run(f"E_rast_grad acc={acc}", raster_e2e(mkcfg(fwd_acc=acc), True), *args_r)
print("rc=0", flush=True)
