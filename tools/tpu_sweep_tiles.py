"""Tile-size / chunk / bwd_matmul sweep at BENCH scale (100k@960x544).

The CUDA reference hard-codes 16x16 tiles (config.h BLOCK_X/Y); our kernels
take tile dims from RasterConfig.  Per-chunk VPU work scales with tile_pix
while instance duplication scales inversely, so the optimum is empirical.
Measures the full fwd+bwd rasterize gradient like tools/tpu_parity_check.py.
"""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import math
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.scene.cameras import camera_geom

P = int(os.environ.get("PROF_P", 100_000))
W, H = int(os.environ.get("PROF_W", 960)), int(os.environ.get("PROF_H", 544))
CAP_MULT = int(os.environ.get("PROF_CAP_MULT", 8))
N = int(os.environ.get("PROF_N", 15))

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
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov),
                  W, H, None)
bg = renderer.default_background(False)

f = renderer.fields_from_params(state.params, state.aux.alive)
ndc, conic, colors, opacity, depth, valid = jax.block_until_ready(
    jax.jit(lambda: renderer.prepare_raster_inputs(f, 3, cam))())
gw = jnp.asarray(rng.normal(size=(10, H, W)), jnp.float32)


def bench(cfg, label):
    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, depth, valid, bg,
                        W, H, cfg)
        return jnp.sum(out["render"] * gw)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    try:
        nr = int(jax.jit(lambda: rasterize(
            ndc, conic, colors, opacity, depth, valid, bg, W, H,
            cfg)["num_rendered"])())
        cap = cfg.instance_capacity(P)
        if nr > cap:
            print(f"{label}: OVERFLOW num_rendered={nr} cap={cap}", flush=True)
            return
        r = g(ndc, conic, colors, opacity * 1.0)
        jax.block_until_ready(r)
        t0 = time.time()
        for i in range(1, N + 1):
            r = g(ndc, conic, colors, opacity * (1.0 - 1e-6 * i))
        jax.block_until_ready(r)
        print(f"{label}: {(time.time()-t0)/N*1000:.2f} ms", flush=True)
    except Exception as e:  # VMEM blowups etc.: report, keep sweeping
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


for tile in (16, 24, 32):
    # smaller tiles duplicate instances across more tiles; scale the slot
    # headroom so truncation can't silently shrink the workload
    cm = max(CAP_MULT, int(round(CAP_MULT * 32 / tile)))
    for chunk in (128, 256):
        cfg = RasterConfig(backend="pallas", tile_w=tile, tile_h=tile,
                           chunk=chunk, capacity_mult=cm)
        bench(cfg, f"tile{tile}_chunk{chunk}_cm{cm}")
for bwd in ("highest", "bf16x2"):
    cfg = RasterConfig(backend="pallas", capacity_mult=CAP_MULT,
                       bwd_matmul=bwd)
    bench(cfg, f"tile32_chunk128_bwd_{bwd}")
print("rc=0", flush=True)
