"""pair_cull retire-or-win measurement on its CLAIMED home turf: a strand
scene (many SMALL anisotropic gaussians, where the AABB's corner tiles are a
real fraction of the pairs).  Reports (a) the live-pair savings and (b) the
end-to-end rasterize grad time with the cull on/off.

CPU gives (a); run on the TPU for (b).  VERDICT r4 weak #7: the 1M big-blob
bench LOSES with the cull (2.168 vs 2.235 it/s); this is the measurement the
keep/retire decision rides on."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models.strands import strands_to_gaussians
from gaussianhaircut_tpu.models.textured_strands import synthetic_scalp_pool
from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.scene.cameras import camera_geom

N_STRANDS = int(os.environ.get("MPC_STRANDS", 10000))
LENGTH = int(os.environ.get("MPC_LENGTH", 100))
W, H = int(os.environ.get("MPC_W", 960)), int(os.environ.get("MPC_H", 544))
N = int(os.environ.get("MPC_N", 10))

rng = np.random.default_rng(0)
pool = synthetic_scalp_pool(max(20000, N_STRANDS))
roots = np.asarray(pool.origins[:N_STRANDS])
# local2world columns are (tangent, bitangent, normal)
normals = np.asarray(pool.local2world[:N_STRANDS, :, 2])

# synthetic hair: root -> wavy downward strands, segment ~8e-4 units
seg = 8e-4
t = np.linspace(0, 1, LENGTH - 1)[None, :, None]
grav = np.array([0.0, -1.0, 0.0])[None, None]
wob = rng.normal(scale=0.35, size=(N_STRANDS, 1, 3))
curl = np.stack([np.sin(12 * math.pi * t[..., 0] + rng.uniform(
    0, 2 * math.pi, (N_STRANDS, 1))), np.cos(
    12 * math.pi * t[..., 0] + rng.uniform(0, 2 * math.pi, (N_STRANDS, 1))),
    np.zeros((N_STRANDS, LENGTH - 1))], axis=-1) * 0.2
dirs = (normals[:, None] * (1 - t) + grav * t + wob + curl)
dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True) * seg
pts = np.concatenate([roots[:, None],
                      roots[:, None] + np.cumsum(dirs, axis=1)], axis=1)
sg = strands_to_gaussians(jnp.asarray(pts, jnp.float32),
                          jnp.asarray(6e-4, jnp.float32))
n = sg.xyz.shape[0]
print(f"# {N_STRANDS} strands x L={LENGTH} -> {n} gaussians", flush=True)

fov = math.radians(35)
center = np.asarray(pts.reshape(-1, 3).mean(0)) + np.array([0.0, 0.0, 0.6])
fwd = np.array([0.0, 0.0, -1.0])
up = np.array([0.0, 1.0, 0.0])
right = np.cross(up, fwd)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
w2c[:3, 3] = -w2c[:3, :3] @ center
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov),
                  W, H, None)

from gaussianhaircut_tpu.render.renderer import GaussianFields

k = 1
fields = GaussianFields(
    xyz=sg.xyz,
    features=jnp.broadcast_to(jnp.asarray([[0.3, 0.2, 0.1]], jnp.float32),
                              (n, 3)).reshape(n, 1, 3) * jnp.ones((n, k, 3)),
    scaling=sg.scaling, rotation_matrix=sg.rotation_matrix,
    opacity=jnp.full((n, 1), 0.8, jnp.float32),
    label=jnp.ones((n, 1), jnp.float32),
    orient_conf=jnp.ones((n, 1), jnp.float32),
    valid=jnp.ones(n, bool),
    viewspace=jnp.zeros((n, 3), jnp.float32),
    use_direction=jnp.ones(n, jnp.float32))
ndc, conic, colors, opacity, depth, valid = renderer.prepare_raster_inputs(
    fields, 0, cam)

# (a) live-pair savings (any backend)
for cull in (False, True):
    cfg = RasterConfig(backend="jnp", capacity_mult=10, pair_cull=cull)
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg, opacity=opacity)
    b = C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg)
    live = int(jnp.sum(b.gid < n))
    print(f"pairs cull={int(cull)}: live={live}", flush=True)

# (b) end-to-end rasterize grad time (meaningful on TPU)
bg = jnp.zeros(10, jnp.float32)
for cull in (False, True):
    cfg = RasterConfig(backend="pallas", capacity_mult=10, pair_cull=cull,
                       io_mode=os.environ.get("MPC_IO", "auto"))

    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, depth, valid, bg,
                        W, H, cfg)
        return jnp.sum(out["render"] ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    r = jax.block_until_ready(g(ndc, conic, colors, opacity))
    t0 = time.time()
    for i in range(N):
        r = g(ndc + jnp.float32(i) * 1e-7, conic, colors, opacity)
    jax.block_until_ready(r)
    print(f"E_rast_grad cull={int(cull)}: {(time.time()-t0)/N*1000:.2f} ms",
          flush=True)
print("rc=0", flush=True)
