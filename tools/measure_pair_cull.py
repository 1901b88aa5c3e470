"""CPU measurement: post-cull pair count vs pre-cull on the bench scene
(pair_cull exact per-(gaussian, tile) opacity culling).  Binning only — runs
anywhere (JAX_PLATFORMS=cpu ok)."""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
from gaussianhaircut_tpu.ops.rasterize.common import RasterConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.scene.cameras import CameraStatic, camera_geom

P = int(os.environ.get("MPC_P", 100000))
W, H = int(os.environ.get("MPC_W", 960)), int(os.environ.get("MPC_H", 544))

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
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov), W, H,
                  None)

f = renderer.fields_from_params(state.params, state.aux.alive)
ndc, conic, colors, opacity, depth, valid = renderer.prepare_raster_inputs(
    f, 3, cam)


def pairs(pair_cull):
    cfg = RasterConfig(backend="jnp", capacity_mult=9, pair_cull=pair_cull)
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg, opacity=opacity)
    b = C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg)
    live = int(jnp.sum(b.gid < P))
    used_chunks = int(jnp.sum(b.chunk_in_tile >= 0))
    return int(b.num_rendered), live, used_chunks


nr0, live0, uc0 = jax.jit(lambda: pairs(False), static_argnums=())()if False else pairs(False)
nr1, live1, uc1 = pairs(True)
print(f"pre-cull:  num_rendered={nr0} live_slots={live0} used_chunks={uc0}")
print(f"pair_cull: num_rendered={nr1} live_slots={live1} used_chunks={uc1}")
print(f"pair reduction: {1 - live1 / max(live0, 1):.1%}, "
      f"chunk reduction: {1 - uc1 / max(uc0, 1):.1%}")
