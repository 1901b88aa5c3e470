"""Single-chunk kernel debug: dump spatial pattern of pallas vs jnp tiles."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize import pallas_core, jnp_core
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel

W = H = 64
# three isotropic gaussians at known pixel positions
mean_pix = np.array([[16.0, 16.0], [40.0, 12.0], [20.0, 50.0]], np.float32)
P = mean_pix.shape[0]
size = np.array([W, H], np.float32)
ndc = np.concatenate([(2 * mean_pix + 1) / size - 1, np.zeros((P, 1), np.float32)], -1)
conic = np.tile(np.array([[1 / 16.0, 0.0, 1 / 16.0]], np.float32), (P, 1))  # sigma=4px
colors = np.eye(3, 10, dtype=np.float32) * 1.0
opacity = np.full((P, 1), 0.8, np.float32)
depth = np.array([1.0, 2.0, 3.0], np.float32)
valid = np.ones(P, bool)
cfg = RasterConfig(capacity_mult=64)

jd = jnp.asarray


@jax.jit
def tile_bufs(ndc, conic, colors, opacity):
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, jd(depth), jd(valid), W, H, cfg)
    b = C.bin_instances(pre, mp, conic, opacity, colors, jd(depth), W, H, cfg)
    bp = pallas_core.raster_core_pallas_fwd(b, W, H, cfg, interpret=False)
    bj = jnp_core.raster_core_jnp(b, W, H, cfg)
    return bp, bj, b.tile_of_chunk, b.chunk_in_tile


bp, bj, tof, kit = jax.device_get(tile_bufs(jd(ndc), jd(conic), jd(colors), jd(opacity)))
print("chunks:", list(zip(tof.tolist(), kit.tolist()))[:10])
print("maxdiff per tile:", np.abs(bp - bj).max(axis=(1, 2)))
np.set_printoptions(precision=3, suppress=True, linewidth=250)
print("per-tile per-channel maxdiff:")
print(np.abs(bp - bj).max(axis=1))
t = 2
print("tile2 ch2 pallas (every 4th):")
print(bp[t, :, 2].reshape(32, 32)[::4, ::4])
print("tile2 ch2 jnp (every 4th):")
print(bj[t, :, 2].reshape(32, 32)[::4, ::4])
print("tile0 ch15 maxdiff loc:", np.abs(bp[0,:,15]-bj[0,:,15]).max())
print("tile0 per-ch maxdiff:", np.abs(bp[0]-bj[0]).max(axis=0))
