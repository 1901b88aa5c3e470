"""Find the compiled-vs-interpret discrepancy pattern in the fwd kernel."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize import pallas_core
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel

P = 2000
W, H = 128, 128
rng = np.random.default_rng(0)
mean_pix = rng.uniform([-5, -5], [W + 5, H + 5], size=(P, 2)).astype(np.float32)
size = np.array([W, H], np.float32)
ndc = np.concatenate([(2 * mean_pix + 1) / size - 1, np.zeros((P, 1), np.float32)], -1)
s1 = rng.uniform(1.0, 25.0, P)
s2 = rng.uniform(1.0, 25.0, P)
th = rng.uniform(0, np.pi, P)
c, s = np.cos(th), np.sin(th)
c00 = c * c * s1 + s * s * s2
c01 = c * s * (s1 - s2)
c11 = s * s * s1 + c * c * s2
det = c00 * c11 - c01 ** 2
conic = np.stack([c11 / det, -c01 / det, c00 / det], -1).astype(np.float32)
colors = rng.uniform(0, 1, (P, 10)).astype(np.float32)
opacity = rng.uniform(0.1, 1.0, (P, 1)).astype(np.float32)
depth = rng.uniform(0.5, 10.0, P).astype(np.float32)
valid = np.ones(P, bool)
bg = np.array([1, 1, 1, 0, 0, 0, 0, 0, 0, 100], np.float32)
cfg = RasterConfig(capacity_mult=8)

jd = jnp.asarray


@jax.jit
def tile_bufs(ndc, conic, colors, opacity):
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, jd(depth), jd(valid), W, H, cfg)
    b = C.bin_instances(pre, mp, conic, opacity, colors, jd(depth), W, H, cfg)
    buf_pallas = pallas_core.raster_core_pallas_fwd(b, W, H, cfg, interpret=False)
    from gaussianhaircut_tpu.ops.rasterize import jnp_core
    buf_jnp = jnp_core.raster_core_jnp(b, W, H, cfg)
    return buf_pallas, buf_jnp, b.tile_of_chunk, b.chunk_in_tile


bp, bj, tof, kit = jax.device_get(tile_bufs(jd(ndc), jd(conic), jd(colors), jd(opacity)))
diff = np.abs(bp - bj).max(axis=(1, 2))  # per tile
print("num tiles:", bp.shape[0], "max diff per tile percentiles:",
      np.percentile(diff, [0, 50, 90, 100]))
bad = np.argsort(diff)[::-1][:10]
print("worst tiles:", bad, "diffs:", diff[bad])
# chunks per tile
import collections
cnt = collections.Counter(tof.tolist())
print("chunks per worst tiles:", [cnt[t] for t in bad])
print("chunks-per-tile histogram:", collections.Counter(cnt.values()))
t = int(bad[0])
print("tile", t, "pallas ch15 head:", bp[t, :4, 15], "jnp ch15:", bj[t, :4, 15])
print("tile", t, "pallas ch0 head:", bp[t, :4, 0], "jnp ch0:", bj[t, :4, 0])
good = np.argsort(diff)[:3]
print("best tiles:", good, "chunks:", [cnt[int(g)] for g in good])
