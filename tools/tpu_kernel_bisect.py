"""Bisect the fwd/bwd kernel cost: skipped-chunk overhead vs active-chunk
cost, via opacity extremes (opacity->0 keeps every chunk active; opacity
high latches tiles done after ~1 chunk)."""
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

P = int(os.environ.get("PROF_P", 100_000))
W = int(os.environ.get("PROF_W", 960))
H = int(os.environ.get("PROF_H", 544))
cfg = RasterConfig(backend="pallas",
                   tile_w=int(os.environ.get("PROF_TILE", 32)),
                   tile_h=int(os.environ.get("PROF_TILE", 32)),
                   chunk=int(os.environ.get("PROF_CHUNK", 128)),
                   capacity_mult=int(os.environ.get("PROF_CAP_MULT", 4)))

rng = np.random.default_rng(0)
mean_pix = rng.uniform([-5, -5], [W + 5, H + 5], size=(P, 2)).astype(np.float32)
size = np.array([W, H], np.float32)
ndc = np.concatenate([(2 * mean_pix + 1) / size - 1,
                      np.zeros((P, 1), np.float32)], -1)
s1 = rng.uniform(4.0, 60.0, P)
s2 = rng.uniform(4.0, 60.0, P)
th = rng.uniform(0, np.pi, P)
co, si = np.cos(th), np.sin(th)
c00 = co * co * s1 + si * si * s2
c01 = co * si * (s1 - s2)
c11 = si * si * s1 + co * co * s2
det = c00 * c11 - c01 ** 2
conic = np.stack([c11 / det, -c01 / det, c00 / det], -1).astype(np.float32)
colors = rng.uniform(0, 1, (P, 10)).astype(np.float32)
depth = rng.uniform(0.5, 10.0, P).astype(np.float32)
valid = np.ones(P, bool)
jd = jnp.asarray


def timeit(name, f, n=20):
    r = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(i)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


@jax.jit
def prepare(opac):
    mp = ndc_xy_to_pixel(jd(ndc), W, H)
    pre = C.preprocess(mp, jd(conic), jd(depth), jd(valid), W, H, cfg)
    return C.bin_instances(pre, mp, jd(conic), opac, jd(colors), jd(depth),
                           W, H, cfg)


for name, op_val in (("lowop(all-active)", 0.004),
                     ("hiop(max-skip)", 0.999)):
    opac = jnp.full((P, 1), op_val, jnp.float32)
    binned = jax.block_until_ready(prepare(opac))
    tc = binned.payload.shape[0]
    print(f"# {name}: num_rendered={int(binned.num_rendered)} TC={tc}",
          flush=True)

    @jax.jit
    def fwd_only(pay, b=binned):
        return pallas_core.raster_core_pallas_fwd(
            b._replace(payload=pay), W, H, cfg).sum()

    timeit(f"K_fwd {name}", lambda i: fwd_only(
        binned.payload * (1.0 - 1e-6 * i)))

    tile_buf = jax.jit(lambda f, b=binned: pallas_core.raster_core_pallas_fwd(
        b._replace(payload=f), W, H, cfg))(binned.payload)
    gbuf = jnp.zeros((binned.num_tiles, cfg.tile_pix, C.PAD_CHANNELS),
                     jnp.float32).at[:, :, :10].set(1.0)
    jax.block_until_ready(tile_buf)

    @jax.jit
    def bwd_only(pay, b=binned, tb=tile_buf):
        dpay = pallas_core.raster_core_pallas_bwd(
            b._replace(payload=pay), tb, gbuf, W, H, cfg)
        return dpay.sum()

    timeit(f"K_bwd {name}", lambda i: bwd_only(
        binned.payload * (1.0 - 1e-6 * i)))
