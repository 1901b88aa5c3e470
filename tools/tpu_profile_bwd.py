"""Split the backward cost: bwd kernel alone vs scatter-add transpose."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
from gaussianhaircut_tpu.ops.rasterize import pallas_core

P = 20000
W, H = 256, 256
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
cfg = RasterConfig(capacity_mult=8)
jd = jnp.asarray


@jax.jit
def binned_arrays(ndc, conic, colors, opacity):
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, jd(depth), jd(valid), W, H, cfg)
    b = C.bin_instances(pre, mp, conic, opacity, colors, jd(depth), W, H, cfg)
    return b


b = binned_arrays(jd(ndc), jd(conic), jd(colors), jd(opacity))
b = jax.tree.map(jax.device_get, b)
b = C.Binned(*[jnp.asarray(x) if not isinstance(x, int) else x for x in b])
nt = int(b.num_tiles) if not isinstance(b.num_tiles, int) else b.num_tiles


def timeit(name, f, *a, n=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


@jax.jit
def kernel_only_grad(feat, col):
    bb = b._replace(feat=feat, colors=col)
    buf = pallas_core.raster_core_pallas_fwd(bb, W, H, cfg)
    gbuf = jnp.ones_like(buf)
    dfeat, dcol = pallas_core.raster_core_pallas_bwd(bb, buf, gbuf, W, H, cfg)
    return jnp.sum(dfeat) + jnp.sum(dcol)


@jax.jit
def kernel_fwd_only(feat, col):
    bb = b._replace(feat=feat, colors=col)
    buf = pallas_core.raster_core_pallas_fwd(bb, W, H, cfg)
    return jnp.sum(buf)


@jax.jit
def scatter_only(dfeat_like, gid):
    # emulate the gather-transpose: scatter-add [S, 8] rows into [P, 8]
    s = dfeat_like.reshape(-1, 8)
    g = gid.reshape(-1)
    return jax.ops.segment_sum(s, g, num_segments=P + 1)


@jax.jit
def full_grad(ndc, conic, colors, opacity):
    from gaussianhaircut_tpu.ops.rasterize.api import rasterize
    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, jd(depth), jd(valid),
                        jnp.zeros(10), W, H, cfg)
        return jnp.sum(out["render"] ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3))(ndc, conic, colors, opacity)


timeit("kernel fwd only", kernel_fwd_only, b.feat, b.colors)
timeit("kernel fwd+bwd grad", kernel_only_grad, b.feat, b.colors)
dfeat_like = jnp.ones_like(b.feat).swapaxes(1, 2)
timeit("segment_sum emulation", scatter_only, dfeat_like, b.gid)
timeit("full fwd+bwd", full_grad, jd(ndc), jd(conic), jd(colors), jd(opacity))
