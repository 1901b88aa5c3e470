"""Time rasterizer pipeline stages separately on the TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.ops.rasterize import common as C

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
bg = np.array([1, 1, 1, 0, 0, 0, 0, 0, 0, 100], np.float32)
cfg = RasterConfig(backend="pallas", capacity_mult=8)

jargs = tuple(jnp.asarray(x) for x in (ndc, conic, colors, opacity, depth, valid, bg))


def timeit(name, f, *a, n=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return r


@jax.jit
def binning_only(ndc, conic, colors, opacity, depth, valid, bg):
    from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
    mp = ndc_xy_to_pixel(ndc, W, H)
    pre = C.preprocess(mp, conic, depth, valid, W, H, cfg)
    b = C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg)
    return jax.tree.map(lambda x: x.sum() if x.dtype != jnp.bool_ else x.sum(),
                        (b.feat, b.colors, b.tile_of_chunk))


@jax.jit
def sort_only(depth):
    cap = cfg.instance_capacity(P)
    keys = jnp.tile(depth, cap // P)
    tiles = (keys * 67).astype(jnp.int32) % 64
    gids = jnp.arange(cap, dtype=jnp.int32)
    out = jax.lax.sort((tiles, keys, gids), num_keys=3)
    return out[2].sum()


@jax.jit
def fwd_only(ndc, conic, colors, opacity, depth, valid, bg):
    out = rasterize(ndc, conic, colors, opacity, depth, valid, bg, W, H, cfg)
    return out["render"].sum()


def loss(ndc, conic, colors, opacity):
    out = rasterize(ndc, conic, colors, opacity, jargs[4], jargs[5], jargs[6], W, H, cfg)
    return jnp.sum(out["render"] ** 2)


fwd_bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

timeit("sort_only(160k x3keys)", sort_only, jargs[4])
timeit("binning_only", binning_only, *jargs)
timeit("fwd_only", fwd_only, *jargs)
timeit("fwd+bwd", fwd_bwd, *jargs[:4])
