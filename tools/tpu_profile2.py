"""Trustworthy component profile: varied inputs + linearity check."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize import pallas_core
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel

P = 20000
W, H = 256, 256
rng = np.random.default_rng(0)
mean_pix = rng.uniform([-5, -5], [W + 5, H + 5], size=(P, 2)).astype(np.float32)
size = np.array([W, H], np.float32)
ndc = np.concatenate([(2 * mean_pix + 1) / size - 1, np.zeros((P, 1), np.float32)], -1)
conic = np.tile(np.array([[0.1, 0.0, 0.1]], np.float32), (P, 1))
colors = rng.uniform(0, 1, (P, 10)).astype(np.float32)
opacity = rng.uniform(0.1, 1.0, (P, 1)).astype(np.float32)
depth = rng.uniform(0.5, 10.0, P).astype(np.float32)
valid = np.ones(P, bool)
bg = np.zeros(10, np.float32)
jd = jnp.asarray
cfg = RasterConfig(capacity_mult=8)
A = (jd(ndc), jd(conic), jd(colors), jd(opacity))


def timeit(name, f, n=20):
    r = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(i)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


def vary(i):
    return A[3] * (1.0 - 1e-5 * i)


@jax.jit
def sort_bench(opac):
    cap = cfg.instance_capacity(P)
    keys = (jnp.tile(opac[:, 0], cap // P) * 1000).astype(jnp.int32) % 64
    d = jnp.tile(jd(depth), cap // P) + opac[0, 0]
    g = jnp.arange(cap, dtype=jnp.int32)
    o = jnp.arange(cap, dtype=jnp.int32)
    out = jax.lax.sort((keys, d, g, o), num_keys=3)
    return out[2][::1001].sum()


@jax.jit
def binning_bench(opac):
    mp = ndc_xy_to_pixel(A[0], W, H)
    pre = C.preprocess(mp, A[1], jd(depth), jd(valid), W, H, cfg)
    b = C.bin_instances(pre, mp, A[1], opac, A[2], jd(depth), W, H, cfg)
    return (b.feat[::7].sum() + b.colors[::7].sum()
            + b.gid[::7].sum())


@jax.jit
def fwd_bench(opac):
    out = rasterize(A[0], A[1], A[2], opac, jd(depth), jd(valid), jd(bg),
                    W, H, cfg)
    return out["render"].sum()


def gradf():
    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, jd(depth), jd(valid),
                        jd(bg), W, H, cfg)
        return jnp.sum(out["render"] ** 2)
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))


fg = gradf()

timeit("sort(160k x4)", lambda i: sort_bench(vary(i)))
timeit("binning", lambda i: binning_bench(vary(i)))
timeit("fwd e2e", lambda i: fwd_bench(vary(i)))
timeit("fwd+bwd e2e", lambda i: fg(A[0], A[1], A[2], vary(i)))
