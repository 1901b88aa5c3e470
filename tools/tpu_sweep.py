"""Sweep rasterizer configs on TPU: chunk size, tile size, fwd vs fwd+bwd."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize

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
bg = np.zeros(10, np.float32)
jd = jnp.asarray
args = (jd(ndc), jd(conic), jd(colors), jd(opacity))


def bench(cfg, label, grad=True, n=10):
    # vary an input each call so any remote execution/result caching cannot
    # short-circuit repeated identical launches
    if grad:
        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jd(depth), jd(valid),
                            jd(bg), W, H, cfg)
            return jnp.sum(out["render"] ** 2)
        f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    else:
        @jax.jit
        def f(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jd(depth), jd(valid),
                            jd(bg), W, H, cfg)
            return out["render"].sum()
    opac = args[3]
    r = f(args[0], args[1], args[2], opac)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(n):
        r = f(args[0], args[1], args[2], opac * (1.0 - 1e-6 * i))
    jax.block_until_ready(r)
    print(f"{label}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


for chunk in (128, 256):
    for tile in (32, 16):
        cfg = RasterConfig(tile_w=tile, tile_h=tile, chunk=chunk,
                           capacity_mult=8)
        bench(cfg, f"fwd   chunk={chunk} tile={tile}", grad=False)
        bench(cfg, f"f+bwd chunk={chunk} tile={tile}", grad=True)
