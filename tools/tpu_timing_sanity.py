"""Validate timing methodology on the axon relay: does wall time scale with
iteration count, and do results actually change with inputs?"""
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
conic = np.tile(np.array([[0.1, 0.0, 0.1]], np.float32), (P, 1))
colors = rng.uniform(0, 1, (P, 10)).astype(np.float32)
opacity = rng.uniform(0.1, 1.0, (P, 1)).astype(np.float32)
depth = rng.uniform(0.5, 10.0, P).astype(np.float32)
valid = np.ones(P, bool)
bg = np.zeros(10, np.float32)
jd = jnp.asarray
cfg = RasterConfig(capacity_mult=8)


def loss(ndc, conic, colors, opacity):
    out = rasterize(ndc, conic, colors, opacity, jd(depth), jd(valid),
                    jd(bg), W, H, cfg)
    return jnp.sum(out["render"] ** 2)


f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
a = (jd(ndc), jd(conic), jd(colors), jd(opacity))
r = f(*a)
jax.block_until_ready(r)
v1 = float(jnp.sum(r[0]))
r2 = f(a[0], a[1], a[2], a[3] * 0.5)
jax.block_until_ready(r2)
v2 = float(jnp.sum(r2[0]))
print(f"grad sums differ with inputs: {v1:.4g} vs {v2:.4g}", flush=True)

for n in (5, 20, 80):
    t0 = time.time()
    for i in range(n):
        r = f(a[0], a[1], a[2], a[3] * (1.0 - 1e-5 * i))
    jax.block_until_ready(r)
    dt = time.time() - t0
    print(f"n={n}: total {dt*1000:.1f} ms, per-iter {dt/n*1000:.2f} ms", flush=True)

# fully synchronous variant: fetch a scalar each iteration
for n in (5, 20):
    t0 = time.time()
    for i in range(n):
        r = f(a[0], a[1], a[2], a[3] * (1.0 - 1e-5 * i))
        float(jnp.sum(r[0]))
    dt = time.time() - t0
    print(f"sync n={n}: per-iter {dt/n*1000:.2f} ms", flush=True)
