"""Smoke-test the Pallas rasterizer on the real TPU chip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from gaussianhaircut_tpu.ops.rasterize import rasterize, RasterConfig

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


def loss(ndc, conic, colors, opacity):
    out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                    jnp.asarray(valid), jnp.asarray(bg), W, H, cfg)
    return jnp.sum(out["render"] ** 2), out["num_rendered"]


f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True))
t0 = time.time()
(val, nrend), grads = f(jnp.asarray(ndc), jnp.asarray(conic),
                        jnp.asarray(colors), jnp.asarray(opacity))
jax.block_until_ready(grads)
print(f"first call (compile): {time.time()-t0:.1f}s  loss={float(val):.4g} num_rendered={int(nrend)}", flush=True)

t0 = time.time()
n = 10
for _ in range(n):
    (val, nrend), grads = f(jnp.asarray(ndc), jnp.asarray(conic),
                            jnp.asarray(colors), jnp.asarray(opacity))
jax.block_until_ready(grads)
dt = (time.time() - t0) / n
print(f"steady: {dt*1000:.2f} ms/iter  ({(W*H)/dt/1e6:.1f} Mpix/s fwd+bwd)", flush=True)
g = grads[0]
print("grad ndc finite:", bool(jnp.all(jnp.isfinite(g))), "norm:", float(jnp.linalg.norm(g)), flush=True)
