"""Isolate the TPU backward NaN: compare pallas vs jnp backends on-device."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import rasterize, RasterConfig

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

args = tuple(jnp.asarray(x) for x in (ndc, conic, colors, opacity))


def make_loss(backend):
    cfg = RasterConfig(backend=backend, capacity_mult=8)

    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                        jnp.asarray(valid), jnp.asarray(bg), W, H, cfg)
        return jnp.sum(out["render"] ** 2)
    return loss


for backend in ["jnp", "pallas"]:
    f = jax.jit(jax.value_and_grad(make_loss(backend), argnums=(0, 1, 2, 3)))
    val, grads = f(*args)
    jax.block_until_ready(grads)
    finite = [bool(jnp.all(jnp.isfinite(g))) for g in grads]
    norms = [float(jnp.linalg.norm(jnp.where(jnp.isfinite(g), g, 0))) for g in grads]
    nan_counts = [int(jnp.sum(~jnp.isfinite(g))) for g in grads]
    print(f"{backend}: loss={float(val):.6g} finite={finite} norms={norms} nans={nan_counts}", flush=True)
