"""Time the round-3 kernel precision knobs at bench scale.

Combos of power_mode (matmul = HIGHEST-precision MXU polynomial | vpu =
centered-difference f32 VPU, no MXU pass) x fwd_acc (highest 6-pass | bf16x2
3-pass accumulation matmul), on fwd-only and fwd+grad, at the 100k@960x544
bench geometry.  bwd_matmul stays bf16x2 (already the default).

Methodology as tools/tpu_sweep.py: vary an input per call, warmup once,
wall-clock N calls.
"""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize

P = int(os.environ.get("SWP_P", 100_000))
W, H = int(os.environ.get("SWP_W", 960)), int(os.environ.get("SWP_H", 544))
N = int(os.environ.get("SWP_N", 20))

rng = np.random.default_rng(0)
mean_pix = rng.uniform([-5, -5], [W + 5, H + 5], size=(P, 2)).astype(np.float32)
size = np.array([W, H], np.float32)
ndc = np.concatenate([(2 * mean_pix + 1) / size - 1,
                      np.zeros((P, 1), np.float32)], -1)
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
depth_j, valid_j, bg_j = jd(depth), jd(valid), jd(bg)


def bench(cfg, label, grad, n=N):
    if grad:
        def loss(eps, ndc, conic, colors, opacity):
            out = rasterize(ndc + eps, conic, colors, opacity, depth_j,
                            valid_j, bg_j, W, H, cfg)
            return jnp.sum(out["render"] ** 2)
        f = jax.jit(jax.grad(loss, argnums=(1, 2, 3, 4)))
    else:
        @jax.jit
        def f(eps, ndc, conic, colors, opacity):
            out = rasterize(ndc + eps, conic, colors, opacity, depth_j,
                            valid_j, bg_j, W, H, cfg)
            return out["render"].sum()
    r = f(jnp.float32(0), *args)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(jnp.float32(i) * 1e-7, *args)
    jax.block_until_ready(r)
    print(f"{label}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


for power in ("matmul", "vpu"):
    for acc in ("highest", "bf16x2"):
        cfg = RasterConfig(backend="pallas", capacity_mult=8,
                           sort_mode="packed", chunk=256,
                           bwd_matmul="bf16x2",
                           power_mode=power, fwd_acc=acc)
        bench(cfg, f"fwd      power={power:6s} acc={acc:7s}", grad=False)
        bench(cfg, f"fwd+grad power={power:6s} acc={acc:7s}", grad=True)

# backward segment-reduction layout (bit-identical math, layout-only change)
cfg = RasterConfig(backend="pallas", capacity_mult=8, sort_mode="packed",
                   chunk=256, bwd_matmul="bf16x2", reduce_mode="featmajor")
bench(cfg, "fwd+grad reduce=featmajor (power=matmul acc=highest)", grad=True)
print("rc=0", flush=True)
