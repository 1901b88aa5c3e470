"""Compiled-TPU parity gate: pallas backend vs jnp oracle, forward AND
gradients, at a non-trivial scale.  Run after ANY kernel change (memory:
round-1 hardware bugs were invisible in interpret mode)."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize

P = int(os.environ.get("PAR_P", 20000))
W, H = int(os.environ.get("PAR_W", 256)), int(os.environ.get("PAR_H", 256))
TILE = int(os.environ.get("PAR_TILE", 32))
CHUNK = int(os.environ.get("PAR_CHUNK", 128))

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
bg = np.array([1, 1, 1, 0, 0, 0, 0, 0, 0, 100], np.float32)
jd = jnp.asarray
args = (jd(ndc), jd(conic), jd(colors), jd(opacity))
depth_j, valid_j, bg_j = jd(depth), jd(valid), jd(bg)

gw = jnp.asarray(rng.normal(size=(10, H, W)), jnp.float32)


BWD_MATMUL = os.environ.get("PAR_BWD_MATMUL", "highest")
SORT_MODE = os.environ.get("PAR_SORT", "packed")
POWER_MODE = os.environ.get("PAR_POWER", "matmul")
FWD_ACC = os.environ.get("PAR_FWD_ACC", "bf16x2")
REDUCE_MODE = os.environ.get("PAR_REDUCE", "rowmajor")
# pair_cull applies to the PALLAS side only: the jnp oracle keeps every
# pair, so this gates exactness of the cull AND kernel parity in one run
PAIR_CULL = bool(int(os.environ.get("PAR_PAIR_CULL", "0")))
REDUCE_CUMSUM = os.environ.get("PAR_REDUCE_CUMSUM", "linear")
IO_MODE = os.environ.get("PAR_IO", "auto")
STEP_CHUNKS = int(os.environ.get("PAR_STEP_CHUNKS", "1"))


def make(backend):
    # the jnp oracle always runs the exact/highest path; the pallas side
    # takes the knobs under test
    cfg = RasterConfig(backend=backend, tile_w=TILE, tile_h=TILE, chunk=CHUNK,
                       capacity_mult=8,
                       bwd_matmul=BWD_MATMUL if backend == "pallas" else "highest",
                       sort_mode=SORT_MODE if backend == "pallas" else "exact",
                       power_mode=POWER_MODE if backend == "pallas" else "matmul",
                       fwd_acc=FWD_ACC if backend == "pallas" else "highest",
                       reduce_mode=REDUCE_MODE if backend == "pallas"
                       else "rowmajor",
                       reduce_cumsum=REDUCE_CUMSUM if backend == "pallas"
                       else "linear",
                       pair_cull=PAIR_CULL if backend == "pallas" else False,
                       io_mode=IO_MODE if backend == "pallas" else "auto",
                       step_chunks=STEP_CHUNKS if backend == "pallas" else 1)

    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, depth_j, valid_j, bg_j,
                        W, H, cfg)
        return (jnp.sum(out["render"] * gw) + jnp.sum(out["final_T"]),
                (out["render"], out["final_T"]))

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True))


(vp, (imp, tp)), gp = jax.block_until_ready(make("pallas")(*args))
(vj, (imj, tj)), gj = jax.block_until_ready(make("jnp")(*args))

print(f"P={P} {W}x{H} tile={TILE} chunk={CHUNK} bwd_matmul={BWD_MATMUL} "
      f"sort={SORT_MODE} power={POWER_MODE} fwd_acc={FWD_ACC} "
      f"reduce={REDUCE_MODE}")
ok = True
# Thresholds are calibrated to the measured compiled-vs-jnp noise floor of
# the UNMODIFIED round-1 kernels on this exact scene (2026-08-16,
# /tmp/parity_old.log): max rel diffs concentrate at discrete
# contributing-set flips (alpha/T_EPS threshold crossings under float
# reordering), so the gate is max-diff <= 2x that floor PLUS a tight p99.9
# on the bulk of the pixels.
for ch in range(10):
    scale = float(jnp.abs(imj[ch]).max()) + 1e-8
    d = np.abs(np.asarray(imp[ch] - imj[ch])) / scale
    dmax, d999 = float(d.max()), float(np.percentile(d, 99.9))
    good = dmax < 2e-2 and d999 < 5e-3
    ok = ok and good
    print(f"fwd ch{ch}: rel diff max={dmax:.3e} p99.9={d999:.3e}"
          f"{'' if good else '  <-- FAIL'}")
t_diff = float(jnp.abs(tp - tj).max())
print(f"fwd final_T: max diff={t_diff:.3e}")
ok = ok and t_diff < 3e-3
for name, a, b in zip(("ndc", "conic", "colors", "opacity"), gp, gj):
    scale = float(jnp.abs(b).max()) + 1e-8
    d = np.abs(np.asarray(a - b)) / scale
    dmax, d999 = float(d.max()), float(np.percentile(d, 99.9))
    good = dmax < 7e-2 and d999 < 5e-3
    ok = ok and good
    print(f"grad {name}: rel diff max={dmax:.3e} p99.9={d999:.3e}"
          f"{'' if good else '  <-- FAIL'}")
print("PARITY OK" if ok else "PARITY FAIL")
sys.exit(0 if ok else 1)
