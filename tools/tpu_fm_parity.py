"""Hardware parity gate for the feature-major precompute (ops/precompute_fm).

Compares prepare_fm vs prepare_raster_inputs_rowmajor ON THE REAL BACKEND
(fwd outputs and input cotangents) at bench-like scale, then times both
variants.  Run before flipping QH_PRECOMPUTE's default to "fm" — the CPU
equivalence test (tests/test_ops.py::test_prepare_fm_matches_rowmajor)
cannot see TPU-only numeric hazards (NOTES_ROUND3 regression postmortem).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops import precompute_fm
from gaussianhaircut_tpu.ops.quaternion import build_rotation
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.scene.cameras import camera_geom

P = int(os.environ.get("FM_P", 100_000))
print(f"# backend={jax.default_backend()} P={P}", flush=True)

rng = np.random.default_rng(0)
quat = rng.normal(size=(P, 4)).astype(np.float32) + np.array(
    [2.0, 0, 0, 0], np.float32)
fields = renderer.GaussianFields(
    xyz=jnp.asarray(rng.normal(scale=0.4, size=(P, 3)).astype(np.float32)),
    features=jnp.asarray(rng.normal(size=(P, 16, 3)).astype(np.float32) * 0.3),
    scaling=jnp.asarray(np.exp(rng.normal(size=(P, 3)).astype(np.float32)
                               * 0.3 - 4)),
    rotation_matrix=build_rotation(jnp.asarray(quat)),
    opacity=jnp.asarray(rng.uniform(0.1, 0.9, (P, 1)).astype(np.float32)),
    label=jnp.asarray(rng.uniform(0, 1, (P, 1)).astype(np.float32)),
    orient_conf=jnp.asarray(rng.uniform(0, 2, (P, 1)).astype(np.float32)),
    valid=jnp.ones((P,), bool),
    viewspace=jnp.zeros((P, 3), jnp.float32),
    use_direction=jnp.asarray((rng.uniform(size=P) > 0.3).astype(np.float32)),
)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, 3] = [0.03, -0.1, 2.2]
fov = np.float32(np.radians(47.0))
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov),
                  960, 544, None)

DIFF = ("xyz", "features", "scaling", "rotation_matrix", "opacity", "label",
        "orient_conf")
cot_rng = np.random.default_rng(1)


def run(fn, f):
    ndc, conic, colors, opacity, depth, _ = fn(f, 3, cam, 1.0)
    return ndc, conic, colors, opacity, depth


# Oracle: the row-major chain with every matmul forced to f32-exact
# (Precision.HIGHEST).  The PLAIN row-major path runs its [P,3,3] batched
# matmuls at the TPU default precision (bf16-truncated operands), so
# comparing fm directly against it conflates fm's error with rowmajor's own
# bf16 noise — the first run of this gate "failed" exactly that way (fwd
# rel p99.9 ~7e-2 against plain rowmajor, while the CPU f32 test passes at
# rtol 2e-4: fm's all-VPU math is the MORE accurate variant on TPU).
with jax.default_matmul_precision("highest"):
    ref0 = jax.jit(
        lambda f: run(renderer.prepare_raster_inputs_rowmajor, f))(fields)
row_plain = jax.jit(
    lambda f: run(renderer.prepare_raster_inputs_rowmajor, f))(fields)
cots = [jnp.asarray(cot_rng.normal(size=np.shape(t)).astype(np.float32))
        for t in ref0]


def make_loss(fn):
    def loss(d):
        outs = run(fn, fields._replace(**d))
        return sum(jnp.vdot(c, o) for c, o in zip(cots, outs))
    return loss


dvals = {k: getattr(fields, k) for k in DIFF}
with jax.default_matmul_precision("highest"):
    g_ref = jax.jit(
        jax.grad(make_loss(renderer.prepare_raster_inputs_rowmajor)))(dvals)
g_ref_fn = jax.jit(jax.grad(make_loss(renderer.prepare_raster_inputs_rowmajor)))
g_fm_fn = jax.jit(jax.grad(make_loss(precompute_fm.prepare_fm)))
fm_fn = jax.jit(lambda f: run(precompute_fm.prepare_fm, f))

got = fm_fn(fields)
g_fm = g_fm_fn(dvals)


def relmax(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1e-6)
    rel = np.abs(a - b) / scale
    return float(np.quantile(rel, 0.999)), float(rel.max())


ok = True
for i, name in enumerate(("ndc", "conic", "colors", "opacity", "depth")):
    p999, mx = relmax(got[i], ref0[i])
    p_row, _ = relmax(row_plain[i], ref0[i])
    print(f"# fwd {name}: fm-vs-exact rel-to-max p99.9={p999:.3e} "
          f"max={mx:.3e} (plain rowmajor: {p_row:.3e})")
    ok &= bool(p999 <= 3e-3)
for k in DIFF:
    p999, mx = relmax(g_fm[k], g_ref[k])
    print(f"# grad {k}: rel-to-max p99.9={p999:.3e} max={mx:.3e}")
    ok &= bool(p999 <= 3e-3)

# ---- timing: fwd + grad, varying an input each iter (relay-cache guard) ----
def bench(fwd, gradf, tag):
    xs = fields.xyz
    for _ in range(2):
        jax.block_until_ready(fwd(fields))
        jax.block_until_ready(gradf(dvals))
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        f = fields._replace(xyz=xs + 1e-6 * i)
        jax.block_until_ready(fwd(f))
        d = dict(dvals, xyz=xs + 1e-6 * i)
        jax.block_until_ready(gradf(d))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"# time {tag}: {dt:.2f} ms fwd+grad", flush=True)
    return dt


t_row = bench(jax.jit(lambda f: run(renderer.prepare_raster_inputs_rowmajor,
                                    f)), g_ref_fn, "rowmajor")
t_fm = bench(fm_fn, g_fm_fn, "fm")
print(f"# PARITY {'PASS' if ok else 'FAIL'}; rowmajor {t_row:.2f} ms -> "
      f"fm {t_fm:.2f} ms", flush=True)
sys.exit(0 if ok else 1)
