"""Per-leaf vs flat-vector Adam at bench scale, on hardware.

The flat variant (ea52414) was committed from a dispatch-overhead argument;
this measures both ends of the tradeoff directly (see optim.adam_update).
"""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.train import optim

P = int(os.environ.get("PROF_P", 100_000))
N = int(os.environ.get("PROF_N", 30))

rng = np.random.default_rng(0)
pts = rng.normal(scale=0.3, size=(P, 3)).astype(np.float32)
cols = rng.uniform(0.2, 0.8, size=(P, 3)).astype(np.float32)
state = gm.create_from_pcd(pts, cols, P, 3, 1.0)
params0 = state.params
grads0 = jax.tree.map(lambda p: p * 1e-3 + 1e-6, params0)
opt = optim.adam_init(params0)
lrs = params0._replace(**{k: 1e-3 for k in params0._fields})


def bench(mode):
    @jax.jit
    def f(params, grads):
        updates, new_opt = optim.adam_update(grads, opt, lrs, mode=mode)
        return jax.tree.map(lambda p, u: p + u, params, updates)

    jitter = lambda i: params0._replace(
        opacity=params0.opacity * (1.0 - 1e-5 * i))
    r = f(jitter(0), grads0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, N + 1):
        r = f(jitter(i), grads0)
    jax.block_until_ready(r)
    print(f"adam_{mode}: {(time.time()-t0)/N*1000:.2f} ms", flush=True)


bench("leaf")
bench("flat")
bench("leaf")
bench("flat")
print("rc=0", flush=True)
