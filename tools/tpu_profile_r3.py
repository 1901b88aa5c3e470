"""Round-3 profile: packed-vs-exact binning sort, losses, Adam, full step
at the bench config.  Methodology as tpu_profile_r2 (inputs vary per
iteration; all tensors passed as jit ARGUMENTS, never closures)."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import math
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize.api import ndc_xy_to_pixel
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.ops import projection as proj
from gaussianhaircut_tpu.ops import losses as L
from gaussianhaircut_tpu.ops.ssim import ssim
from gaussianhaircut_tpu.scene.cameras import camera_geom
from gaussianhaircut_tpu.train import optim, stage1

P = int(os.environ.get("PROF_P", 100_000))
W = int(os.environ.get("PROF_W", 960))
H = int(os.environ.get("PROF_H", 544))
CAP_MULT = int(os.environ.get("PROF_CAP_MULT", 8))
N = int(os.environ.get("PROF_N", 20))
ONLY = os.environ.get("PROF_ONLY", "")
TILE = int(os.environ.get("PROF_TILE", 32))
CHUNK = int(os.environ.get("PROF_CHUNK", 128))

rng = np.random.default_rng(0)
pts = rng.normal(scale=0.3, size=(P, 3)).astype(np.float32)
cols = rng.uniform(0.2, 0.8, size=(P, 3)).astype(np.float32)
state = gm.create_from_pcd(pts, cols, P, 3, 1.0)

fov = math.radians(50)
center = np.array([0.0, 0.3, 2.5])
fwd = -center / np.linalg.norm(center)
up = np.array([0.0, 1.0, 0.0])
right = np.cross(up, fwd); right /= np.linalg.norm(right)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
w2c[:3, 3] = -w2c[:3, :3] @ center
cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov), W, H, None)
bg = renderer.default_background(False)


@jax.jit
def make_inputs(params, alive, jitter):
    f = renderer.fields_from_params(params, alive)
    f = f._replace(xyz=f.xyz + jitter)
    return renderer.prepare_raster_inputs(f, 3, cam)


def timeit(name, f, n=N):
    r = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(i)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


jit_inputs = jax.block_until_ready(
    make_inputs(state.params, state.aux.alive, jnp.zeros(3)))
ndc, conic, colors, opacity, depth, valid = jit_inputs
print(f"# P={P} {W}x{H} cap_mult={CAP_MULT}", flush=True)

jits = {}


def run(name, fn, *args, n=N):
    if ONLY and ONLY not in name:
        return
    if name not in jits:
        jits[name] = jax.jit(fn)
    g = jits[name]
    eps_base = jnp.zeros(())
    timeit(name, lambda i: g(jnp.float32(i) * 1e-6, *args), n=n)


# --- isolated sort comparison ---
def sort3(eps, tile_id, inst_depth, gid):
    t, _, g = jax.lax.sort((tile_id, inst_depth + eps, g_cast(gid)), num_keys=3)
    return t[::1013].sum() + g[::1013].sum()


def g_cast(x):
    return x


def sort2_packed(eps, key, gid):
    k, g = jax.lax.sort((key + (eps * 0).astype(jnp.int32), gid), num_keys=2)
    return k[::1013].sum() + g[::1013].sum()


cfgp = RasterConfig(backend="pallas", capacity_mult=CAP_MULT,
                    sort_mode="packed", tile_w=TILE, tile_h=TILE, chunk=CHUNK)
cfge = RasterConfig(backend="pallas", capacity_mult=CAP_MULT,
                    sort_mode="exact", tile_w=TILE, tile_h=TILE, chunk=CHUNK)
cap = cfgp.instance_capacity(P)
rng2 = np.random.default_rng(1)
tile_id = jnp.asarray(rng2.integers(0, 511, cap), jnp.int32)
inst_depth = jnp.asarray(rng2.uniform(0.3, 8, cap), jnp.float32)
gid_s = jnp.asarray(rng2.integers(0, P, cap), jnp.int32)
key_packed = tile_id * (1 << 22) + jnp.asarray(
    rng2.integers(0, 1 << 22, cap), jnp.int32)

run("sort3_exact", sort3, tile_id, inst_depth, gid_s)
run("sort2_packed", sort2_packed, key_packed, gid_s)


# --- full binning fwd (packed vs exact) ---
def binning(cfg):
    def f(eps, ndc, conic, colors, opacity, depth, valid):
        mp = ndc_xy_to_pixel(ndc, W, H) + eps
        pre = C.preprocess(mp, conic, depth, valid, W, H, cfg, opacity=opacity)
        b = C.bin_instances(pre, mp, conic, opacity, colors, depth, W, H, cfg)
        return b.payload[::101, 0, ::7].sum() + b.gid[::1013, 0].sum()
    return f


run("binning_packed", binning(cfgp), ndc, conic, colors, opacity, depth, valid)
run("binning_exact", binning(cfge), ndc, conic, colors, opacity, depth, valid)


# --- losses fwd+bwd at image size ---
gt_img = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
gt_mask = jnp.asarray(np.concatenate([np.full((1, H, W), 0.5, np.float32),
                                      np.ones((1, H, W), np.float32)]))
gt_oa = jnp.asarray(rng.uniform(size=(1, H, W)), jnp.float32)
gt_oc = jnp.ones((1, H, W), jnp.float32)
opt_cfg = OptimizationConfig(lambda_dorient=0.1)
img10 = jnp.asarray(rng.uniform(size=(10, H, W)), jnp.float32)


def losses_fwdbwd(eps, img10, gt_img, gt_mask, gt_oa, gt_oc):
    def lf(x):
        dec = renderer.decode_render10(x)
        total, _ = stage1.compute_losses(dec, gt_img, gt_mask, gt_oa, gt_oc,
                                         opt_cfg)
        return total
    v, g = jax.value_and_grad(lf)(img10 + eps)
    return v + g[::3, ::7, ::11].sum()


run("losses_fwd+bwd", losses_fwdbwd, img10, gt_img, gt_mask, gt_oa, gt_oc)


def ssim_only(eps, a, b):
    return jax.value_and_grad(lambda x: 1 - ssim(x, b))(a + eps)[0]


run("ssim_fwd+bwd", ssim_only, img10[:3], gt_img)


# --- Adam on the parameter tree ---
grads = jax.tree.map(lambda x: jnp.ones_like(x) * 1e-4, state.params)
opt0 = optim.adam_init(state.params)
lrs = stage1.param_lrs(opt_cfg, 1.0, jnp.zeros((), jnp.int32))


def adam_only(eps, params, mu, nu, count):
    o = optim.AdamState(mu, nu, count)
    g2 = jax.tree.map(lambda g: g + eps, grads)
    ok = optim.grads_are_finite(g2)
    ups, o2 = optim.adam_update(g2, o, lrs)
    newp = jax.tree.map(lambda p, u: p + jnp.where(ok, u, 0.0), params, ups)
    return newp.xyz[::101].sum() + o2.mu.xyz[::101].sum()


run("adam_full", adam_only, state.params, opt0.mu, opt0.nu, opt0.count)


# --- per-Gaussian precompute fwd+bwd (the ~11 ms r2 item) ---
def precompute_fwdbwd(eps, params, alive):
    def f(xyz, scaling, rotation, feats):
        p2 = params._replace(xyz=xyz + eps, scaling=scaling,
                             rotation=rotation, features_rest=feats)
        fl = renderer.fields_from_params(p2, alive)
        ndc, conic, colors, opacity, depth, valid = (
            renderer.prepare_raster_inputs(fl, 3, cam))
        return (jnp.sum(ndc * 0.1) + jnp.sum(conic * 1e-4)
                + jnp.sum(colors * 1e-3) + jnp.sum(opacity))
    g = jax.grad(f, argnums=(0, 1, 2, 3))(params.xyz, params.scaling,
                                          params.rotation,
                                          params.features_rest)
    return sum(x[::101].sum() for x in (g[0], g[1], g[2]))


run("precompute_fwd+bwd", precompute_fwdbwd, state.params, state.aux.alive)

# --- full train step, packed vs exact ---
cam_batch_cams = []
from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic
for i in range(2):
    c = CameraStatic(uid=i, colmap_id=i, image_name=f"{i:04d}", width=W,
                     height=H, colmap_transform=w2c, fovx=fov, fovy=fov)
    c.image = np.asarray(gt_img)
    c.mask_hair = np.asarray(gt_mask[:1])
    c.mask_body = np.asarray(gt_mask[1:])
    c.orient_angle = np.asarray(gt_oa)
    c.orient_conf = np.asarray(gt_oc)
    cam_batch_cams.append(c)
cb = CameraBatch.from_cameras(cam_batch_cams)
gtb = stage1.GtBatch.from_cameras(cam_batch_cams)

for nm, cfg in (("step_packed", cfgp), ("step_exact", cfge)):
    if ONLY and ONLY not in nm:
        continue
    ts = stage1.init_train_state(state, 2, use_barf=True)

    def stepf(ts, i):
        return stage1.train_step(ts, cb, gtb, jnp.asarray(i % 2),
                                 active_sh_degree=3, width=W, height=H,
                                 raster_cfg=cfg, opt_cfg=opt_cfg,
                                 trainable_cameras=True,
                                 trainable_intrinsics=True, use_barf=True,
                                 white_background=False)
    ts, _ = stepf(ts, 0)
    jax.block_until_ready(ts.model.params.xyz)
    t0 = time.time()
    for i in range(N):
        ts, m = stepf(ts, i)
    jax.block_until_ready(ts.model.params.xyz)
    print(f"{nm}: {(time.time()-t0)/N*1000:.2f} ms  "
          f"nr={int(m['num_rendered'])}", flush=True)
