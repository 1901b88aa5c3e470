"""Decompose the stage-1 train step at bench scale: raster fwd+bwd vs
render-precomp (SH/projection/conic) vs losses (SSIM/or) vs optimizer."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import math
import time
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.ops import losses as L
from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.ops.ssim import ssim
from gaussianhaircut_tpu.render import renderer
from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic, camera_geom
from gaussianhaircut_tpu.train import optim, stage1

P = int(os.environ.get("PROF_P", 100_000))
W, H = int(os.environ.get("PROF_W", 960)), int(os.environ.get("PROF_H", 544))
CAP_MULT = int(os.environ.get("PROF_CAP_MULT", 9))
N = int(os.environ.get("PROF_N", 15))

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
cfg = RasterConfig(backend="pallas", capacity_mult=CAP_MULT)

gt_img = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
gt_mask = jnp.full((2, H, W), 0.75, jnp.float32)
gt_oa = jnp.asarray(rng.uniform(size=(1, H, W)), jnp.float32)
gt_oc = jnp.ones((1, H, W), jnp.float32)


def timeit(name, f, n=N):
    r = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = f(i)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


params0 = state.params
alive = state.aux.alive


def render_loss(params):
    out = renderer.render(params, alive, 3, cam, bg, cfg)
    lim = L.l1_loss(out["render"], gt_img, mask=gt_mask[1:2])
    lssim = 1.0 - ssim(out["render"] * gt_mask[1:2], gt_img * gt_mask[1:2])
    lmask = L.l1_loss(out["mask"], gt_mask)
    lor = L.or_loss(out["orient_angle"], gt_oa, confs=out["orient_conf"],
                    weight=gt_oc, mask=gt_mask[:1])
    return lim + 0.2 * lssim + 0.1 * lmask + 0.1 * lor


def render_l1_only(params):
    out = renderer.render(params, alive, 3, cam, bg, cfg)
    return L.l1_loss(out["render"], gt_img, mask=gt_mask[1:2])


def precomp_only(params):
    """Everything render() computes BEFORE the rasterize call."""
    f = renderer.fields_from_params(params, alive)
    from gaussianhaircut_tpu.ops import projection as proj
    from gaussianhaircut_tpu.ops import sh as sh_ops
    from gaussianhaircut_tpu.ops.quaternion import normalize
    cov3d = proj.covariance_3d(f.scaling, f.rotation_matrix)
    cov2d = proj.covariance_2d(f.xyz, cov3d, cam)
    conic = proj.conic_from_cov2d(cov2d)
    ndc = proj.project_ndc(f.xyz, cam.projmatrix)
    depth = proj.depths(f.xyz, cam)
    dirs = normalize(f.xyz - cam.campos[None, :])
    rgb = jnp.maximum(sh_ops.eval_sh(3, f.features, dirs) + 0.5, 0.0)
    dir2d = proj.direction_2d(f.xyz, f.scaling, f.rotation_matrix, cam)
    return (jnp.sum(conic) + jnp.sum(ndc) + jnp.sum(rgb) + jnp.sum(dir2d)
            + jnp.sum(depth))


def loss_on_fixed_image(img10):
    image, mask = img10[:3], img10[3:5]
    lim = L.l1_loss(image, gt_img, mask=gt_mask[1:2])
    lssim = 1.0 - ssim(image * gt_mask[1:2], gt_img * gt_mask[1:2])
    lmask = L.l1_loss(mask, gt_mask)
    return lim + 0.2 * lssim + 0.1 * lmask


g_full = jax.jit(jax.grad(render_loss))
g_l1 = jax.jit(jax.grad(render_l1_only))
g_pre = jax.jit(jax.grad(precomp_only))
g_img = jax.jit(jax.grad(lambda i: loss_on_fixed_image(i)))

jitter = lambda i: params0._replace(
    opacity=params0.opacity * (1.0 - 1e-5 * i))

timeit("G_render_full_losses", lambda i: g_full(jitter(i)))
timeit("G_render_l1_only", lambda i: g_l1(jitter(i)))
timeit("G_precomp_only", lambda i: g_pre(jitter(i)))
img10 = jnp.asarray(rng.uniform(size=(10, H, W)), jnp.float32)
timeit("G_losses_on_image", lambda i: g_img(img10 * (1.0 - 1e-5 * i)))

# optimizer step alone
opt = optim.adam_init(params0)
lrs = params0._replace(**{k: 1e-3 for k in params0._fields})


@jax.jit
def adam_only(params, grads):
    updates, new_opt = optim.adam_update(grads, opt, lrs)
    return jax.tree.map(lambda p, u: p + u, params, updates)


grads0 = jax.block_until_ready(g_l1(params0))
timeit("Adam_only", lambda i: adam_only(jitter(i), grads0))

# full train_step (the bench step)
cams = []
c0 = CameraStatic(uid=0, colmap_id=0, image_name="0", width=W, height=H,
                  colmap_transform=w2c, fovx=fov, fovy=fov)
c0.image = np.asarray(gt_img)
c0.mask_hair = np.asarray(gt_mask[:1])
c0.mask_body = np.asarray(gt_mask[1:])
c0.orient_angle = np.asarray(gt_oa)
c0.orient_conf = np.asarray(gt_oc)
cam_batch = CameraBatch.from_cameras([c0])
gt = stage1.GtBatch.from_cameras([c0])
opt_cfg = OptimizationConfig(lambda_dorient=0.1)
tstate = stage1.init_train_state(state, 1, use_barf=True)


def step(ts, i):
    return stage1.train_step(
        ts, cam_batch, gt, jnp.asarray(0), active_sh_degree=3, width=W,
        height=H, raster_cfg=cfg, opt_cfg=opt_cfg, trainable_cameras=True,
        trainable_intrinsics=True, use_barf=True, white_background=False)


ts = tstate
ts, _ = step(ts, 0)
jax.block_until_ready(ts.model.params.xyz)
t0 = time.time()
for i in range(N):
    ts, _ = step(ts, i)
jax.block_until_ready(ts.model.params.xyz)
print(f"FULL_train_step: {(time.time()-t0)/N*1000:.2f} ms", flush=True)
