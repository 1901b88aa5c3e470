"""Stage-2/3 quality harness: strand self-reconstruction PSNR.

A procedural strand "teacher" (wavy polylines grown from a synthetic scalp,
rendered through the same 10-channel splatting renderer) provides ground
truth; stage 2 fits its latent textured-strand generator to the renders from
scratch, stage 3 refines explicit polylines from the stage-2 output.  This is
the strand-stack analog of tools/quality_run.py and mirrors how the reference
trains stages 2/3 on synthetic GT (the stage-1 model's own renders,
run.sh:156-178, camera_utils.py:51-64): reported train/test PSNR is trendable
across rounds even though the procedural teacher is not exactly realizable by
the generator.

Usage: python tools/quality_strands.py [--iters2 3000] [--iters3 1000]
                                       [--out QUALITY_STRANDS.json]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def make_cameras(n_views, width, height, radius=0.55, target=(0.0, 0.07, 0.0)):
    """Ring of cameras around the scalp cap, mild elevation wobble."""
    from gaussianhaircut_tpu.scene.cameras import CameraStatic

    cams = []
    fov = math.radians(40)
    target = np.asarray(target)
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        el = 0.35 + 0.2 * math.sin(2.7 * a)   # look slightly down at the cap
        center = target + np.array([radius * math.cos(el) * math.sin(a),
                                    radius * math.sin(el),
                                    radius * math.cos(el) * math.cos(a)])
        fwd = target - center
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        w2c[:3, 3] = -w2c[:3, :3] @ center
        cams.append(CameraStatic(uid=i, colmap_id=i, image_name=f"{i:04d}",
                                 width=width, height=height,
                                 colmap_transform=w2c, fovx=fov, fovy=fov))
    return cams


def teacher_strands(pool, n, length, rng):
    """Procedural wavy strands: smooth functions of the root uv (so the field
    is learnable by a scalp texture), grown along the scalp normal with a
    world-space droop."""
    import jax.numpy as jnp

    idx = rng.choice(pool.origins.shape[0], size=n, replace=False)
    origins = np.asarray(pool.origins)[idx]          # [N, 3]
    uvs = np.asarray(pool.uvs)[idx]                  # [N, 2]
    l2w = np.asarray(pool.local2world)[idx]          # [N, 3, 3] cols (t, b, n)

    t = np.linspace(0.0, 1.0, length, dtype=np.float32)[None, :]   # [1, L]
    seg_len = 0.08
    amp = 0.008 * (0.5 + uvs[:, 1:2])                # [N, 1]
    phase = 2.0 * np.pi * uvs[:, 0:1]
    # local frame: x = tangent wiggle, y = bitangent wiggle, z = along normal
    lx = amp * np.sin(4.0 * np.pi * t + phase)
    ly = 0.5 * amp * np.cos(3.0 * np.pi * t + 2.0 * phase)
    lz = np.broadcast_to(seg_len * t, lx.shape)
    local = np.stack([lx, ly, lz], axis=-1)          # [N, L, 3]
    world = origins[:, None, :] + np.einsum("nij,nlj->nli", l2w, local)
    # gravity droop in world space
    world = world - np.stack([np.zeros_like(t), 0.06 * t * t,
                              np.zeros_like(t)], axis=-1)
    # hair color: brown, brightness varying smoothly with uv
    base = np.array([0.35, 0.22, 0.12], np.float32)
    shade = (0.6 + 0.4 * uvs[:, 0:1]).astype(np.float32)
    rgb = base[None, :] * shade                      # [N, 3]
    return jnp.asarray(world, jnp.float32), jnp.asarray(rgb, jnp.float32), uvs


def teacher_fields(points, rgb, radius_scale, sh_degree):
    """GaussianFields for the teacher polylines (same conversion as stage 3's
    curves_fields, sh-degree-0 colors)."""
    import jax.numpy as jnp
    from gaussianhaircut_tpu.models.strands import strands_to_gaussians
    from gaussianhaircut_tpu.render.renderer import GaussianFields

    sg = strands_to_gaussians(points, radius_scale)
    n, s = points.shape[0], points.shape[1] - 1
    k = (sh_degree + 1) ** 2
    c0 = 0.28209479177387814
    f_dc = ((rgb - 0.5) / c0)[:, None, None, :]      # [N, 1, 1, 3]
    features = jnp.concatenate([
        jnp.broadcast_to(f_dc, (n, s, 1, 3)).reshape(n * s, 1, 3),
        jnp.zeros((n * s, k - 1, 3), jnp.float32),
    ], axis=1)
    ones = jnp.ones((n * s, 1), jnp.float32)
    return GaussianFields(
        xyz=sg.xyz, features=features, scaling=sg.scaling,
        rotation_matrix=sg.rotation_matrix, opacity=ones, label=ones,
        orient_conf=ones, valid=jnp.ones(n * s, bool),
        viewspace=jnp.zeros((n * s, 3), jnp.float32),
        use_direction=jnp.ones(n * s, jnp.float32))


def make_head_model(rng, capacity=4096, n=2048):
    """A solid skin-colored ball under the scalp cap (label forced to head)."""
    import jax.numpy as jnp
    from gaussianhaircut_tpu.models import gaussian_model as gm

    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 0.095 * rng.random(n) ** (1.0 / 3.0)
    pts = (v * r[:, None] + np.array([0, 0.03, 0])).astype(np.float32)
    skin = np.tile(np.array([[0.8, 0.6, 0.5]], np.float32), (n, 1))
    cols = np.clip(skin + rng.normal(scale=0.03, size=(n, 3)), 0, 1)
    state = gm.create_from_pcd(pts, cols.astype(np.float32), capacity, 1, 1.0)
    p = state.params._replace(
        label=jnp.full_like(state.params.label, -6.0),       # head rows
        opacity=jnp.full_like(state.params.opacity, 2.0))    # ~0.88 solid
    return state.replace(params=p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters2", type=int, default=3000)
    ap.add_argument("--iters3", type=int, default=1000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--test_views", type=int, default=4)
    ap.add_argument("--teacher_strands", type=int, default=2500)
    ap.add_argument("--num_strands", type=int, default=2000)
    ap.add_argument("--strand_length", type=int, default=16)
    ap.add_argument("--pool_size", type=int, default=20000)
    ap.add_argument("--use_diffusion", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    # this container's sitecustomize pins jax_platforms=axon, so a plain
    # JAX_PLATFORMS=cpu env var is ignored; QH_CPU=1 forces the CPU backend
    # (must run before the first backend-initializing call)
    if os.environ.get("QH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from gaussianhaircut_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
    from gaussianhaircut_tpu.models.textured_strands import (
        TexturedStrandsConfig, generate_strands, synthetic_scalp_pool)
    from gaussianhaircut_tpu.ops import losses as L
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.render.renderer import default_background, render_fields
    from gaussianhaircut_tpu.scene.cameras import CameraBatch, camera_geom
    from gaussianhaircut_tpu.train import stage2, stage3

    res = args.res
    rng = np.random.default_rng(0)
    pool = synthetic_scalp_pool(args.pool_size)
    radius_scale = jnp.asarray(6e-4, jnp.float32)

    scfg = TexturedStrandsConfig(
        num_strands=args.num_strands, texture_size=128,
        strand_length=args.strand_length, sh_degree=1,
        pool_size=args.pool_size, use_diffusion=args.use_diffusion)

    t_pts, t_rgb, _ = teacher_strands(pool, args.teacher_strands,
                                      args.strand_length, rng)
    hair_t = teacher_fields(t_pts, t_rgb, radius_scale, scfg.sh_degree)
    head_model = make_head_model(rng)
    head = stage2.make_head_fields(head_model)

    raster_cfg = RasterConfig(backend="auto", capacity_mult=12)
    bg = default_background(False)
    cams = make_cameras(args.views + args.test_views, res, res)

    fields_gt = stage2.concat_fields(head, hair_t)

    @jax.jit
    def render_gt(fields_gt, colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(fields_gt, scfg.sh_degree, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0.0, 1.0),
                jnp.clip(out["mask"], 0.0, 1.0),
                jnp.clip(out["orient_angle"], 0.0, 1.0))

    for c in cams:
        img, mask, angle = jax.device_get(render_gt(
            fields_gt, jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        c.image = np.asarray(img)
        c.mask_hair = np.asarray(mask[:1])
        c.mask_body = np.asarray(mask[1:2])
        c.orient_angle = np.asarray(angle)
        c.orient_conf = np.ones((1, res, res), np.float32)
    print("# GT rendered", flush=True)

    class Scene:
        train_cameras = cams[:args.views]
        test_cameras = cams[args.views:]

    model_cfg = ModelConfig()
    pipe_cfg = PipelineConfig()
    pipe_cfg.instance_capacity_mult = 12
    # aleatoric conf off for the same reason as tools/quality_run.py (the
    # -log(conf) reward is unbounded on self-consistent synthetic GT)
    opt2 = OptimizationConfig(iterations=args.iters2, lambda_dmask=0.1,
                              lambda_dorient=0.1, lambda_dsds=0.01,
                              train_orient_conf=False)
    log_every = int(os.environ.get("QUALITY_LOG_EVERY", 0))

    def cb(it, state, metrics):
        if log_every and it % log_every == 0:
            print(f"# s2 it={it} total={float(metrics['total']):.4f} "
                  f"l1={float(metrics['l1']):.4f}", flush=True)

    t0 = time.time()
    hair_state = stage2.train(
        model_cfg, opt2, scfg, pipe_cfg, Scene, head_model, pool,
        scene_scale=radius_scale / model_cfg.strand_scale,
        checkpoint_iterations=(),
        progress_callback=cb if log_every else None)
    dt2 = time.time() - t0
    print(f"# stage2: {args.iters2} iters in {dt2:.1f}s "
          f"({args.iters2 / dt2:.2f} it/s)", flush=True)

    def evaluate(fields_fn, cam_list, name):
        """PSNR / hair-mask L1 / orient error vs the teacher renders."""
        fields = fields_fn()
        merged = stage2.concat_fields(head, fields)

        @jax.jit
        def eval_one(merged, colmap_t, fovx, fovy, gt_img, gt_hair, gt_angle):
            cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
            out = render_fields(merged, scfg.sh_degree, cam, bg, raster_cfg)
            img = jnp.clip(out["render"], 0.0, 1.0)
            return (L.psnr(img, gt_img),
                    L.l1_loss(jnp.clip(out["mask"][:1], 0, 1), gt_hair),
                    L.or_loss(jnp.clip(out["orient_angle"], 0, 1), gt_angle,
                              mask=gt_hair))
        totals = np.zeros(3)
        for c in cam_list:
            totals += np.asarray(jax.device_get(eval_one(
                merged, jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
                jnp.asarray(c.fovy), jnp.asarray(c.image),
                jnp.asarray(c.mask_hair), jnp.asarray(c.orient_angle))))
        totals /= len(cam_list)
        return {f"{name}_psnr": round(float(totals[0]), 3),
                f"{name}_hair_l1": round(float(totals[1]), 5),
                f"{name}_orient": round(float(totals[2]), 5)}

    eval_key = jax.random.PRNGKey(42)

    def stage2_fields():
        f, _ = stage2.hair_fields_from_strands(
            hair_state.params, pool, scfg, eval_key, radius_scale)
        return f

    report = {}
    report.update(evaluate(stage2_fields, Scene.train_cameras, "stage2_train"))
    report.update(evaluate(stage2_fields, Scene.test_cameras, "stage2_test"))
    print(f"# stage2 eval: {report}", flush=True)

    # ---- stage 3: refine explicit polylines from the stage-2 generator ----
    opt3 = OptimizationConfig(iterations=args.iters3, lambda_dmask=0.1,
                              lambda_dorient=0.1, lambda_dssim=0.2,
                              train_orient_conf=False)
    t0 = time.time()
    curves_state = stage3.train(
        model_cfg, opt3, scfg, pipe_cfg, Scene, head_model, hair_state.params,
        pool, scene_scale=radius_scale / model_cfg.strand_scale,
        num_strands=args.num_strands, checkpoint_iterations=(),
        save_iterations=())
    dt3 = time.time() - t0
    print(f"# stage3: {args.iters3} iters in {dt3:.1f}s "
          f"({args.iters3 / dt3:.2f} it/s)", flush=True)

    def stage3_fields():
        return stage3.curves_fields(curves_state.params, curves_state.static,
                                    scfg, radius_scale)

    report.update(evaluate(stage3_fields, Scene.train_cameras, "stage3_train"))
    report.update(evaluate(stage3_fields, Scene.test_cameras, "stage3_test"))

    result = {
        "config": {"res": res, "views": args.views,
                   "test_views": args.test_views,
                   "teacher_strands": args.teacher_strands,
                   "num_strands": args.num_strands,
                   "strand_length": args.strand_length,
                   "iters2": args.iters2, "iters3": args.iters3,
                   "use_diffusion": args.use_diffusion,
                   "backend": jax.default_backend()},
        **report,
        "stage2_iters_per_sec": round(args.iters2 / dt2, 3),
        "stage3_iters_per_sec": round(args.iters3 / dt3, 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
