"""First-quality-number run (QUALITY_rNN.json): fit stage 1 to RENDERED
ground truth from a held-out teacher model and report train/test PSNR.

Self-reconstruction on synthetic renders is the strongest quality signal
available in this environment (no real scene data / external preprocessing
weights); the number is trendable across rounds toward the
"reference-PSNR within 1%" north star (BASELINE.md).

Usage: python tools/quality_run.py [--iters 3000] [--out QUALITY_r02.json]
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


def make_cameras(n_views, width, height, radius=2.5, seed=0):
    from gaussianhaircut_tpu.scene.cameras import CameraStatic

    cams = []
    fov = math.radians(50)
    rng = np.random.default_rng(seed)
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        el = 0.25 * math.sin(3.1 * a)       # break the ring's symmetry
        center = np.array([radius * math.cos(el) * math.sin(a),
                           radius * math.sin(el) + 0.3,
                           radius * math.cos(el) * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--teacher_p", type=int, default=20000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--test_views", type=int, default=4)
    ap.add_argument("--capacity_mult", type=int, default=8)
    ap.add_argument("--gaussian_capacity_mult", type=int, default=4,
                    help="slot headroom over the init count; exhausted slots "
                    "stall splitting and leave big blurry gaussians")
    ap.add_argument("--out", default="")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="run the trainer's test/train PSNR report on this "
                    "interval (diagnostic)")
    ap.add_argument("--save_state", default="",
                    help="write the final TrainState npz here (post-mortem)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianhaircut_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.render.renderer import default_background, render
    from gaussianhaircut_tpu.scene.cameras import camera_geom
    from gaussianhaircut_tpu.train import stage1

    res = args.res
    rng = np.random.default_rng(0)
    p = args.teacher_p
    pts = rng.normal(scale=0.3, size=(p, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(p, 3)).astype(np.float32)
    teacher = gm.create_from_pcd(pts, cols, p, 3, 1.0)

    raster_cfg = RasterConfig(backend="auto", capacity_mult=10)
    bg = default_background(False)
    cams = make_cameras(args.views + args.test_views, res, res)

    @jax.jit
    def render_gt(tparams, talive, colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render(tparams, talive, 3, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0.0, 1.0),
                jnp.clip(out["mask"], 0.0, 1.0),
                jnp.clip(out["orient_angle"], 0.0, 1.0))

    for c in cams:
        img, mask, angle = jax.device_get(render_gt(
            teacher.params, teacher.aux.alive,
            jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
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
        # student initializes from the teacher's (SfM-like) point cloud with
        # positional noise and neutral colors
        points = pts + rng.normal(scale=0.02, size=pts.shape).astype(np.float32)
        colors = np.full_like(cols, 0.5)
        cameras_extent = 1.0

    model_cfg = ModelConfig()
    model_cfg.model_path = ""
    model_cfg.trainable_cameras = False
    model_cfg.trainable_intrinsics = False
    # train_orient_conf off: on self-consistent synthetic GT the aleatoric
    # -log(conf) term is an unbounded reward the optimizer farms at the
    # image's expense (train PSNR drops while `total` goes negative); real
    # scenes keep the orient loss bounded away from zero.
    opt_cfg = OptimizationConfig(iterations=args.iters, lambda_dorient=0.1,
                                 train_orient_conf=False,
                                 densify_until_iter=args.iters // 2)
    pipe_cfg = PipelineConfig()
    # the auto capacity floors at 1<<17; densify needs real slot headroom
    # (exhaustion stalls splitting and caps quality)
    pipe_cfg.gaussian_capacity = args.gaussian_capacity_mult * p
    pipe_cfg.instance_capacity_mult = args.capacity_mult

    log_every = int(os.environ.get("QUALITY_LOG_EVERY", 0))

    # held-out-view curve: (iter, test_psnr, train_psnr, alive) sampled at
    # --eval_every so overfit (train/test divergence) is visible PER RUN in
    # the artifact, not just at the end
    curve = []
    from gaussianhaircut_tpu.scene.cameras import CameraBatch as _CB
    from gaussianhaircut_tpu.train.stage1 import GtBatch as _GB
    test_cb_batch = _CB.from_cameras(Scene.test_cameras)
    test_cb_gt = _GB.from_cameras(Scene.test_cameras)
    train_cb_batch = _CB.from_cameras(Scene.train_cameras)
    train_cb_gt = _GB.from_cameras(Scene.train_cameras)
    eval_rcfg = RasterConfig(tile_w=pipe_cfg.tile, tile_h=pipe_cfg.tile,
                             capacity_mult=pipe_cfg.instance_capacity_mult,
                             backend=pipe_cfg.raster_backend)

    def cb(it, state, metrics):
        if log_every and it % log_every == 0:
            import jax.numpy as jnp
            print(f"# it={it} total={float(metrics['total']):.4f} "
                  f"ok={bool(metrics['grads_ok'])} "
                  f"xyz_fin={bool(jnp.isfinite(state.model.params.xyz).all())} "
                  f"scl_max={float(state.model.params.scaling.max()):.2f} "
                  f"alive={int(state.model.num_alive())}", flush=True)
        if args.eval_every and it % args.eval_every == 0:
            sh_deg = min(it // 1000, 3)
            r = stage1.evaluate(
                state, Scene.test_cameras, test_cb_batch, test_cb_gt,
                range(len(Scene.test_cameras)), active_sh_degree=sh_deg,
                width=res, height=res, raster_cfg=eval_rcfg,
                model_cfg=model_cfg, name="test")
            tr = stage1.evaluate(
                state, Scene.train_cameras, train_cb_batch, train_cb_gt,
                [i % len(Scene.train_cameras) for i in range(5, 30, 5)],
                active_sh_degree=sh_deg, width=res, height=res,
                raster_cfg=eval_rcfg, model_cfg=model_cfg, name="train")
            curve.append({"iter": it,
                          "test_psnr": round(float(r["test_psnr"]), 3),
                          "train_psnr": round(float(tr["train_psnr"]), 3),
                          "alive": int(state.model.num_alive())})
            print(f"# curve {curve[-1]}", flush=True)

    t0 = time.time()
    state = stage1.train(model_cfg, opt_cfg, pipe_cfg, Scene,
                         test_iterations=(), save_iterations=(),
                         checkpoint_iterations=(),
                         progress_callback=cb if (log_every or args.eval_every)
                         else None)
    dt = time.time() - t0
    if args.save_state:
        stage1.save_checkpoint(state, args.save_state)
    print(f"# trained {args.iters} iters in {dt:.1f}s "
          f"({args.iters / dt:.2f} it/s)", flush=True)

    from gaussianhaircut_tpu.scene.cameras import CameraBatch
    from gaussianhaircut_tpu.train.stage1 import GtBatch

    rcfg = RasterConfig(tile_w=pipe_cfg.tile, tile_h=pipe_cfg.tile,
                        capacity_mult=pipe_cfg.instance_capacity_mult,
                        backend=pipe_cfg.raster_backend)
    report = {}
    for name, cs in (("train", Scene.train_cameras),
                     ("test", Scene.test_cameras)):
        report.update(stage1.evaluate(
            state, cs, CameraBatch.from_cameras(cs), GtBatch.from_cameras(cs),
            range(len(cs)), active_sh_degree=3, width=res, height=res,
            raster_cfg=rcfg, model_cfg=model_cfg, name=name))

    # LPIPS on the test views (metrics contract: BASELINE tracks PSNR/LPIPS;
    # untrained-backbone fallback is labeled via lpips_kind)
    from gaussianhaircut_tpu.ops.lpips import lpips_or_none
    lp = lpips_or_none(allow_untrained=True)
    lpips_vals = []
    for c in Scene.test_cameras:
        out = jax.device_get(render_gt(
            state.model.params, state.model.aux.alive,
            jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        lpips_vals.append(float(lp(np.clip(out[0][:3], 0, 1),
                                   np.clip(c.image[:3], 0, 1))))
    report["test_lpips"] = float(np.mean(lpips_vals))
    report["lpips_kind"] = lp.kind
    result = {
        "config": {"teacher_p": p, "res": res, "views": args.views,
                   "test_views": args.test_views, "iters": args.iters,
                   "backend": jax.default_backend()},
        "train_psnr": round(float(report["train_psnr"]), 3),
        "test_psnr": round(float(report["test_psnr"]), 3),
        "train_l1": round(float(report["train_l1"]), 5),
        "test_l1": round(float(report["test_l1"]), 5),
        # an uncalibrated LPIPS never rides the bare key (BASELINE.md
        # "LPIPS calibration status")
        ("test_lpips" if report["lpips_kind"] == "pretrained"
         else "test_lpips_uncalibrated"):
            round(float(report["test_lpips"]), 5),
        "lpips_kind": report["lpips_kind"],
        "iters_per_sec": round(args.iters / dt, 3),
        "num_alive": int(state.model.num_alive()),
        **({"heldout_curve": curve} if curve else {}),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
