"""Stage-3 lr sweep at the reference operating point (L=100, 10k strands).

Loads the full-scale stage-2 checkpoint once, builds the synthetic teacher
scene exactly like tools/quality_strands.py, then runs several short stage-3
refinements with different spatial_lr_scale values (and optionally SDS) to
find the largest dirs lr whose image loss still descends and whose chamfer
does not drift.  Diagnoses the full-scale stage-3 divergence (round-4): the
cumsum-dirs parameterization moves tip points by up to (L-1) x lr per Adam
step, so the toy-validated lr is ~25x too hot at L=100.

Usage:
  python tools/s3_lr_probe.py --ckpt runs/r4/ckpt2/stage2/checkpoints/20000.npz \
      --iters 300 --lrs 0.2,0.06,0.02
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

import quality_strands as QS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--lrs", default="0.2,0.06,0.02")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--test_views", type=int, default=4)
    ap.add_argument("--num_strands", type=int, default=10000)
    ap.add_argument("--teacher_strands", type=int, default=10000)
    ap.add_argument("--strand_length", type=int, default=100)
    ap.add_argument("--pool_size", type=int, default=20000)
    ap.add_argument("--texture_size", type=int, default=256)
    ap.add_argument("--capacity_mult", type=int, default=5)
    ap.add_argument("--sds", action="store_true",
                    help="also run each lr with the SDS prior on")
    ap.add_argument("--prior_steps", type=int, default=600)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianhaircut_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig)
    from gaussianhaircut_tpu.models.textured_strands import (
        TexturedStrandsConfig, synthetic_scalp_pool)
    from gaussianhaircut_tpu.ops import losses as L
    from gaussianhaircut_tpu.ops.chamfer import chamfer_distance
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.render.renderer import (
        default_background, render_fields)
    from gaussianhaircut_tpu.scene.cameras import camera_geom
    from gaussianhaircut_tpu.train import stage2, stage3

    res = args.res
    rng = np.random.default_rng(0)
    pool = synthetic_scalp_pool(args.pool_size)
    radius_scale = jnp.asarray(6e-4, jnp.float32)

    scfg = TexturedStrandsConfig(
        num_strands=args.num_strands, texture_size=args.texture_size,
        strand_length=args.strand_length, sh_degree=1,
        pool_size=args.pool_size, use_diffusion=True)

    t_pts, t_rgb, t_uvs, t_l2w = QS.teacher_strands(
        pool, args.teacher_strands, args.strand_length, rng)
    hair_t = QS.teacher_fields(t_pts, t_rgb, radius_scale, scfg.sh_degree)
    head_model = QS.make_head_model(rng)
    head = stage2.make_head_fields(head_model)

    raster_cfg = RasterConfig(backend="auto",
                              capacity_mult=args.capacity_mult)
    bg = default_background(False)
    cams = QS.make_cameras(args.views + args.test_views, res, res)
    fields_gt = stage2.concat_fields(head, hair_t)

    @jax.jit
    def render_gt(fields_gt, colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(fields_gt, scfg.sh_degree, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0.0, 1.0),
                jnp.clip(out["mask"], 0.0, 1.0),
                jnp.clip(out["orient_angle"], 0.0, 1.0))

    t0 = time.time()
    for c in cams:
        img, mask, angle = jax.device_get(render_gt(
            fields_gt, jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        c.image = np.asarray(img)
        c.mask_hair = np.asarray(mask[:1])
        c.mask_body = np.asarray(mask[1:2])
        c.orient_angle = np.asarray(angle)
        c.orient_conf = np.ones((1, res, res), np.float32)
    print(f"# GT rendered in {time.time() - t0:.0f}s", flush=True)

    class Scene:
        train_cameras = cams[:args.views]
        test_cameras = cams[args.views:]

    # ---- stage-2 params straight from the checkpoint ----
    template = stage2.init_hair_state(scfg, jax.random.PRNGKey(0),
                                      own_denoiser=True)
    hair_state = stage2.load_checkpoint(args.ckpt, template)
    hair_params = hair_state.params
    print(f"# stage2 checkpoint loaded: {args.ckpt}", flush=True)

    model_cfg = ModelConfig()
    pipe_cfg = PipelineConfig()
    pipe_cfg.instance_capacity_mult = args.capacity_mult

    params0, static0 = stage3.create_from_stage2(
        hair_params, pool, scfg, jax.random.PRNGKey(1), args.num_strands)

    t_flat = t_pts.reshape(-1, 3)

    def strand_chamfer(points):
        return float(chamfer_distance(points.reshape(-1, 3), t_flat))

    @jax.jit
    def eval_one(merged, colmap_t, fovx, fovy, gt_img, gt_hair):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(merged, scfg.sh_degree, cam, bg, raster_cfg)
        img = jnp.clip(out["render"], 0.0, 1.0)
        return (L.psnr(img, gt_img),
                L.l1_loss(jnp.clip(out["mask"][:1], 0, 1), gt_hair))

    def evaluate(params, static, cam_list):
        fields = stage3.curves_fields(params, static, scfg, radius_scale)
        merged = stage2.concat_fields(head, fields)
        tot = np.zeros(2)
        for c in cam_list:
            tot += np.asarray(jax.device_get(eval_one(
                merged, jnp.asarray(c.colmap_transform),
                jnp.asarray(c.fovx), jnp.asarray(c.fovy),
                jnp.asarray(c.image), jnp.asarray(c.mask_hair))))
        tot /= len(cam_list)
        return round(float(tot[0]), 3), round(float(tot[1]), 5)

    chamfer0 = strand_chamfer(stage3.curves_points(params0, static0))
    psnr0, l1_0 = evaluate(params0, static0, Scene.test_cameras)
    print(f"# init: test_psnr={psnr0} hair_l1={l1_0} chamfer={chamfer0:.3e}",
          flush=True)

    prior3 = None
    if args.sds:
        from gaussianhaircut_tpu.train.prior import distill_strand_prior
        pts0 = stage3.curves_points(params0, static0)
        prior3, pinfo3 = distill_strand_prior(
            pts0, static0.uvs, static0.local2world, scfg,
            steps=args.prior_steps, key=jax.random.PRNGKey(2000))
        print(f"# prior distilled: {pinfo3}", flush=True)

    results = {"init": {"test_psnr": psnr0, "hair_l1": l1_0,
                        "chamfer": chamfer0}}
    for lr in [float(x) for x in args.lrs.split(",")]:
        for use_sds in ([False, True] if args.sds else [False]):
            tag = f"lr={lr}{'+sds' if use_sds else ''}"
            opt3 = OptimizationConfig(
                iterations=args.iters, lambda_dmask=0.1, lambda_dorient=0.1,
                lambda_dssim=0.2, lambda_dsds=0.01 if use_sds else 0.0,
                train_orient_conf=False)
            l1_hist = []

            def cb(it, st, metrics):
                if it % 20 == 0:
                    l1_hist.append(round(float(metrics["l1"]), 5))

            t0 = time.time()
            st = stage3.train(
                model_cfg, opt3, scfg, pipe_cfg, Scene, head_model,
                hair_params, pool,
                scene_scale=radius_scale / model_cfg.strand_scale,
                num_strands=args.num_strands, checkpoint_iterations=(),
                save_iterations=(), spatial_lr_scale=lr,
                prior=prior3 if use_sds else None, use_sds=use_sds,
                progress_callback=cb)
            dt = time.time() - t0
            ch = strand_chamfer(stage3.curves_points(st.params, st.static))
            psnr, l1 = evaluate(st.params, st.static, Scene.test_cameras)
            results[tag] = {"test_psnr": psnr, "hair_l1": l1, "chamfer": ch,
                            "l1_train_hist": l1_hist,
                            "it_per_sec": round(args.iters / dt, 2)}
            print(f"# {tag}: test_psnr {psnr0}->{psnr} chamfer "
                  f"{chamfer0:.3e}->{ch:.3e} l1_hist={l1_hist}", flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
