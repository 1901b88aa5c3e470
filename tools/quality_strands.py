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
    world-space droop.  Returns (points, rgb, uvs, local2world)."""
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
    return (jnp.asarray(world, jnp.float32), jnp.asarray(rgb, jnp.float32),
            uvs, jnp.asarray(l2w, jnp.float32))


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


def run_sds_ablation(args, scfg, radius_scale, t_pts, t_uvs, t_l2w,
                     curves_state, strand_chamfer, Scene, model_cfg,
                     pipe_cfg, head_model):
    """Does SDS regularize?  (VERDICT r2 weak #4: coverage stopped at
    'finite and nonzero'.)

    Protocol — the self-contained analog of the NeuralHaircut prior path
    (gaussian_model_strands.py:456-515): a diffusion prior is DISTILLED from
    the teacher strands (fixed random StrandEncoder -> HAAR latent images of
    teacher-strand subsets -> EDM denoiser trained on them), so the prior
    provably encodes the teacher geometry distribution.  The refined stage-3
    strands are then perturbed with segment noise and recovered on SPARSE
    views (image losses starve) with and without the SDS term.  SDS must
    yield strictly lower teacher-chamfer than the no-SDS recovery.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from gaussianhaircut_tpu.config import OptimizationConfig
    from gaussianhaircut_tpu.train import optim, stage3
    from gaussianhaircut_tpu.train.prior import distill_strand_prior

    # --- 1+2. fixed encoder, denoiser distilled on TEACHER latents
    # (train/prior.py; the prior provably encodes the teacher distribution) ---
    prior, pinfo = distill_strand_prior(
        t_pts, jnp.asarray(t_uvs, jnp.float32), t_l2w, scfg,
        steps=args.ablate_prior_steps, key=jax.random.PRNGKey(1000))
    l0, lN = pinfo["prior_loss_start"], pinfo["prior_loss_end"]
    print(f"# ablation prior: denoiser loss {l0:.4f} -> {lN:.4f} "
          f"({args.ablate_prior_steps} steps)", flush=True)

    # --- 3. perturb the refined strands ---
    dirs = curves_state.params.dirs
    sigma_pert = 0.5 * float(jnp.std(dirs))
    noise = sigma_pert * jax.random.normal(jax.random.PRNGKey(13), dirs.shape)
    pert_params = curves_state.params._replace(dirs=dirs + noise)
    chamfer_pert = strand_chamfer(
        stage3.curves_points(pert_params, curves_state.static))

    class SparseScene:
        train_cameras = Scene.train_cameras[:4]
        test_cameras = Scene.test_cameras

    out = {"ablation_prior_loss_start": round(l0, 4),
           "ablation_prior_loss_end": round(lN, 4),
           "ablation_chamfer_perturbed": chamfer_pert}

    for name, use_sds, lam in (("no_sds", False, 0.0),
                               ("sds", True, args.ablate_lambda_sds)):
        start = stage3.CurvesTrainState(
            pert_params, curves_state.static,
            optim.adam_init(pert_params), jnp.zeros((), jnp.int32))
        with tempfile.TemporaryDirectory() as td:
            ck = os.path.join(td, "pert.npz")
            stage3.save_checkpoint(start, ck)
            opt_cfg = OptimizationConfig(
                iterations=args.ablate_iters, lambda_dmask=0.1,
                lambda_dorient=0.1, lambda_dssim=0.2, lambda_dsds=lam,
                train_orient_conf=False)
            rec = stage3.train(
                model_cfg, opt_cfg, scfg, pipe_cfg, SparseScene, head_model,
                None, None, scene_scale=1.0, num_strands=args.num_strands,
                checkpoint_iterations=(), save_iterations=(),
                start_checkpoint=ck, prior=prior if use_sds else None,
                use_sds=use_sds)
        out[f"ablation_chamfer_{name}"] = strand_chamfer(
            stage3.curves_points(rec.params, rec.static))
        print(f"# ablation {name}: chamfer {chamfer_pert:.3e} -> "
              f"{out[f'ablation_chamfer_{name}']:.3e}", flush=True)
    return out


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
    ap.add_argument("--texture_size", type=int, default=128)
    ap.add_argument("--capacity_mult", type=int, default=12,
                    help="instance-buffer slots per gaussian; strand-segment "
                    "gaussians are tiny (1-4 tiles each) so large runs can "
                    "right-size this well below the stage-1 default")
    ap.add_argument("--use_diffusion", action="store_true")
    ap.add_argument("--use_sds_stage3", action="store_true",
                    help="run the COMMITTED stage-3 path with SDS: distill a "
                    "prior from the stage-2 generator output (train/prior.py) "
                    "and refine with lambda_dsds, as the reference does with "
                    "its pretrained prior (run.sh:195, lambda_sds=0.01)")
    ap.add_argument("--prior_steps", type=int, default=600)
    ap.add_argument("--lambda_sds3", type=float, default=0.01)
    ap.add_argument("--spatial_lr3", type=float, default=0.0,
                    help="stage-3 spatial_lr_scale; 0 = auto (camera extent, "
                    "the reference's nerf-normalization radius passed at "
                    "train_strands.py:49).  At L=100 segments are ~8e-4 "
                    "units and an over-scaled xyz schedule moves dirs "
                    "multiple segment-lengths early — shrink further if "
                    "stage 3 degrades PSNR (NOTES_ROUND4 watch item)")
    ap.add_argument("--ckpt_dir", default="",
                    help="directory for periodic stage-2/3 checkpoints "
                    "(long-run resumability)")
    ap.add_argument("--ckpt_every", type=int, default=1000)
    ap.add_argument("--resume2", default="",
                    help="stage-2 checkpoint npz to resume from")
    ap.add_argument("--resume3", default="",
                    help="stage-3 checkpoint npz to resume from")
    ap.add_argument("--ablate_sds", action="store_true",
                    help="distill a diffusion prior from the TEACHER strands "
                    "(fixed encoder -> latents -> denoiser), perturb the "
                    "refined strands, and compare chamfer recovery with vs "
                    "without SDS (VERDICT r2 weak #4)")
    ap.add_argument("--ablate_iters", type=int, default=600)
    ap.add_argument("--ablate_prior_steps", type=int, default=400)
    ap.add_argument("--ablate_lambda_sds", type=float, default=0.05)
    ap.add_argument("--warm_start", type=int, default=0,
                    help="pretrain the strand decoder for N steps on the "
                    "teacher strands and warm-start stage 2 from it (the "
                    "in-env stand-in for the reference's "
                    "decoder_checkpoint_path pretrained decoder); 0 = cold "
                    "start")
    ap.add_argument("--out", default="")
    ap.add_argument("--rate_probe", action="store_true",
                    help="exit after stage-2 training and record its "
                    "steady-state it/s (median of the QUALITY_LOG_EVERY "
                    "intervals past the first, which absorbs compile) into "
                    "--out's stage2_iters_per_sec if the file exists — "
                    "fills the null a --resume2 full run leaves behind")
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
        num_strands=args.num_strands, texture_size=args.texture_size,
        strand_length=args.strand_length, sh_degree=1,
        pool_size=args.pool_size, use_diffusion=args.use_diffusion)

    t_pts, t_rgb, t_uvs, t_l2w = teacher_strands(pool, args.teacher_strands,
                                                 args.strand_length, rng)
    hair_t = teacher_fields(t_pts, t_rgb, radius_scale, scfg.sh_degree)
    head_model = make_head_model(rng)
    head = stage2.make_head_fields(head_model)

    raster_cfg = RasterConfig(backend="auto",
                              capacity_mult=args.capacity_mult)
    bg = default_background(False)
    cams = make_cameras(args.views + args.test_views, res, res)

    fields_gt = stage2.concat_fields(head, hair_t)

    @jax.jit
    def render_gt(fields_gt, colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(fields_gt, scfg.sh_degree, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0.0, 1.0),
                jnp.clip(out["mask"], 0.0, 1.0),
                jnp.clip(out["orient_angle"], 0.0, 1.0),
                out["num_rendered"])

    n_gauss = int(fields_gt.xyz.shape[0])
    cap = raster_cfg.instance_capacity(n_gauss)
    max_rendered = 0

    for c in cams:
        img, mask, angle, nr = jax.device_get(render_gt(
            fields_gt, jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        max_rendered = max(max_rendered, int(nr))
        c.image = np.asarray(img)
        c.mask_hair = np.asarray(mask[:1])
        c.mask_body = np.asarray(mask[1:2])
        c.orient_angle = np.asarray(angle)
        c.orient_conf = np.ones((1, res, res), np.float32)
    if max_rendered > cap:
        raise RuntimeError(
            f"GT render overflowed the instance buffer: num_rendered "
            f"{max_rendered} > capacity {cap}; raise --capacity_mult")
    print(f"# GT rendered (max num_rendered {max_rendered}, capacity {cap}, "
          f"occupancy {max_rendered / cap:.2f})", flush=True)

    class Scene:
        train_cameras = cams[:args.views]
        test_cameras = cams[args.views:]

    model_cfg = ModelConfig()
    pipe_cfg = PipelineConfig()
    pipe_cfg.instance_capacity_mult = args.capacity_mult
    # aleatoric conf off for the same reason as tools/quality_run.py (the
    # -log(conf) reward is unbounded on self-consistent synthetic GT)
    opt2 = OptimizationConfig(iterations=args.iters2, lambda_dmask=0.1,
                              lambda_dorient=0.1, lambda_dsds=0.01,
                              train_orient_conf=False)
    log_every = int(os.environ.get("QUALITY_LOG_EVERY", 0))

    prior_params = None
    warm_info = {}
    if args.warm_start:
        from gaussianhaircut_tpu.train.prior import pretrain_strand_decoder
        prior_params, warm_info = pretrain_strand_decoder(
            t_pts, t_l2w, scfg, steps=args.warm_start,
            key=jax.random.PRNGKey(2024))
        print(f"# warm_start: decoder pretrain loss "
              f"{warm_info['decoder_pretrain_loss_start']} -> "
              f"{warm_info['decoder_pretrain_loss_end']} "
              f"({args.warm_start} steps)", flush=True)

    cb_t = [time.time()]
    interval_rates = []
    gnorm_max = [0.0]

    def cb(it, state, metrics):
        # grad_norm sampled at the logging cadence only (a per-iter float()
        # would force a device sync every step)
        if log_every and it % log_every == 0:
            if "grad_norm" in metrics:
                gnorm_max[0] = max(gnorm_max[0], float(metrics["grad_norm"]))
            now = time.time()
            dt, cb_t[0] = now - cb_t[0], now
            interval_rates.append(log_every / max(dt, 1e-9))
            print(f"# s2 it={it} total={float(metrics['total']):.4f} "
                  f"l1={float(metrics['l1']):.4f} "
                  f"nr={float(metrics.get('num_rendered', -1)):.0f} "
                  f"({interval_rates[-1]:.2f} it/s)", flush=True)

    ckpt2 = ()
    if args.ckpt_dir and args.ckpt_every:
        ckpt2 = tuple(range(args.ckpt_every, args.iters2 + 1, args.ckpt_every))
    t0 = time.time()
    hair_state = stage2.train(
        model_cfg, opt2, scfg, pipe_cfg, Scene, head_model, pool,
        scene_scale=radius_scale / model_cfg.strand_scale,
        model_path_hair=(os.path.join(args.ckpt_dir, "stage2")
                         if args.ckpt_dir else ""),
        checkpoint_iterations=ckpt2,
        start_checkpoint=args.resume2 or None,
        prior_params=prior_params,
        progress_callback=cb if log_every else None)
    dt2 = time.time() - t0
    print(f"# stage2: {args.iters2} iters in {dt2:.1f}s "
          f"({args.iters2 / dt2:.2f} it/s)", flush=True)
    if args.rate_probe:
        # steady-state rate: median of the per-interval rates past the
        # first interval (which absorbs the jit compile)
        rate = (float(np.median(interval_rates[1:]))
                if len(interval_rates) > 1 else args.iters2 / dt2)
        print(f"# rate_probe: stage2 steady {rate:.3f} it/s", flush=True)
        if args.out and os.path.exists(args.out):
            with open(args.out) as f:
                d = json.load(f)
            d["stage2_iters_per_sec"] = round(rate, 3)
            d["stage2_rate_source"] = (
                f"fresh {args.iters2}-iter steady-state probe "
                f"(--rate_probe, median of {max(len(interval_rates)-1, 0)} "
                f"post-compile intervals)")
            with open(args.out, "w") as f:
                json.dump(d, f, indent=1)
            print(f"# rate_probe: wrote stage2_iters_per_sec to {args.out}",
                  flush=True)
        return
    dump_dir = os.environ.get("QUALITY_DUMP_DIR")
    if dump_dir:
        stage2.save_checkpoint(hair_state,
                               os.path.join(dump_dir, "stage2_state.npz"))
        print(f"# stage2 state dumped to {dump_dir}", flush=True)

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
    from gaussianhaircut_tpu.ops.chamfer import chamfer_distance

    t_pts_flat = t_pts.reshape(-1, 3)

    def strand_chamfer(points):
        """Symmetric chamfer (mean of sided mean squared distances) between
        polyline point clouds — the strand-geometry metric VERDICT r2 called
        for (known-GT strands exist only in this harness)."""
        return float(chamfer_distance(points.reshape(-1, 3), t_pts_flat))

    # stage-3 initial state (same key/num_strands the trainer will use) —
    # the refinement claim needs a before/after on the SAME frozen origins
    params0, static0 = stage3.create_from_stage2(
        hair_state.params, pool, scfg, jax.random.PRNGKey(1),
        args.num_strands)

    def fields_of(params, static):
        return lambda: stage3.curves_fields(params, static, scfg, radius_scale)

    report.update(evaluate(fields_of(params0, static0), Scene.test_cameras,
                           "stage3_init_test"))
    report["stage3_init_chamfer"] = strand_chamfer(
        stage3.curves_points(params0, static0))

    # SDS in the MAIN stage-3 path (reference: train_strands.py:128-147 with
    # lambda_sds=0.01, run.sh:195): the prior is self-distilled from the
    # stage-2 generator output, anchoring refinement to stage-2 geometry.
    prior3 = None
    if args.use_sds_stage3:
        from gaussianhaircut_tpu.train.prior import distill_strand_prior
        pts0 = stage3.curves_points(params0, static0)
        t0 = time.time()
        prior3, pinfo3 = distill_strand_prior(
            pts0, static0.uvs, static0.local2world, scfg,
            steps=args.prior_steps, key=jax.random.PRNGKey(2000))
        print(f"# stage3 prior: denoiser loss "
              f"{pinfo3['prior_loss_start']} -> {pinfo3['prior_loss_end']} "
              f"({args.prior_steps} steps, {time.time() - t0:.0f}s)",
              flush=True)
        report.update({f"stage3_{k}": v for k, v in pinfo3.items()})

    opt3 = OptimizationConfig(iterations=args.iters3, lambda_dmask=0.1,
                              lambda_dorient=0.1, lambda_dssim=0.2,
                              lambda_dsds=args.lambda_sds3,
                              train_orient_conf=False)

    spatial_lr3 = args.spatial_lr3
    if spatial_lr3 <= 0:
        # reference parity: spatial_lr_scale is the nerf-normalization camera
        # radius (train_strands.py:49 <- dataset_readers.getNerfppNorm) —
        # BUT bounded by a measured stability limit: the cumsum-dirs
        # parameterization moves tip points by up to (L-1) x lr per Adam
        # step, so dirs lr must stay a small fraction of the segment length.
        # The round-4 sweep at L=100/10k strands (tools/s3_lr_probe.py,
        # NOTES_ROUND4 session 3) diverged at lr/segment ~0.12 and was best
        # at ~0.012; the camera-extent heuristic alone lands at 0.12 on this
        # synthetic scene and monotonically climbs the image loss.
        centers = np.stack([-c.colmap_transform[:3, :3].T
                            @ c.colmap_transform[:3, 3] for c in cams])
        extent = float(1.1 * np.max(
            np.linalg.norm(centers - centers.mean(0), axis=-1)))
        seg = float(np.linalg.norm(
            np.asarray(t_pts[:, 1:] - t_pts[:, :-1]), axis=-1).mean())
        spatial_lr3 = stage3.stable_spatial_lr_scale(opt3, seg, extent)
        print(f"# stage3 spatial_lr_scale(auto) = {spatial_lr3:.4f} "
              f"(extent {extent:.4f})", flush=True)

    cb3_t = [time.time()]

    def cb3(it, st, metrics):
        if log_every and it % log_every == 0:
            now = time.time()
            dt, cb3_t[0] = now - cb3_t[0], now
            delta = float(jnp.abs(st.params.dirs - params0.dirs).max())
            print(f"# s3 it={it} total={float(metrics['total']):.4f} "
                  f"l1={float(metrics['l1']):.4f} "
                  f"sds={float(metrics.get('sds', 0)):.4f} "
                  f"finite={float(metrics.get('grads_finite', -1)):.0f} "
                  f"nr={float(metrics.get('num_rendered', -1)):.0f} "
                  f"max|d dirs|={delta:.3e} "
                  f"({log_every / max(dt, 1e-9):.2f} it/s)", flush=True)

    ckpt3 = ()
    if args.ckpt_dir and args.ckpt_every:
        ckpt3 = tuple(range(args.ckpt_every, args.iters3 + 1, args.ckpt_every))
    t0 = time.time()
    curves_state = stage3.train(
        model_cfg, opt3, scfg, pipe_cfg, Scene, head_model, hair_state.params,
        pool, scene_scale=radius_scale / model_cfg.strand_scale,
        num_strands=args.num_strands,
        model_path_curves=(os.path.join(args.ckpt_dir, "stage3")
                           if args.ckpt_dir else ""),
        checkpoint_iterations=ckpt3,
        start_checkpoint=args.resume3 or None,
        save_iterations=(), prior=prior3, use_sds=args.use_sds_stage3,
        spatial_lr_scale=spatial_lr3,
        progress_callback=cb3 if log_every else None)
    dt3 = time.time() - t0
    print(f"# stage3: {args.iters3} iters in {dt3:.1f}s "
          f"({args.iters3 / dt3:.2f} it/s)", flush=True)

    def stage3_fields():
        return stage3.curves_fields(curves_state.params, curves_state.static,
                                    scfg, radius_scale)

    report.update(evaluate(stage3_fields, Scene.train_cameras, "stage3_train"))
    report.update(evaluate(stage3_fields, Scene.test_cameras, "stage3_test"))
    report["stage3_chamfer"] = strand_chamfer(
        stage3.curves_points(curves_state.params, curves_state.static))
    print(f"# stage3 chamfer {report['stage3_init_chamfer']:.3e} -> "
          f"{report['stage3_chamfer']:.3e}", flush=True)

    if args.ablate_sds:
        report.update(run_sds_ablation(
            args, scfg, radius_scale, t_pts, t_uvs, t_l2w, curves_state,
            strand_chamfer, Scene, model_cfg, pipe_cfg, head_model))

    result = {
        "config": {"res": res, "views": args.views,
                   "test_views": args.test_views,
                   "teacher_strands": args.teacher_strands,
                   "num_strands": args.num_strands,
                   "strand_length": args.strand_length,
                   "iters2": args.iters2, "iters3": args.iters3,
                   "use_diffusion": args.use_diffusion,
                   "use_sds_stage3": args.use_sds_stage3,
                   "lambda_sds3": args.lambda_sds3,
                   "texture_size": args.texture_size,
                   "backend": jax.default_backend()},
        **report,
        # a --resume2 checkpoint at/past iters2 skips stage-2 training, so
        # its wall time is load+eval only, not a training rate
        "stage2_iters_per_sec": (None if args.resume2
                                 else round(args.iters2 / dt2, 3)),
        "stage3_iters_per_sec": round(args.iters3 / dt3, 3),
        "warm_start": bool(args.warm_start),
        **warm_info,
        **({"stage2_grad_norm_max": round(gnorm_max[0], 3)}
           if gnorm_max[0] > 0 else {}),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
