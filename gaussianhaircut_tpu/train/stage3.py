"""Stage-3 trainer: direct strand-polyline refinement
(the train_strands.py equivalent, reference src/train_strands.py:41-180 +
src/scene/gaussian_model_strands.py).

Learnables: per-strand segment vectors ``dirs`` [N, L-1, 3] (positions rebuilt
by cumsum from frozen stage-2 origins, gaussian_model_strands.py:435-454),
per-strand SH features and orientation confidence.  Adam with the exponential
xyz schedule (:578-594).  Loss adds SSIM and the SDS diffusion regularizer to
the stage-2 stack (train_strands.py:128-147).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.models.strand_prior import ColorDecoder, points_from_segments
from gaussianhaircut_tpu.models.strands import strands_to_gaussians
from gaussianhaircut_tpu.models.textured_strands import (
    ScalpPool, TexturedStrandsConfig, generate_strands,
)
from gaussianhaircut_tpu.ops import losses as L
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.ssim import ssim
from gaussianhaircut_tpu.render.renderer import (
    GaussianFields, default_background, render_fields,
)
from gaussianhaircut_tpu.scene.cameras import CameraBatch, camera_geom
from gaussianhaircut_tpu.train import optim
from gaussianhaircut_tpu.train.stage2 import concat_fields


class CurvesParams(NamedTuple):
    """Learnable stage-3 parameters (gaussian_model_strands.py:571-574)."""
    dirs: jnp.ndarray           # [N, L-1, 3]
    features_dc: jnp.ndarray    # [N, 1, 3]
    features_rest: jnp.ndarray  # [N, K-1, 3]
    orient_conf: jnp.ndarray    # [N, 1] (log)


class CurvesStatic(NamedTuple):
    """Frozen per-strand data from the stage-2 generator
    (gaussian_model_strands.py:521-576)."""
    origins: jnp.ndarray        # [N, 1, 3]
    uvs: jnp.ndarray            # [N, 2]
    local2world: jnp.ndarray    # [N, 3, 3]
    z_geom: jnp.ndarray         # [N, 64]


class CurvesTrainState(NamedTuple):
    params: CurvesParams
    static: CurvesStatic
    opt: optim.AdamState
    step: jnp.ndarray


def create_from_stage2(hair_params: dict, pool: ScalpPool,
                       scfg: TexturedStrandsConfig, key,
                       num_strands: int) -> tuple[CurvesParams, CurvesStatic]:
    """Run the stage-2 generator once in inference mode and freeze
    origins/latents (gaussian_model_strands.py:521-576)."""
    strands = generate_strands(hair_params, pool, scfg, key, num_strands)
    dirs = strands.points[:, 1:] - strands.points[:, :-1]
    n = dirs.shape[0]
    k = (scfg.sh_degree + 1) ** 2
    color = ColorDecoder(sh_degree=scfg.sh_degree)
    out = color.apply(hair_params["color_decoder"], strands.z_app)
    params = CurvesParams(
        dirs=dirs,
        features_dc=out[:, :3].reshape(n, 1, 3),
        features_rest=out[:, 3:3 * k].reshape(n, k - 1, 3),
        orient_conf=out[:, 3 * k:].reshape(n, 1),
    )
    static = CurvesStatic(strands.points[:, :1], strands.uvs,
                          strands.local2world, strands.z_geom)
    return params, static


def curves_points(params: CurvesParams, static: CurvesStatic) -> jnp.ndarray:
    return points_from_segments(static.origins, params.dirs)


def curves_fields(params: CurvesParams, static: CurvesStatic,
                  scfg: TexturedStrandsConfig, radius_scale) -> GaussianFields:
    pts = curves_points(params, static)
    sg = strands_to_gaussians(pts, radius_scale)
    n, s = pts.shape[0], pts.shape[1] - 1
    k = (scfg.sh_degree + 1) ** 2
    features = jnp.concatenate([
        jnp.broadcast_to(params.features_dc[:, None], (n, s, 1, 3)).reshape(n * s, 1, 3),
        jnp.broadcast_to(params.features_rest[:, None], (n, s, k - 1, 3)).reshape(n * s, k - 1, 3),
    ], axis=1)
    # clamped exp: see models/gaussian_model.get_orient_conf
    oconf = jnp.exp(jnp.clip(
        jnp.broadcast_to(params.orient_conf[:, None],
                         (n, s, 1)).reshape(n * s, 1), -30.0, 30.0))
    ones = jnp.ones((n * s, 1), jnp.float32)
    return GaussianFields(
        xyz=sg.xyz, features=features, scaling=sg.scaling,
        rotation_matrix=sg.rotation_matrix, opacity=ones, label=ones,
        orient_conf=oconf, valid=jnp.ones(n * s, bool),
        viewspace=jnp.zeros((n * s, 3), jnp.float32),
        use_direction=jnp.ones(n * s, jnp.float32))


def sds_loss(params: CurvesParams, static: CurvesStatic, prior: dict,
             scfg: TexturedStrandsConfig, key, num_guiding: int = 1000):
    """HAAR-style SDS regularizer (gaussian_model_strands.py:456-515):
    encode random guiding strands with the frozen strand encoder, resample
    their latents onto the diffusion grid by cosine-similarity-blended KNN
    interpolation, and take the denoiser loss.

    prior: {"encoder": StrandEncoder params, "denoiser": Denoiser params}.
    """
    from gaussianhaircut_tpu.models.diffusion import (
        Denoiser, DiffusionConfig, sds_latent_image)
    from gaussianhaircut_tpu.models.strand_prior import GEOMETRY_DIM, StrandEncoder

    n = params.dirs.shape[0]
    k_idx, k_noise, k_sigma = jax.random.split(key, 3)
    idx = jax.random.randint(k_idx, (min(num_guiding, n),), 0, n)

    pts = curves_points(params, static)[idx]
    inv_l2w = jnp.linalg.inv(static.local2world[idx])
    p_local = jnp.einsum("nij,nlj->nli", inv_l2w, pts - static.origins[idx])
    v_local = (p_local[:, 1:] - p_local[:, :-1]) * scfg.scale_decoder

    enc = StrandEncoder()
    z_gdn = enc.apply(prior["encoder"],
                      p_local * scfg.scale_decoder)[:, :GEOMETRY_DIM]
    uvs = 2.0 * static.uvs[idx] - 1.0
    latent = sds_latent_image(z_gdn, uvs, v_local, scfg.diffusion_input)[None]

    den = Denoiser(DiffusionConfig(input_channels=GEOMETRY_DIM,
                                   input_size=scfg.diffusion_input))
    noise = jax.random.normal(k_noise, latent.shape)
    sigma = den.sample_density(k_sigma, (1,))
    return den.loss(prior["denoiser"], latent, noise, sigma)


def stage3_losses(out, gt_image, gt_mask, gt_orient_angle, gt_orient_conf,
                  l_sds, opt_cfg: OptimizationConfig):
    """train_strands.py:128-147."""
    ll1 = L.l1_loss(out["render"], gt_image)
    lssim = 1.0 - ssim(out["render"], gt_image)
    lmask = L.l1_loss(out["mask"], gt_mask)
    orient_weight = jnp.ones_like(gt_mask[:1])
    if opt_cfg.use_gt_orient_conf:
        orient_weight = orient_weight * gt_orient_conf
    confs = out["orient_conf"] if opt_cfg.train_orient_conf else None
    lor = L.or_loss(out["orient_angle"], gt_orient_angle, confs=confs,
                    weight=orient_weight, mask=gt_mask[:1])
    lor = jnp.where(jnp.isnan(lor), 0.0, lor)
    total = (ll1 * opt_cfg.lambda_dl1 + lssim * opt_cfg.lambda_dssim
             + lmask * opt_cfg.lambda_dmask + lor * opt_cfg.lambda_dorient
             + l_sds * opt_cfg.lambda_dsds)
    return total, {"l1": ll1, "ssim": lssim, "mask": lmask, "orient": lor,
                   "sds": l_sds, "total": total}


def stable_spatial_lr_scale(opt_cfg: OptimizationConfig, seg_len: float,
                            cameras_extent: float = 1.0,
                            max_lr_per_segment: float = 0.012) -> float:
    """Stage-3 stability bound (round-4 root cause, tools/s3_lr_probe.py):
    cumsum-dirs moves strand TIPS by up to (L-1) x lr per Adam step, so the
    dirs lr is kept <= ``max_lr_per_segment`` x the mean segment length.
    Returns min(camera-extent heuristic, the stable scale).  At the
    reference operating point (L=100, compact head scene) the extent
    heuristic alone lands at lr/segment ~0.12, which measurably DIVERGES
    (image l1 climbs monotonically); 0.012 refines cleanly."""
    if seg_len <= 0:
        return float(cameras_extent)
    stable = max_lr_per_segment * seg_len / opt_cfg.position_lr_init
    return float(min(cameras_extent, stable))


def param_lrs(opt_cfg: OptimizationConfig, spatial_lr_scale: float, step):
    """gaussian_model_strands.py:578-594 (dirs follow the xyz schedule)."""
    xyz_lr = optim.expon_lr(step,
                            opt_cfg.position_lr_init * spatial_lr_scale,
                            opt_cfg.position_lr_final * spatial_lr_scale,
                            lr_delay_mult=opt_cfg.position_lr_delay_mult,
                            max_steps=opt_cfg.position_lr_max_steps)
    return CurvesParams(dirs=xyz_lr, features_dc=opt_cfg.feature_lr,
                        features_rest=opt_cfg.feature_lr / 20.0,
                        orient_conf=opt_cfg.orient_conf_lr)


@functools.partial(
    jax.jit,
    static_argnames=("scfg", "width", "height", "raster_cfg", "opt_cfg",
                     "white_background", "use_sds"))
def train_step(state: CurvesTrainState, head: GaussianFields,
               cam_batch: CameraBatch, gt_image, gt_mask, gt_orient_angle,
               gt_orient_conf, cam_idx, cam_residuals, radius_scale,
               prior=None, sds_key=None, *,
               scfg: TexturedStrandsConfig, width: int, height: int,
               raster_cfg: RasterConfig, opt_cfg: OptimizationConfig,
               white_background: bool, spatial_lr_scale: float = 1.0,
               use_sds: bool = False):
    bg = default_background(white_background)
    cam = camera_geom(cam_batch.colmap_transform[cam_idx],
                      cam_batch.fovx[cam_idx], cam_batch.fovy[cam_idx],
                      width, height, cam_residuals, cam_idx)

    def image_loss_fn(params):
        hair = curves_fields(params, state.static, scfg, radius_scale)
        fields = concat_fields(head, hair)
        out = render_fields(fields, scfg.sh_degree, cam, bg, raster_cfg)
        total, parts = stage3_losses(out, gt_image, gt_mask, gt_orient_angle,
                                     gt_orient_conf, jnp.zeros(()), opt_cfg)
        # surface the instance count (overflow detectability on long runs)
        parts["num_rendered"] = out["num_rendered"].astype(jnp.float32)
        return total, parts

    # The SDS term is backpropped SEPARATELY from the image losses (it never
    # touches the render, so this costs only the small encoder+denoiser
    # backward) and its gradient is capped at sds_grad_ratio x the image-loss
    # gradient norm — see OptimizationConfig.sds_grad_ratio for why the
    # reference's joint backprop (train_strands.py:128-147) is unsafe with a
    # self-distilled prior.
    (img_total, parts), grads = jax.value_and_grad(
        image_loss_fn, has_aux=True)(state.params)
    if use_sds:
        l_sds, g_sds = jax.value_and_grad(
            lambda p: sds_loss(p, state.static, prior, scfg, sds_key))(
                state.params)
        g_sds = jax.tree.map(lambda g: g * opt_cfg.lambda_dsds, g_sds)
        if opt_cfg.sds_grad_ratio > 0:
            g_sds, sds_scale = optim.cap_norm_relative(
                g_sds, grads, opt_cfg.sds_grad_ratio)
            parts["sds_gscale"] = sds_scale
        grads = jax.tree.map(jnp.add, grads, g_sds)
        parts["sds"] = l_sds
        parts["total"] = img_total + opt_cfg.lambda_dsds * l_sds
    ok = optim.grads_are_finite(grads)
    if opt_cfg.hair_grad_clip > 0:
        grads, gnorm = optim.clip_by_global_norm(grads, opt_cfg.hair_grad_clip)
        parts["grad_norm"] = gnorm
    lrs = param_lrs(opt_cfg, spatial_lr_scale, state.step)
    updates, new_opt = optim.adam_update(grads, state.opt, lrs)
    # jnp.where, NOT keep * u (0 * NaN = NaN would destroy the params)
    new_params = jax.tree.map(lambda p, u: p + jnp.where(ok, u, 0.0),
                              state.params, updates)
    new_opt = jax.lax.cond(ok, lambda: new_opt, lambda: state.opt)
    parts = dict(parts)
    parts["grads_finite"] = ok.astype(jnp.float32)
    return CurvesTrainState(new_params, state.static, new_opt,
                            state.step + 1), parts


def train(model_cfg, opt_cfg, scfg: TexturedStrandsConfig, pipe_cfg, scene,
          head_model, hair_params: dict, pool: ScalpPool, scene_scale,
          num_strands: int, cam_residuals=None, *, model_path_curves: str = "",
          save_iterations=(10000,), checkpoint_iterations=(10000,),
          start_checkpoint=None, spatial_lr_scale="auto",
          prior=None, use_sds: bool = False, sds_seed: int = 0,
          progress_callback=None) -> CurvesTrainState:
    """Host loop (train_strands.py:87-180).

    prior: {"encoder", "denoiser"} pytrees for the SDS regularizer
    (gaussian_model_strands.py:456-515); applied at opt_cfg.lambda_dsds when
    use_sds is set."""
    import random

    from gaussianhaircut_tpu.train.stage1 import GtBatch
    from gaussianhaircut_tpu.train.stage2 import make_head_fields

    cams = scene.train_cameras
    width, height = cams[0].width, cams[0].height
    cam_batch = CameraBatch.from_cameras(cams)
    gt = GtBatch.from_cameras(cams)
    head = make_head_fields(head_model)

    if start_checkpoint:
        state = load_checkpoint(start_checkpoint)
    else:
        params, static = create_from_stage2(hair_params, pool, scfg,
                                            jax.random.PRNGKey(1), num_strands)
        state = CurvesTrainState(params, static, optim.adam_init(params),
                                 jnp.zeros((), jnp.int32))

    raster_cfg = RasterConfig(tile_w=pipe_cfg.tile, tile_h=pipe_cfg.tile,
                              capacity_mult=pipe_cfg.instance_capacity_mult,
                              backend=pipe_cfg.raster_backend)
    radius_scale = jnp.asarray(model_cfg.strand_scale * float(scene_scale),
                               jnp.float32)
    # Stability bound (round-4 measurement, tools/s3_lr_probe.py): the
    # cumsum-dirs parameterization moves strand tips by up to (L-1) x lr per
    # Adam step, so the dirs lr must stay a small fraction of the segment
    # length — lr/segment ~0.12 (the reference's camera-extent heuristic at
    # L=100 on a compact scene) climbs the image loss monotonically; ~0.012
    # refines cleanly.  spatial_lr_scale="auto" (default) applies
    # stable_spatial_lr_scale; an explicit float keeps the reference's
    # any-scale semantics (gaussian_model_strands.py:578-594) with a warning.
    seg_len = float(jnp.linalg.norm(state.params.dirs, axis=-1).mean())
    if spatial_lr_scale == "auto":
        extent = float(getattr(scene, "cameras_extent", 1.0) or 1.0)
        spatial_lr_scale = stable_spatial_lr_scale(opt_cfg, seg_len, extent)
        print(f"# stage3 spatial_lr_scale(auto) = {spatial_lr_scale:.4f} "
              f"(lr/segment = "
              f"{opt_cfg.position_lr_init * spatial_lr_scale / max(seg_len, 1e-12):.4f})",
              flush=True)
    lr0 = opt_cfg.position_lr_init * float(spatial_lr_scale)
    if seg_len > 0 and lr0 / seg_len > 0.05:
        print(f"[warn] stage-3 dirs lr {lr0:.2e} is {lr0 / seg_len:.2f}x the "
              f"mean segment length {seg_len:.2e}; refinement diverged above "
              f"~0.05 at L=100 — consider spatial_lr_scale <= "
              f"{0.012 * seg_len / opt_cfg.position_lr_init:.3f}", flush=True)
    rng = random.Random(0)
    stack = []
    from gaussianhaircut_tpu.utils.logger import MetricsLogger
    logger = MetricsLogger(model_path_curves) if model_path_curves else None
    if use_sds and prior is None:
        raise ValueError("use_sds requires a prior ({'encoder', 'denoiser'})")
    sds_base_key = jax.random.PRNGKey(sds_seed)
    # static-capacity health (see stage2.train): strand geometry is frozen
    # in count, so one growth check + one optional shrink suffice
    import dataclasses as _dc
    import math as _math
    n_fit = head.xyz.shape[0] + state.params.dirs.shape[0] * (
        state.params.dirs.shape[1])
    instance_cap = raster_cfg.instance_capacity(n_fit)
    nr_max = 0.0
    shrunk = False
    for iteration in range(int(state.step) + 1, opt_cfg.iterations + 1):
        if not stack:
            stack = list(range(len(cams)))
            rng.shuffle(stack)
        cam_idx = stack.pop(rng.randrange(len(stack)))
        sds_key = jax.random.fold_in(sds_base_key, iteration) if use_sds else None
        state, metrics = train_step(
            state, head, cam_batch, gt.image[cam_idx], gt.mask[cam_idx],
            gt.orient_angle[cam_idx], gt.orient_conf[cam_idx],
            jnp.asarray(cam_idx), cam_residuals, radius_scale,
            prior, sds_key,
            scfg=scfg, width=width, height=height, raster_cfg=raster_cfg,
            opt_cfg=opt_cfg, white_background=model_cfg.white_background,
            spatial_lr_scale=spatial_lr_scale, use_sds=use_sds)
        if iteration % 100 == 0:
            nr = float(metrics["num_rendered"])
            nr_max = max(nr_max, nr)
            occ = nr / instance_cap
            if occ > 1.0:
                new_mult = max(raster_cfg.capacity_mult + 1,
                               _math.ceil(raster_cfg.capacity_mult * occ * 1.25))
                print(f"\n[s3 iter {iteration}] instance buffer overflow "
                      f"({int(nr)} > {instance_cap}): growing capacity_mult "
                      f"{raster_cfg.capacity_mult} -> {new_mult}", flush=True)
                raster_cfg = _dc.replace(raster_cfg, capacity_mult=new_mult)
                instance_cap = raster_cfg.instance_capacity(n_fit)
            elif (not shrunk and iteration >= 300
                  and nr_max < 0.5 * instance_cap):
                new_mult = max(1, _math.ceil(
                    raster_cfg.capacity_mult * (nr_max / instance_cap) * 1.6))
                if new_mult < raster_cfg.capacity_mult:
                    print(f"\n[s3 iter {iteration}] right-sizing capacity_mult "
                          f"{raster_cfg.capacity_mult} -> {new_mult} "
                          f"(max num_rendered {int(nr_max)})", flush=True)
                    raster_cfg = _dc.replace(raster_cfg,
                                             capacity_mult=new_mult)
                    instance_cap = raster_cfg.instance_capacity(n_fit)
                shrunk = True
        if logger and iteration % 10 == 0:
            logger.scalars(iteration, **{k: float(v) for k, v in metrics.items()})
        if progress_callback:
            progress_callback(iteration, state, metrics)
        if iteration in checkpoint_iterations and model_path_curves:
            save_checkpoint(state, os.path.join(model_path_curves,
                                                "checkpoints", f"{iteration}.npz"))
    if logger:
        logger.close()
    return state


def save_checkpoint(state: CurvesTrainState, path: str) -> None:
    """The (_pts, features, sh_deg, optimizer) capture analog
    (gaussian_model_strands.py:86-110)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {}
    for tree, pre in ((state.params, "p"), (state.static, "s"),
                      (state.opt.mu, "mu"), (state.opt.nu, "nu")):
        for k, v in tree._asdict().items():
            blob[f"{pre}.{k}"] = np.asarray(v)
    blob["count"] = np.asarray(state.opt.count)
    blob["step"] = np.asarray(state.step)
    np.savez(path, **blob)


def load_checkpoint(path: str) -> CurvesTrainState:
    d = dict(np.load(path))
    get = lambda pre, cls: cls(**{k.split(".", 1)[1]: jnp.asarray(v)
                                  for k, v in d.items() if k.startswith(pre + ".")})
    return CurvesTrainState(
        get("p", CurvesParams), get("s", CurvesStatic),
        optim.AdamState(get("mu", CurvesParams), get("nu", CurvesParams),
                        jnp.asarray(d["count"])),
        jnp.asarray(d["step"]))


def export_points(state: CurvesTrainState) -> np.ndarray:
    """[N, L, 3] world-space strand polylines (export_curves.py contract)."""
    return np.asarray(curves_points(state.params, state.static))
