"""Stage-1 trainer: unstructured 3DGS fit (the train_gaussians.py equivalent).

One jitted train step = render -> losses -> VJP -> NaN-guarded Adam on both
the Gaussian parameters and the per-camera pose/intrinsics residuals
(train_gaussians.py:36-208).  Densification runs as a separate jitted
function on the interval schedule; SH degree bumps re-specialize the step
(4 compilations total).

Loss stack (train_gaussians.py:120-140):
  loss = lambda_dl1 * L1(render, gt | body-mask)
       + lambda_dssim * (1 - SSIM(masked))
       + lambda_dmask * L1(mask2, gt_mask2)
       + lambda_dorient * OR(orient_angle | conf, weighted by gt conf, hair-mask)
"""
from __future__ import annotations

import functools
import os
import pickle
import random
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.ops import losses as L
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.ops.ssim import ssim
from gaussianhaircut_tpu.render.renderer import default_background, render
from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraResiduals, camera_geom
from gaussianhaircut_tpu.train import densify, optim
from gaussianhaircut_tpu.utils.logger import MetricsLogger


class CamAdamState(NamedTuple):
    """Per-camera-row Adam (each camera steps only when it is drawn, matching
    torch's skip-if-no-grad semantics)."""
    mu: CameraResiduals
    nu: CameraResiduals
    count: jnp.ndarray  # [N] per-camera step counts


class TrainState(NamedTuple):
    model: gm.GaussianModelState
    opt: optim.AdamState
    cam_res: CameraResiduals
    cam_opt: CamAdamState
    step: jnp.ndarray


class GtBatch(NamedTuple):
    """Stacked ground truth for all training cameras [N, C, H, W]."""
    image: jnp.ndarray
    mask: jnp.ndarray          # [N, 2, H, W] (hair, body)
    orient_angle: jnp.ndarray
    orient_conf: jnp.ndarray

    @staticmethod
    def from_cameras(cams) -> "GtBatch":
        return GtBatch(
            image=jnp.asarray(np.stack([c.image for c in cams])),
            mask=jnp.asarray(np.stack([c.mask for c in cams])),
            orient_angle=jnp.asarray(np.stack([c.orient_angle for c in cams])),
            orient_conf=jnp.asarray(np.stack([c.orient_conf for c in cams])),
        )


def param_lrs(opt_cfg: OptimizationConfig, spatial_lr_scale: float, step):
    """Per-leaf LR pytree (gaussian_model.py:426-448): xyz on the exponential
    schedule, viewspace frozen (gradient port only)."""
    xyz_lr = optim.expon_lr(step,
                            opt_cfg.position_lr_init * spatial_lr_scale,
                            opt_cfg.position_lr_final * spatial_lr_scale,
                            lr_delay_mult=opt_cfg.position_lr_delay_mult,
                            max_steps=opt_cfg.position_lr_max_steps)
    return gm.GaussianParams(
        xyz=xyz_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
        opacity=opt_cfg.opacity_lr,
        label=opt_cfg.label_lr,
        orient_conf=opt_cfg.orient_conf_lr if opt_cfg.train_orient_conf else 0.0,
        viewspace=0.0,
    )


def cam_lrs(opt_cfg: OptimizationConfig, spatial_lr_scale: float, step):
    trans_lr = optim.expon_lr(step,
                              opt_cfg.cam_translation_lr_init * spatial_lr_scale,
                              opt_cfg.cam_translation_lr_final * spatial_lr_scale,
                              max_steps=opt_cfg.cam_lr_max_steps)
    return CameraResiduals(rotation=opt_cfg.cam_rotation_lr,
                           translation=trans_lr,
                           fov=opt_cfg.cam_fov_lr)


def compute_losses(out, gt_image, gt_mask, gt_orient_angle, gt_orient_conf,
                   opt_cfg: OptimizationConfig):
    body = gt_mask[1:]
    hair = gt_mask[:1]
    ll1 = L.l1_loss(out["render"], gt_image, mask=body)
    lssim = 1.0 - ssim(out["render"] * body, gt_image * body)
    lmask = L.l1_loss(out["mask"], gt_mask)
    orient_weight = jnp.ones_like(hair) * gt_orient_conf
    lorient = L.or_loss(out["orient_angle"], gt_orient_angle,
                        confs=out["orient_conf"], weight=orient_weight,
                        mask=hair)
    lorient = jnp.where(jnp.isnan(lorient), 0.0, lorient)
    total = (ll1 * opt_cfg.lambda_dl1 + lssim * opt_cfg.lambda_dssim
             + lmask * opt_cfg.lambda_dmask + lorient * opt_cfg.lambda_dorient)
    return total, {"l1": ll1, "ssim": lssim, "mask": lmask, "orient": lorient,
                   "total": total}


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "width", "height", "raster_cfg",
                     "opt_cfg", "trainable_cameras", "trainable_intrinsics",
                     "use_barf", "white_background"))
def train_step(state: TrainState, cam_batch: CameraBatch, gt: GtBatch,
               cam_idx, *, active_sh_degree: int, width: int, height: int,
               raster_cfg: RasterConfig, opt_cfg: OptimizationConfig,
               trainable_cameras: bool, trainable_intrinsics: bool,
               use_barf: bool, white_background: bool):
    bg = default_background(white_background)
    alive = state.model.aux.alive

    def loss_fn(params, cam_res):
        cam = camera_geom(cam_batch.colmap_transform[cam_idx],
                          cam_batch.fovx[cam_idx], cam_batch.fovy[cam_idx],
                          width, height, cam_res, cam_idx,
                          use_barf=use_barf,
                          trainable_cameras=trainable_cameras,
                          trainable_intrinsics=trainable_intrinsics)
        out = render(params, alive, active_sh_degree, cam, bg, raster_cfg)
        total, parts = compute_losses(
            out, gt.image[cam_idx], gt.mask[cam_idx],
            gt.orient_angle[cam_idx], gt.orient_conf[cam_idx], opt_cfg)
        return total, (parts, out["radii"], out["visibility_filter"],
                       out["num_rendered"])

    (loss, (parts, radii, visibility, num_rendered)), (gparams, gcam) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.model.params, state.cam_res))

    # densification stats use the viewspace-gradient port; sanitize first —
    # viewspace is excluded from the NaN guard (it is a port, not a param),
    # so one NaN step must not poison the accumulated stats
    safe_vs = jnp.where(jnp.isfinite(gparams.viewspace), gparams.viewspace,
                        0.0)
    new_aux = densify.add_stats(state.model.aux, safe_vs, radii, visibility)

    # --- Gaussian Adam step with NaN guard (train_gaussians.py:174-181) ---
    model_grads_ok = optim.grads_are_finite(
        gparams._replace(viewspace=jnp.zeros_like(gparams.viewspace)))
    lrs = param_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
    updates, new_opt = optim.adam_update(gparams, state.opt, lrs)
    # jnp.where, NOT keep * u: 0 * NaN = NaN, so a multiplicative mask lets
    # one NaN-grad step destroy the parameters the guard exists to protect
    new_params = jax.tree.map(
        lambda p, u: p + jnp.where(model_grads_ok, u, 0.0),
        state.model.params, updates)
    # on NaN the whole step is skipped, moments and count included
    # (torch Adam's skip-if-no-grad semantics)
    new_opt = jax.lax.cond(model_grads_ok, lambda: new_opt, lambda: state.opt)

    # --- camera Adam: only the drawn camera's row advances ---
    if trainable_cameras or trainable_intrinsics:
        cam_ok = optim.grads_are_finite(gcam)
        active_window = state.step < opt_cfg.iterations_cam
        do_cam = cam_ok & active_window
        clrs = cam_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
        row_count = state.cam_opt.count[cam_idx] + 1
        b1, b2, eps = 0.9, 0.999, 1e-15

        def upd(mu, nu, g, lr, res):
            mu_row = b1 * mu[cam_idx] + (1 - b1) * g[cam_idx]
            nu_row = b2 * nu[cam_idx] + (1 - b2) * g[cam_idx] ** 2
            c1 = 1 - b1 ** row_count.astype(jnp.float32)
            c2 = 1 - b2 ** row_count.astype(jnp.float32)
            step_row = -lr * (mu_row / c1) / (jnp.sqrt(nu_row / c2) + eps)
            # jnp.where, NOT a multiplicative mask (0 * NaN = NaN)
            return (mu.at[cam_idx].set(jnp.where(do_cam, mu_row, mu[cam_idx])),
                    nu.at[cam_idx].set(jnp.where(do_cam, nu_row, nu[cam_idx])),
                    res.at[cam_idx].add(jnp.where(do_cam, step_row, 0.0)))

        mus, nus, ress = [], [], []
        for name in CameraResiduals._fields:
            lr = getattr(clrs, name)
            mu, nu, res = upd(getattr(state.cam_opt.mu, name),
                              getattr(state.cam_opt.nu, name),
                              getattr(gcam, name), lr,
                              getattr(state.cam_res, name))
            mus.append(mu)
            nus.append(nu)
            ress.append(res)
        new_cam_opt = CamAdamState(CameraResiduals(*mus), CameraResiduals(*nus),
                                   state.cam_opt.count.at[cam_idx].add(
                                       do_cam.astype(jnp.int32)))
        new_cam_res = CameraResiduals(*ress)
    else:
        new_cam_opt, new_cam_res = state.cam_opt, state.cam_res

    new_model = state.model.replace(params=new_params, aux=new_aux)
    new_state = TrainState(new_model, new_opt, new_cam_res, new_cam_opt,
                           state.step + 1)
    metrics = dict(parts)
    metrics["num_rendered"] = num_rendered
    metrics["grads_ok"] = model_grads_ok
    return new_state, metrics


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "width", "height", "raster_cfg",
                     "opt_cfg", "trainable_cameras", "trainable_intrinsics",
                     "use_barf", "white_background", "n_batch"))
def train_step_batched(state: TrainState, cam_batch: CameraBatch, gt: GtBatch,
                       cam_idxs, *, active_sh_degree: int, width: int,
                       height: int, raster_cfg: RasterConfig,
                       opt_cfg: OptimizationConfig, trainable_cameras: bool,
                       trainable_intrinsics: bool, use_barf: bool,
                       white_background: bool, n_batch: int):
    """Batched-camera train step: B cameras composited in ONE rasterizer
    sweep (rasterize_batched), one Adam step on the camera-MEAN parameter
    gradient.  Binning is per-camera segmented (see rasterize_batched), but
    measured per-camera throughput still DECREASES with B (B=1 16.8 cam/s,
    B=4 12.5 — see rasterize_batched's docstring), so this path is a
    single-chip SEMANTICS mirror of mesh data-parallelism, not a throughput
    optimization; for multi-camera throughput use
    parallel/data_parallel.dp_train_step across devices.

    Semantics mirror parallel/data_parallel.dp_train_step exactly (parameter
    grads pmean-equivalent, camera-residual rows and densify statistics at
    full per-camera strength — stats accumulate like B sequential reference
    iterations), so the existing DP-vs-sequential parity arguments carry
    over; `cam_idxs` [B] must be distinct within the batch (the trainer draws
    without replacement).
    """
    from gaussianhaircut_tpu.models.gaussian_model import GaussianAux
    from gaussianhaircut_tpu.render.renderer import (
        decode_render10, fields_from_params, render_fields_batched,
    )

    bg = default_background(white_background)
    alive = state.model.aux.alive
    p_total = state.model.params.xyz.shape[0]

    def loss_fn(params, cam_res, vs_batch):
        def make_cam(idx):
            return camera_geom(cam_batch.colmap_transform[idx],
                               cam_batch.fovx[idx], cam_batch.fovy[idx],
                               width, height, cam_res, idx,
                               use_barf=use_barf,
                               trainable_cameras=trainable_cameras,
                               trainable_intrinsics=trainable_intrinsics)

        fields = fields_from_params(params, alive)
        out = render_fields_batched(fields, active_sh_degree, make_cam,
                                    cam_idxs, bg, width, height, raster_cfg,
                                    viewspace_batch=vs_batch)

        def one_loss(render10, idx):
            dec = decode_render10(render10)
            return compute_losses(dec, gt.image[idx], gt.mask[idx],
                                  gt.orient_angle[idx], gt.orient_conf[idx],
                                  opt_cfg)

        totals, parts = jax.vmap(one_loss)(out["render10"], cam_idxs)
        # SUM over cameras: per-camera cotangents reach the viewspace port
        # and camera-residual rows at full reference strength; parameter
        # grads are divided by B below (the dp pmean analog)
        return jnp.sum(totals), (parts, out["radii"],
                                 out["visibility_filter"],
                                 out["num_rendered"])

    vs_zero = jnp.zeros((n_batch, p_total, 3), jnp.float32)
    (_, (parts, radii, visibility, num_rendered)), (gparams, gcam, g_vs) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.model.params, state.cam_res, vs_zero))
    gparams = jax.tree.map(lambda g: g / n_batch, gparams)

    # densify stats: per-camera viewspace-grad norms + visibility, summed —
    # accumulates like B sequential reference iterations (dp_train_step:84-94)
    g_vs = jnp.where(jnp.isfinite(g_vs), g_vs, 0.0)
    gn = jnp.sum(jnp.linalg.norm(
        jnp.where(visibility[:, :, None], g_vs, 0.0)[:, :, :2], axis=-1),
        axis=0)
    vis_count = jnp.sum(visibility.astype(jnp.float32), axis=0)
    radii_max = jnp.max(jnp.where(visibility, radii.astype(jnp.float32), 0.0),
                        axis=0)
    aux = state.model.aux
    new_aux = GaussianAux(alive=aux.alive,
                          max_radii2d=jnp.maximum(aux.max_radii2d, radii_max),
                          xyz_grad_accum=aux.xyz_grad_accum + gn,
                          denom=aux.denom + vis_count)

    model_grads_ok = optim.grads_are_finite(
        gparams._replace(viewspace=jnp.zeros_like(gparams.viewspace)))
    lrs = param_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
    updates, new_opt = optim.adam_update(gparams, state.opt, lrs)
    # jnp.where, NOT keep * u (0 * NaN = NaN would destroy the params)
    new_params = jax.tree.map(
        lambda p, u: p + jnp.where(model_grads_ok, u, 0.0),
        state.model.params, updates)
    new_opt = jax.lax.cond(model_grads_ok, lambda: new_opt, lambda: state.opt)

    # camera rows: dense-row Adam on the drawn rows (dp_train_step:107-138)
    if trainable_cameras or trainable_intrinsics:
        cam_ok = optim.grads_are_finite(gcam)
        do_cam = cam_ok & (state.step < opt_cfg.iterations_cam)
        clrs = cam_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
        drawn = jnp.zeros(state.cam_opt.count.shape, jnp.float32)
        drawn = drawn.at[cam_idxs].set(1.0)
        sel = drawn * do_cam.astype(jnp.float32)
        b1, b2, eps = 0.9, 0.999, 1e-15
        new_count = state.cam_opt.count + sel.astype(jnp.int32)

        def upd(mu, nu, g, lr, res):
            mu2 = jnp.where(sel[:, None] > 0, b1 * mu + (1 - b1) * g, mu)
            nu2 = jnp.where(sel[:, None] > 0, b2 * nu + (1 - b2) * g * g, nu)
            cnt = jnp.maximum(new_count, 1).astype(jnp.float32)[:, None]
            step_row = -lr * (mu2 / (1 - b1 ** cnt)) / (
                jnp.sqrt(nu2 / (1 - b2 ** cnt)) + eps)
            return mu2, nu2, res + jnp.where(sel[:, None] > 0, step_row, 0.0)

        mus, nus, ress = {}, {}, {}
        for name in CameraResiduals._fields:
            mu, nu, res = upd(getattr(state.cam_opt.mu, name),
                              getattr(state.cam_opt.nu, name),
                              getattr(gcam, name), getattr(clrs, name),
                              getattr(state.cam_res, name))
            mus[name], nus[name], ress[name] = mu, nu, res
        new_cam_opt = CamAdamState(CameraResiduals(**mus),
                                   CameraResiduals(**nus), new_count)
        new_cam_res = CameraResiduals(**ress)
    else:
        new_cam_opt, new_cam_res = state.cam_opt, state.cam_res

    new_model = state.model.replace(params=new_params, aux=new_aux)
    new_state = TrainState(new_model, new_opt, new_cam_res, new_cam_opt,
                           state.step + 1)
    metrics = {k: jnp.mean(v) for k, v in parts.items()}
    metrics["num_rendered"] = num_rendered
    metrics["grads_ok"] = model_grads_ok
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("opt_cfg", "max_screen_size"))
def densify_step(state: TrainState, key, extent, *, opt_cfg: OptimizationConfig,
                 max_screen_size):
    model, opt = densify.densify_and_prune(
        state.model, state.opt, key, opt_cfg.densify_grad_threshold, 0.005,
        extent, max_screen_size, opt_cfg.percent_dense)
    return state._replace(model=model, opt=opt)


@jax.jit
def opacity_reset_step(state: TrainState):
    model, opt = densify.reset_opacity(state.model, state.opt)
    return state._replace(model=model, opt=opt)


def init_train_state(model_state: gm.GaussianModelState, n_cameras: int,
                     use_barf: bool) -> TrainState:
    params = model_state.params
    cam_res = CameraResiduals.create(n_cameras, use_barf)
    zeros = jax.tree.map(jnp.zeros_like, cam_res)
    return TrainState(
        model=model_state,
        opt=optim.adam_init(params),
        cam_res=cam_res,
        cam_opt=CamAdamState(zeros, jax.tree.map(jnp.zeros_like, cam_res),
                             jnp.zeros(n_cameras, jnp.int32)),
        step=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "width", "height", "raster_cfg",
                     "use_barf", "trainable_cameras", "trainable_intrinsics",
                     "white_background"))
def _eval_one(params, alive, cam_res, colmap_t, fovx, fovy, idx,
              gt_img, gt_mask, gt_oa, gt_oc, *, active_sh_degree, width,
              height, raster_cfg, use_barf, trainable_cameras,
              trainable_intrinsics, white_background):
    # Model state and GT MUST be jit arguments, not closure constants: besides
    # re-specializing per call, closing over a large trained state produced
    # EMPTY renders on the axon TPU backend (constants silently broken at
    # ~125 MB; observed 2026-08-17, postmortem in NOTES_ROUND2.md) while the
    # identical computation with arguments was correct.
    cam = camera_geom(colmap_t, fovx, fovy, width, height, cam_res, idx,
                      use_barf=use_barf, trainable_cameras=trainable_cameras,
                      trainable_intrinsics=trainable_intrinsics)
    bg = default_background(white_background)
    out = render(params, alive, active_sh_degree, cam, bg, raster_cfg)
    img = jnp.clip(out["render"], 0.0, 1.0)
    mask = jnp.clip(out["mask"], 0.0, 1.0)
    angle = jnp.clip(out["orient_angle"], 0.0, 1.0)
    gt_img = jnp.clip(gt_img, 0.0, 1.0)
    gt_mask = jnp.clip(gt_mask, 0.0, 1.0)
    return (L.l1_loss(img, gt_img),
            L.l1_loss(mask, gt_mask),
            L.or_loss(angle, gt_oa, mask=gt_mask[:1], weight=gt_oc),
            L.psnr(img, gt_img))


def evaluate(state: TrainState, cams, cam_batch: CameraBatch, gt: GtBatch,
             indices, *, active_sh_degree, width, height, raster_cfg,
             model_cfg, name="test", logger=None, iteration=0,
             log_gt=False):
    """In-training eval over a camera set: mean L1 / mask-L1 / orient / PSNR
    (the training_report loop, train_gaussians.py:241-287).  With ``logger``,
    the first <=5 views' render/mask/orient images go to the image log
    (train_gaussians.py:264-272; GT grids once, when ``log_gt``)."""
    from gaussianhaircut_tpu.utils.image import vis_orient

    totals = np.zeros(4)
    for vi, i in enumerate(indices):
        idx = jnp.asarray(i)
        totals += np.asarray(jax.device_get(_eval_one(
            state.model.params, state.model.aux.alive, state.cam_res,
            cam_batch.colmap_transform[idx], cam_batch.fovx[idx],
            cam_batch.fovy[idx], idx, gt.image[idx], gt.mask[idx],
            gt.orient_angle[idx], gt.orient_conf[idx],
            active_sh_degree=active_sh_degree, width=width, height=height,
            raster_cfg=raster_cfg, use_barf=model_cfg.use_barf,
            trainable_cameras=model_cfg.trainable_cameras,
            trainable_intrinsics=model_cfg.trainable_intrinsics,
            white_background=model_cfg.white_background)))
        if logger is not None and vi < 5:
            img, mask, angle, oconf = jax.device_get(_render_for_log(
                state.model.params, state.model.aux.alive, state.cam_res,
                cam_batch.colmap_transform[idx], cam_batch.fovx[idx],
                cam_batch.fovy[idx], idx,
                active_sh_degree=active_sh_degree, width=width, height=height,
                raster_cfg=raster_cfg, use_barf=model_cfg.use_barf,
                trainable_cameras=model_cfg.trainable_cameras,
                trainable_intrinsics=model_cfg.trainable_intrinsics,
                white_background=model_cfg.white_background))
            vn = cams[i].image_name
            conf_vis = (1.0 - 1.0 / (oconf + 1.0)) * mask[:1]
            logger.images(
                iteration,
                **{f"{name}_view_{vn}/render": img,
                   f"{name}_view_{vn}/render_mask": mask,
                   f"{name}_view_{vn}/render_orient":
                       vis_orient(angle, mask[:1]),
                   f"{name}_view_{vn}/render_orient_conf":
                       vis_orient(angle, conf_vis)})
            if log_gt:
                gt_conf_vis = np.asarray(
                    (1.0 - 1.0 / (gt.orient_conf[i] + 1.0)) * gt.mask[i][:1])
                logger.images(
                    iteration,
                    **{f"{name}_view_{vn}/ground_truth": np.asarray(gt.image[i]),
                       f"{name}_view_{vn}/ground_truth_mask": np.asarray(gt.mask[i]),
                       f"{name}_view_{vn}/ground_truth_orient":
                           vis_orient(np.asarray(gt.orient_angle[i]),
                                      np.asarray(gt.mask[i][:1])),
                       f"{name}_view_{vn}/ground_truth_orient_conf":
                           vis_orient(np.asarray(gt.orient_angle[i]),
                                      gt_conf_vis)})
    totals /= max(len(indices), 1)
    return {f"{name}_l1": totals[0], f"{name}_ce": totals[1],
            f"{name}_or": totals[2], f"{name}_psnr": totals[3]}


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "width", "height", "raster_cfg",
                     "use_barf", "trainable_cameras", "trainable_intrinsics",
                     "white_background"))
def _render_for_log(params, alive, cam_res, colmap_t, fovx, fovy, idx, *,
                    active_sh_degree, width, height, raster_cfg, use_barf,
                    trainable_cameras, trainable_intrinsics,
                    white_background):
    cam = camera_geom(colmap_t, fovx, fovy, width, height, cam_res, idx,
                      use_barf=use_barf, trainable_cameras=trainable_cameras,
                      trainable_intrinsics=trainable_intrinsics)
    out = render(params, alive, active_sh_degree, cam,
                 default_background(white_background), raster_cfg)
    return (jnp.clip(out["render"], 0.0, 1.0),
            jnp.clip(out["mask"], 0.0, 1.0),
            jnp.clip(out["orient_angle"], 0.0, 1.0),
            out["orient_conf"])


def save_checkpoint(state: TrainState, path: str) -> None:
    """npz checkpoint: model capture + optimizer moments + camera residuals
    (the .pth capture-tuple analog, train_gaussians.py:198-208)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = gm.capture(state.model)
    for tree, prefix in ((state.opt.mu, "opt.mu"), (state.opt.nu, "opt.nu")):
        for k, v in tree._asdict().items():
            blob[f"{prefix}.{k}"] = np.asarray(v)
    blob["opt.count"] = np.asarray(state.opt.count)
    for k, v in state.cam_res._asdict().items():
        blob[f"cam_res.{k}"] = np.asarray(v)
    for tree, prefix in ((state.cam_opt.mu, "cam_opt.mu"), (state.cam_opt.nu, "cam_opt.nu")):
        for k, v in tree._asdict().items():
            blob[f"{prefix}.{k}"] = np.asarray(v)
    blob["cam_opt.count"] = np.asarray(state.cam_opt.count)
    blob["step"] = np.asarray(state.step)
    np.savez(path, **blob)


def load_checkpoint(path: str) -> TrainState:
    d = dict(np.load(path))
    model = gm.restore(d)
    gp = lambda pre: gm.GaussianParams(**{k.split(".")[-1]: jnp.asarray(v)
                                          for k, v in d.items()
                                          if k.startswith(pre)})
    cr = lambda pre: CameraResiduals(**{k.split(".")[-1]: jnp.asarray(v)
                                        for k, v in d.items()
                                        if k.startswith(pre)})
    opt = optim.AdamState(gp("opt.mu."), gp("opt.nu."),
                          jnp.asarray(d["opt.count"]))
    cam_opt = CamAdamState(cr("cam_opt.mu."), cr("cam_opt.nu."),
                           jnp.asarray(d["cam_opt.count"]))
    return TrainState(model, opt, cr("cam_res."), cam_opt,
                      jnp.asarray(d["step"]))


def save_camera_pickles(state: TrainState, cams, cam_batch: CameraBatch,
                        model_path: str, iteration: int, use_barf: bool,
                        width: int, height: int) -> None:
    """cameras/{iter}.pkl + {iter}_matrices.pkl — the downstream-stage
    contract (train_gaussians.py:203-208)."""
    os.makedirs(os.path.join(model_path, "cameras"), exist_ok=True)
    rot, trans, fov = {}, {}, {}
    res = jax.device_get(state.cam_res)
    for i, c in enumerate(cams):
        rot[c.image_name] = np.asarray(res.rotation[i])
        trans[c.image_name] = np.asarray(res.translation[i])
        fov[c.image_name] = np.asarray(res.fov[i])
    with open(os.path.join(model_path, "cameras", f"{iteration}.pkl"), "wb") as f:
        pickle.dump((rot, trans, fov), f)
    matrices = {}
    for i, c in enumerate(cams):
        geom = camera_geom(cam_batch.colmap_transform[i], cam_batch.fovx[i],
                           cam_batch.fovy[i], width, height, state.cam_res, i,
                           use_barf=use_barf)
        matrices[c.image_name] = np.asarray(geom.projmatrix)
    with open(os.path.join(model_path, "cameras",
                           f"{iteration}_matrices.pkl"), "wb") as f:
        pickle.dump(matrices, f)


def poll_gui(state: TrainState, model_cfg: ModelConfig,
             raster_cfg: RasterConfig, active_sh_degree: int,
             iteration: int, total_iters: int) -> None:
    """Non-blocking live-viewer poll, one call per training iteration
    (train_gaussians.py:79-92): accept a SIBR connection if pending, answer
    any received camera with a rendered view, return to training when the
    viewer releases it (do_training && (iteration < total || !keep_alive))."""
    from gaussianhaircut_tpu.ops import projection as proj
    from gaussianhaircut_tpu.render import network_gui

    if network_gui.listener is None:
        return
    if network_gui.conn is None:
        network_gui.try_connect()
    while network_gui.conn is not None:
        try:
            net_image_bytes = None
            (custom_cam, do_training, _convert_shs, _compute_cov3d,
             keep_alive, scaling_modifier) = network_gui.receive()
            if custom_cam is not None:
                viewmatrix = jnp.asarray(custom_cam["world_view_transform"])
                cam = proj.CameraGeom(
                    viewmatrix=viewmatrix,
                    projmatrix=jnp.asarray(custom_cam["full_proj_transform"]),
                    tan_fovx=jnp.tan(jnp.asarray(custom_cam["fovx"] * 0.5)),
                    tan_fovy=jnp.tan(jnp.asarray(custom_cam["fovy"] * 0.5)),
                    width=custom_cam["width"], height=custom_cam["height"],
                    campos=jnp.linalg.inv(viewmatrix)[3, :3])
                out = render(state.model.params, state.model.aux.alive,
                             active_sh_degree, cam,
                             default_background(model_cfg.white_background),
                             raster_cfg, scaling_modifier)
                img = np.asarray(jnp.clip(out["render"][:3], 0.0, 1.0))
                net_image_bytes = np.ascontiguousarray(
                    (img * 255).astype(np.uint8).transpose(1, 2, 0)).tobytes()
            network_gui.send(net_image_bytes, model_cfg.source_path)
            if do_training and (iteration < total_iters or not keep_alive):
                break
        except Exception:
            network_gui.conn = None


def train(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
          pipe_cfg: PipelineConfig, scene, *, test_iterations=(1000, 5000, 15000, 30000),
          save_iterations=(1000, 5000, 15000, 30000),
          checkpoint_iterations=(30000,), start_checkpoint=None,
          progress_callback=None, mesh_spec: str = "", camera_batch: int = 1):
    """Host-side training loop (train_gaussians.py:78-208).

    mesh_spec: "DATAxTILE" (e.g. "4x2") runs the multi-chip step from
    parallel/tile_parallel over a (camera, tile-row) device mesh; each
    iteration then consumes DATA cameras (gradients averaged — a batch-size
    deviation from the reference's strictly 1 camera/iteration, documented).
    Empty = single-chip reference behavior.

    camera_batch: B > 1 (single-chip only) composites B distinct cameras per
    iteration in ONE rasterizer sweep (train_step_batched) — same gradient
    semantics as mesh data-parallelism (camera-mean param grads, full-
    strength per-camera densify stats), amortizing per-call fixed costs
    (per-camera kernel/sort work scales linearly: per-camera segmented
    binning, see rasterize_batched).
    """
    cams = scene.train_cameras
    assert cams, "no training cameras"
    width, height = cams[0].width, cams[0].height
    cam_batch = CameraBatch.from_cameras(cams)
    gt = GtBatch.from_cameras(cams)

    capacity = pipe_cfg.gaussian_capacity or max(
        1 << (len(scene.points) * 4 - 1).bit_length(), 1 << 17)
    model_state = gm.create_from_pcd(scene.points, scene.colors, capacity,
                                     model_cfg.sh_degree, scene.cameras_extent)
    state = init_train_state(model_state, len(cams), model_cfg.use_barf)
    if start_checkpoint:
        state = load_checkpoint(start_checkpoint)

    raster_cfg = RasterConfig(tile_w=pipe_cfg.tile, tile_h=pipe_cfg.tile,
                              capacity_mult=pipe_cfg.instance_capacity_mult,
                              backend=pipe_cfg.raster_backend)
    logger = MetricsLogger(model_cfg.model_path) if model_cfg.model_path else None
    rng = random.Random(0)
    key = jax.random.PRNGKey(0)
    stack = []
    first_iter = int(state.step)
    ema = 0.0
    # batched steps size the instance buffer against B * P rows and report
    # num_rendered totalled over the batch — occupancy semantics unchanged
    cap_points = capacity * max(1, camera_batch)
    instance_cap = raster_cfg.instance_capacity(cap_points)

    warned_slots = False
    n_data = max(1, camera_batch) if not mesh_spec else 1
    if camera_batch > 1 and mesh_spec:
        raise ValueError("camera_batch and mesh_spec are mutually exclusive")
    if camera_batch > len(cams):
        raise ValueError(f"camera_batch {camera_batch} > {len(cams)} cameras")
    mesh_step_cache = {}
    if mesh_spec:
        from gaussianhaircut_tpu.parallel import dp_tp_train_step, make_mesh2d
        n_data, n_tile = (int(v) for v in mesh_spec.lower().split("x"))
        mesh = make_mesh2d(n_data, n_tile)

        def make_mesh_step(sh_deg, rcfg):
            k = (sh_deg, rcfg)
            if k not in mesh_step_cache:
                mesh_step_cache[k] = dp_tp_train_step(
                    mesh, active_sh_degree=sh_deg, width=width, height=height,
                    raster_cfg=rcfg, opt_cfg=opt_cfg,
                    trainable_cameras=model_cfg.trainable_cameras,
                    trainable_intrinsics=model_cfg.trainable_intrinsics,
                    use_barf=model_cfg.use_barf,
                    white_background=model_cfg.white_background)
            return mesh_step_cache[k]

    for iteration in range(first_iter + 1, opt_cfg.iterations + 1):
        sh_deg = min(iteration // 1000, model_cfg.sh_degree)
        poll_gui(state, model_cfg, raster_cfg, sh_deg, iteration,
                 opt_cfg.iterations)
        if len(stack) < n_data:
            # extend with a fresh shuffled epoch rather than replacing, so
            # leftover cameras are still drawn (replacing silently dropped up
            # to n_data-1 cameras per epoch in mesh mode; ADVICE round 2)
            new_epoch = list(range(len(cams)))
            rng.shuffle(new_epoch)
            stack = new_epoch + stack

        if mesh_spec:
            idxs = [stack.pop(rng.randrange(len(stack)))
                    for _ in range(n_data)]
            state, metrics = make_mesh_step(sh_deg, raster_cfg)(
                state, cam_batch, gt, jnp.asarray(idxs, jnp.int32))
        elif camera_batch > 1:
            # distinct within the batch (train_step_batched's contract for
            # the camera-row scatter); the epoch stack guarantees it as long
            # as no index repeats before its epoch drains — pop via a seen-set
            idxs, seen = [], set()
            while len(idxs) < camera_batch:
                i = stack.pop(rng.randrange(len(stack)))
                if i in seen:
                    stack.insert(0, i)  # back to the epoch tail
                    continue
                seen.add(i)
                idxs.append(i)
            state, metrics = train_step_batched(
                state, cam_batch, gt, jnp.asarray(idxs, jnp.int32),
                active_sh_degree=sh_deg, width=width, height=height,
                raster_cfg=raster_cfg, opt_cfg=opt_cfg,
                trainable_cameras=model_cfg.trainable_cameras,
                trainable_intrinsics=model_cfg.trainable_intrinsics,
                use_barf=model_cfg.use_barf,
                white_background=model_cfg.white_background,
                n_batch=camera_batch)
        else:
            cam_idx = stack.pop(rng.randrange(len(stack)))
            state, metrics = train_step(
                state, cam_batch, gt, jnp.asarray(cam_idx),
                active_sh_degree=sh_deg, width=width, height=height,
                raster_cfg=raster_cfg, opt_cfg=opt_cfg,
                trainable_cameras=model_cfg.trainable_cameras,
                trainable_intrinsics=model_cfg.trainable_intrinsics,
                use_barf=model_cfg.use_barf,
                white_background=model_cfg.white_background)

        if iteration < opt_cfg.densify_until_iter:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                size_thr = 20 if iteration > opt_cfg.opacity_reset_interval else None
                key, sub = jax.random.split(key)
                state = densify_step(state, sub, scene.cameras_extent,
                                     opt_cfg=opt_cfg, max_screen_size=size_thr)
                n_alive = int(state.model.num_alive())
                if n_alive >= 0.99 * capacity and not warned_slots:
                    warned_slots = True
                    print(f"\n[iter {iteration}] gaussian slots ~exhausted "
                          f"({n_alive}/{capacity}): densification is slot-"
                          "starved from here on; raise --gaussian_capacity "
                          "if quality plateaus (capacity-limited, "
                          "NOTES_ROUND2.md quality findings)")
            if iteration % opt_cfg.opacity_reset_interval == 0 or (
                    model_cfg.white_background
                    and iteration == opt_cfg.densify_from_iter):
                state = opacity_reset_step(state)

        # Binning is static-capacity (the CUDA reference's dynamic arena,
        # rasterize_points.cu:27-33, never drops instances — we must not
        # truncate silently either): occupancy > 1 means instances were
        # dropped, so grow the capacity and re-specialize the step, the
        # static-shape analog of the CUDA arena resize.  Checked on an
        # interval (the check itself syncs num_rendered to host).
        if iteration % 100 == 0:
            occupancy = float(metrics["num_rendered"]) / instance_cap
            if occupancy > 1.0:
                import dataclasses
                import math as _math
                new_mult = max(
                    raster_cfg.capacity_mult + 1,
                    _math.ceil(raster_cfg.capacity_mult * occupancy * 1.25))
                print(f"\n[iter {iteration}] instance buffer overflow "
                      f"({int(metrics['num_rendered'])} rendered > capacity "
                      f"{instance_cap}): growing instance_capacity_mult "
                      f"{raster_cfg.capacity_mult} -> {new_mult} "
                      "(recompiles the train step)")
                raster_cfg = dataclasses.replace(raster_cfg,
                                                 capacity_mult=new_mult)
                instance_cap = raster_cfg.instance_capacity(cap_points)

        if logger and iteration % 10 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            ema = 0.4 * m["total"] + 0.6 * ema
            logger.scalars(iteration,
                           ema=ema,
                           instance_occupancy=m["num_rendered"] / instance_cap,
                           num_alive=float(state.model.num_alive()), **m)
        if progress_callback:
            progress_callback(iteration, state, metrics)

        if iteration in test_iterations:
            # training_report (train_gaussians.py:241-293): test split + a
            # fixed sample of train views, image grids for the first <=5
            # views, opacity/label histograms, total_points
            first_test = iteration == min(test_iterations)
            report = {}
            if scene.test_cameras and scene.test_cameras[0].image is not None:
                test_batch = CameraBatch.from_cameras(scene.test_cameras)
                test_gt = GtBatch.from_cameras(scene.test_cameras)
                report.update(evaluate(
                    state, scene.test_cameras, test_batch, test_gt,
                    range(len(scene.test_cameras)), active_sh_degree=sh_deg,
                    width=scene.test_cameras[0].width,
                    height=scene.test_cameras[0].height,
                    raster_cfg=raster_cfg, model_cfg=model_cfg, name="test",
                    logger=logger, iteration=iteration, log_gt=first_test))
            train_sample = [i % len(cams) for i in range(5, 30, 5)]
            report.update(evaluate(
                state, cams, cam_batch, gt, train_sample,
                active_sh_degree=sh_deg, width=width, height=height,
                raster_cfg=raster_cfg, model_cfg=model_cfg, name="train",
                logger=logger, iteration=iteration, log_gt=first_test))
            msg = "  ".join(f"{k} {v:.5f}" for k, v in report.items())
            print(f"\n[ITER {iteration}] Evaluating: {msg}")
            if logger:
                logger.scalars(iteration, **report,
                               total_points=float(state.model.num_alive()))
                alive_np = np.asarray(state.model.aux.alive)
                logger.histogram(
                    iteration, "scene/opacity_histogram",
                    np.asarray(gm.get_opacity(state.model.params))[alive_np])
                logger.histogram(
                    iteration, "scene/label_histogram",
                    np.asarray(gm.get_label(state.model.params))[alive_np])

        if iteration in save_iterations and model_cfg.model_path:
            out_dir = os.path.join(model_cfg.model_path,
                                   f"point_cloud/iteration_{iteration}")
            gm.save_ply(state.model, os.path.join(out_dir, "point_cloud.ply"))
        if iteration in checkpoint_iterations and model_cfg.model_path:
            save_checkpoint(state, os.path.join(
                model_cfg.model_path, "checkpoints", f"{iteration}.npz"))
            save_camera_pickles(state, cams, cam_batch, model_cfg.model_path,
                                iteration, model_cfg.use_barf, width, height)

    if logger:
        logger.close()
    return state
