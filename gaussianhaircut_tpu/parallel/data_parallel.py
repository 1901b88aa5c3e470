"""Multi-chip scaling: camera-data-parallel training over a device mesh.

The reference trains strictly single-GPU, one camera per iteration
(SURVEY.md §2.3).  The TPU-native scaling axis is cameras: every device of a
1-D ``data`` mesh renders a *different* training view against replicated
Gaussian parameters; parameter gradients are `pmean`-ed over ICI and the
(replicated) Adam step is applied identically on every device.  Per-camera
residual gradients live on disjoint rows, so a plain `psum` reassembles the
full per-camera gradient at reference strength.

Implemented with `shard_map` (per-device rank-reduced bodies) rather than
vmap-of-the-kernel: the Pallas rasterizer runs unbatched on each device,
exactly as in the single-chip path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.render.renderer import default_background, render
from gaussianhaircut_tpu.scene.cameras import camera_geom
from gaussianhaircut_tpu.train import densify, optim
from gaussianhaircut_tpu.train.stage1 import (
    CamAdamState, GtBatch, TrainState, cam_lrs, compute_losses, param_lrs,
)


def make_camera_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def dp_train_step(mesh: Mesh, *, active_sh_degree: int, width: int,
                  height: int, raster_cfg: RasterConfig,
                  opt_cfg: OptimizationConfig, trainable_cameras: bool = True,
                  trainable_intrinsics: bool = True, use_barf: bool = True,
                  white_background: bool = False):
    """Build the jitted data-parallel train step.

    Call signature of the returned fn:
      step(state, cam_batch, gt, cam_idx[B]) -> (state, metrics)
    where B == mesh size; cam_idx, and the gt/cam stacks indexed by it, are
    sharded over the ``data`` axis.
    """
    bg = default_background(white_background)

    def device_body(state: TrainState, colmap_t, fovx, fovy, gt_rows, cam_idx):
        # Per-device: one camera (leading dim 1 from sharding).
        colmap_t = colmap_t[0]
        fovx, fovy = fovx[0], fovy[0]
        idx = cam_idx[0]
        gt_img, gt_mask, gt_oa, gt_oc = [g[0] for g in gt_rows]
        alive = state.model.aux.alive

        def loss_fn(params, cam_res):
            cam = camera_geom(colmap_t, fovx, fovy, width, height, cam_res,
                              idx, use_barf=use_barf,
                              trainable_cameras=trainable_cameras,
                              trainable_intrinsics=trainable_intrinsics)
            out = render(params, alive, active_sh_degree, cam, bg, raster_cfg)
            total, parts = compute_losses(out, gt_img, gt_mask, gt_oa, gt_oc,
                                          opt_cfg)
            return total, (parts, out["radii"], out["visibility_filter"],
                           out["num_rendered"])

        (_, (parts, radii, visibility, num_rendered)), (gparams, gcam) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.model.params, state.cam_res))

        # Gaussian grads: mean over cameras (ICI all-reduce).
        gparams_red = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), gparams)
        # Camera-residual grads: disjoint rows -> psum gathers them.
        gcam_red = jax.tree.map(lambda g: jax.lax.psum(g, "data"), gcam)

        # Densification stats: each device contributes its view's per-Gaussian
        # viewspace-gradient norm and visibility; psum accumulates like B
        # sequential reference iterations.
        from gaussianhaircut_tpu.models.gaussian_model import GaussianAux
        gn_local = jnp.linalg.norm(
            jnp.where(visibility[:, None], gparams.viewspace, 0.0)[:, :2], axis=-1)
        gn = jax.lax.psum(gn_local, "data")
        vis_count = jax.lax.psum(visibility.astype(jnp.float32), "data")
        radii_max = jax.lax.pmax(
            jnp.where(visibility, radii.astype(jnp.float32), 0.0), "data")
        aux = state.model.aux
        new_aux = GaussianAux(alive=aux.alive,
                              max_radii2d=jnp.maximum(aux.max_radii2d, radii_max),
                              xyz_grad_accum=aux.xyz_grad_accum + gn,
                              denom=aux.denom + vis_count)

        ok = optim.grads_are_finite(
            gparams_red._replace(viewspace=jnp.zeros_like(gparams_red.viewspace)))
        lrs = param_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
        updates, new_opt = optim.adam_update(gparams_red, state.opt, lrs)
        # jnp.where, NOT keep * u (0 * NaN = NaN would destroy the params)
        new_params = jax.tree.map(lambda p, u: p + jnp.where(ok, u, 0.0),
                                  state.model.params, updates)
        new_opt = jax.lax.cond(ok, lambda: new_opt, lambda: state.opt)

        # camera rows: every drawn camera row steps (apply dense row update —
        # rows not drawn this step have zero grad and zero moments update)
        if trainable_cameras or trainable_intrinsics:
            cam_ok = optim.grads_are_finite(gcam_red)
            do_cam = cam_ok & (state.step < opt_cfg.iterations_cam)
            clrs = cam_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
            drawn = jnp.zeros(state.cam_opt.count.shape, jnp.float32)
            drawn = drawn.at[cam_idx].set(1.0)
            drawn = jax.lax.psum(drawn, "data")
            drawn = jnp.minimum(drawn, 1.0)
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
            for name in state.cam_res._fields:
                mu, nu, res = upd(getattr(state.cam_opt.mu, name),
                                  getattr(state.cam_opt.nu, name),
                                  getattr(gcam_red, name), getattr(clrs, name),
                                  getattr(state.cam_res, name))
                mus[name], nus[name], ress[name] = mu, nu, res
            cam_res_t = type(state.cam_res)
            new_cam_opt = CamAdamState(cam_res_t(**mus), cam_res_t(**nus), new_count)
            new_cam_res = cam_res_t(**ress)
        else:
            new_cam_opt, new_cam_res = state.cam_opt, state.cam_res

        new_model = state.model.replace(params=new_params, aux=new_aux)
        new_state = TrainState(new_model, new_opt, new_cam_res, new_cam_opt,
                               state.step + 1)
        metrics = {k: jax.lax.pmean(v, "data") for k, v in parts.items()}
        # capacity health is a MAX across shards (each camera bins into its
        # own per-shard instance buffer; the overflow check needs the worst
        # one, a mean would hide a truncating shard)
        metrics["num_rendered"] = jax.lax.pmax(
            num_rendered.astype(jnp.float32), "data")
        return new_state, metrics

    spec_rep = P()
    spec_data = P("data")

    sharded = jax.shard_map(
        device_body, mesh=mesh,
        in_specs=(spec_rep, spec_data, spec_data, spec_data,
                  (spec_data, spec_data, spec_data, spec_data), spec_data),
        out_specs=(spec_rep, spec_rep),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, cam_batch, gt: GtBatch, cam_idx):
        colmap_t = cam_batch.colmap_transform[cam_idx]
        fovx = cam_batch.fovx[cam_idx]
        fovy = cam_batch.fovy[cam_idx]
        gt_rows = (gt.image[cam_idx], gt.mask[cam_idx],
                   gt.orient_angle[cam_idx], gt.orient_conf[cam_idx])
        return sharded(state, colmap_t, fovx, fovy, gt_rows, cam_idx)

    return step
