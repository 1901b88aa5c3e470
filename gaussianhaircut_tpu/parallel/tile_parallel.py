"""Multi-chip scaling, axis 2: tile-row-sharded rasterization (+ camera DP).

``data_parallel`` scales over cameras; this module additionally shards the
rasterizer's hot path — binning + both Pallas kernels — over a ``tile`` mesh
axis.  Each device renders a horizontal window of tile rows of its camera's
image (the rasterize() ``full_height`` hook: ndc_y shifted by -2*y0/H), the
small composited images are all-gathered over ICI, and the losses are
computed replicated on the full image — bit-identical to the single-chip
loss (SSIM windows crossing shard boundaries included).  Per-Gaussian
precompute stays replicated (it is ~10% of the step; the kernels+binning it
feeds are ~75% and shard linearly).

Gradient assembly: each device's backward covers only its rows'
contribution, so Gaussian-parameter grads are `psum` over ``tile`` then
`pmean` over ``data`` (camera batch mean); per-camera residual grads are
`psum` over both axes (rows within a camera, disjoint camera rows across
data).  This is a new TPU-native capability — the CUDA reference is strictly
single-GPU (SURVEY.md §2.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.ops.rasterize import RasterConfig, rasterize
from gaussianhaircut_tpu.render.renderer import (
    decode_render10, default_background, fields_from_params,
    prepare_raster_inputs,
)
from gaussianhaircut_tpu.scene.cameras import camera_geom
from gaussianhaircut_tpu.train import optim
from gaussianhaircut_tpu.train.stage1 import (
    CamAdamState, GtBatch, TrainState, cam_lrs, compute_losses, param_lrs,
)


def make_mesh2d(n_data: int, n_tile: int, devices=None) -> Mesh:
    """(data, tile) mesh: cameras over ``data``, tile rows over ``tile``."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_tile, (
        f"need {n_data * n_tile} devices, have {len(devices)}")
    grid = np.asarray(devices[:n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(grid, axis_names=("data", "tile"))


def dp_tp_train_step(mesh: Mesh, *, active_sh_degree: int, width: int,
                     height: int, raster_cfg: RasterConfig,
                     opt_cfg: OptimizationConfig,
                     trainable_cameras: bool = True,
                     trainable_intrinsics: bool = True, use_barf: bool = True,
                     white_background: bool = False):
    """Build the jitted 2-D (camera x tile-row) sharded train step.

    Returned signature: step(state, cam_batch, gt, cam_idx[n_data])
    -> (state, metrics).  ``raster_cfg.capacity_mult`` sizes the PER-SHARD
    instance buffer; with T row shards each shard holds roughly 1/T of the
    camera's instances, so it can be ~T times smaller than single-chip.
    """
    bg = default_background(white_background)
    n_tile = mesh.shape["tile"]
    gy_full = -(-height // raster_cfg.tile_h)
    rows_per = -(-gy_full // n_tile)
    crop_h = rows_per * raster_cfg.tile_h

    def device_body(state: TrainState, colmap_t, fovx, fovy, gt_rows, cam_idx):
        colmap_t = colmap_t[0]
        fovx, fovy = fovx[0], fovy[0]
        idx = cam_idx[0]
        gt_img, gt_mask, gt_oa, gt_oc = [g[0] for g in gt_rows]
        alive = state.model.aux.alive
        t = jax.lax.axis_index("tile")
        y0 = (t * crop_h).astype(jnp.float32)

        def loss_fn(params, cam_res):
            cam = camera_geom(colmap_t, fovx, fovy, width, height, cam_res,
                              idx, use_barf=use_barf,
                              trainable_cameras=trainable_cameras,
                              trainable_intrinsics=trainable_intrinsics)
            ndc, conic, colors, opacity, depth, valid = prepare_raster_inputs(
                fields_from_params(params, alive), active_sh_degree, cam)
            # render the row window [y0, y0 + crop_h) of the full image
            shift = jnp.stack([jnp.zeros_like(y0), 2.0 * y0 / height,
                               jnp.zeros_like(y0)])
            out = rasterize(ndc - shift[None, :], conic, colors, opacity,
                            depth, valid, bg, width, crop_h, raster_cfg,
                            full_height=height)
            # gather the shards into the full image (replicated), crop the
            # grid padding, and take the SAME losses as single-chip
            rows = jax.lax.all_gather(out["render"], "tile")   # [T, 10, ch, W]
            render10 = rows.transpose(1, 0, 2, 3).reshape(
                10, n_tile * crop_h, width)[:, :height]
            dec = decode_render10(render10)
            total, parts = compute_losses(dec, gt_img, gt_mask, gt_oa, gt_oc,
                                          opt_cfg)
            # The loss is computed REPLICATED on every tile shard, and
            # all_gather's transpose (psum_scatter) SUMS the identical
            # cotangents from all n_tile shards — so without this 1/n_tile
            # the per-shard grads (and the psum'd full-camera grad below)
            # come out n_tile x too large.  Adam hides a uniform scale, but
            # xyz_grad_accum feeds densify_grad_threshold, which must match
            # the single-chip reference.
            return total / n_tile, (parts, out["radii"], out["visibility"],
                                    out["num_rendered"])

        (_, (parts, radii, vis_local, num_rendered)), (gparams, gcam) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.model.params, state.cam_res))

        # rows are disjoint: full per-camera grad = psum over tile; then the
        # camera-batch mean over data
        gparams_cam = jax.tree.map(lambda g: jax.lax.psum(g, "tile"), gparams)
        gparams_red = jax.tree.map(lambda g: jax.lax.pmean(g, "data"),
                                   gparams_cam)
        gcam_red = jax.tree.map(lambda g: jax.lax.psum(g, ("tile", "data")),
                                gcam)

        # densification stats (per camera over its tile group, then psum'd
        # over cameras like B sequential reference iterations)
        from gaussianhaircut_tpu.models.gaussian_model import GaussianAux
        vis_cam = jax.lax.pmax(vis_local.astype(jnp.float32), "tile") > 0
        radii_cam = jax.lax.pmax(radii.astype(jnp.float32), "tile")
        # gn_local / vis_cam are tile-replicated per camera; psum over "data"
        # alone sums across cameras (one contribution per camera)
        gn_local = jnp.linalg.norm(
            jnp.where(vis_cam[:, None], gparams_cam.viewspace, 0.0)[:, :2],
            axis=-1)
        gn = jax.lax.psum(gn_local, "data")
        vis_count = jax.lax.psum(vis_cam.astype(jnp.float32), "data")
        radii_max = jax.lax.pmax(jnp.where(vis_cam, radii_cam, 0.0), "data")
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

        if trainable_cameras or trainable_intrinsics:
            cam_ok = optim.grads_are_finite(gcam_red)
            do_cam = cam_ok & (state.step < opt_cfg.iterations_cam)
            clrs = cam_lrs(opt_cfg, state.model.spatial_lr_scale, state.step)
            drawn = jnp.zeros(state.cam_opt.count.shape, jnp.float32)
            drawn = drawn.at[cam_idx].set(1.0)
            drawn = jnp.minimum(jax.lax.psum(drawn, "data"), 1.0)
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
            new_cam_opt = CamAdamState(cam_res_t(**mus), cam_res_t(**nus),
                                       new_count)
            new_cam_res = cam_res_t(**ress)
        else:
            new_cam_opt, new_cam_res = state.cam_opt, state.cam_res

        new_model = state.model.replace(params=new_params, aux=new_aux)
        new_state = TrainState(new_model, new_opt, new_cam_res, new_cam_opt,
                               state.step + 1)
        metrics = {k: jax.lax.pmean(v, "data") for k, v in parts.items()}
        metrics["num_rendered"] = jax.lax.pmax(num_rendered, ("data", "tile"))
        metrics["grads_ok"] = ok
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
