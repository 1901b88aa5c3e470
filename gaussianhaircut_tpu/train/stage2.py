"""Stage-2 trainer: latent textured strands over a frozen head
(the train_latent_strands.py equivalent, reference src/train_latent_strands.py).

Per iteration (reference :103-164): regenerate all strands from the scalp
texture + decoder, convert segments to hair Gaussians, composite with the
frozen stage-1 head Gaussians (label < 0.5 split, :67-75), render, and apply

  loss = lambda_dl1 * L1(image) + lambda_dmask * L1(hair mask)
       + lambda_dorient * OR(orient | conf, gt-conf weight, hair mask)
       + lambda_dsds * L_diff                                  (:130-152)

optimized by AdamW + cosine LR on {texture, strand decoder, color decoder}
(gaussian_model_latent_strands.py:517-522).  Cameras are frozen at their
stage-1-optimized poses (:56-65).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.config import ModelConfig, OptimizationConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.models.strand_prior import ColorDecoder
from gaussianhaircut_tpu.models.strands import strands_to_gaussians
from gaussianhaircut_tpu.models.textured_strands import (
    ScalpPool, TexturedStrandsConfig, generate_strands, init_params,
)
from gaussianhaircut_tpu.ops import losses as L
from gaussianhaircut_tpu.ops.quaternion import build_rotation
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.render.renderer import (
    GaussianFields, default_background, render_fields,
)
from gaussianhaircut_tpu.scene.cameras import CameraBatch, camera_geom
from gaussianhaircut_tpu.train import optim
from gaussianhaircut_tpu.utils.logger import MetricsLogger


class HairTrainState(NamedTuple):
    params: dict                  # texture / decoder / color_decoder pytrees
    opt: optim.AdamState
    step: jnp.ndarray
    key: jnp.ndarray
    ema: dict | None = None       # EMA copy of params["denoiser"] (self-
                                  # trained-prior path only): the frozen
                                  # regularizer that restores the reference's
                                  # texture-pulling diffusion gradient
                                  # (model_ema, gaussian_model_latent_
                                  # strands.py:501-513) once warmed up


def make_head_fields(state: gm.GaussianModelState) -> GaussianFields:
    """Frozen head split of the stage-1 model: rows with hair-label < 0.5
    (train_latent_strands.py:67-75).  Kept at full capacity with a validity
    mask (static shapes); label/dir/conf are forced to the head convention
    (gaussian_renderer/__init__.py:172-175)."""
    p = state.params
    head_valid = state.aux.alive & (gm.get_label(p)[:, 0] < 0.5)
    return GaussianFields(
        xyz=p.xyz,
        features=gm.get_features(p),
        scaling=gm.get_scaling(p),
        rotation_matrix=build_rotation(p.rotation),
        opacity=gm.get_opacity(p),
        label=jnp.zeros_like(p.label),
        orient_conf=jnp.zeros_like(p.orient_conf),
        valid=head_valid,
        viewspace=jnp.zeros_like(p.xyz),
        use_direction=jnp.zeros(p.xyz.shape[0], jnp.float32),
    )


def init_hair_state(cfg: TexturedStrandsConfig, key,
                    own_denoiser: bool = True) -> HairTrainState:
    """own_denoiser=False skips the jointly-trained denoiser params (used
    when a frozen pretrained denoiser is supplied to train())."""
    kp, kc, kd, ks = jax.random.split(key, 4)
    params = init_params(cfg, kp)
    color = ColorDecoder(sh_degree=cfg.sh_degree)
    params["color_decoder"] = color.init(
        kc, jnp.zeros((1, cfg.appearance_descriptor_size - 1)))
    if cfg.use_diffusion and own_denoiser:
        from gaussianhaircut_tpu.models.diffusion import Denoiser, DiffusionConfig
        den = Denoiser(DiffusionConfig(
            input_channels=cfg.geometry_descriptor_size,
            input_size=cfg.diffusion_input))
        params["denoiser"] = den.init(kd)
    ema = (jax.tree.map(jnp.copy, params["denoiser"])
           if "denoiser" in params else None)
    return HairTrainState(params, optim.adam_init(params),
                          jnp.zeros((), jnp.int32), ks, ema)


def warm_start(state: HairTrainState, prior_params: dict) -> HairTrainState:
    """Initialize the trainable strand decoder from a converted pretrained
    prior (tools/convert_neuralhaircut_ckpt.py output).  The decoder stays
    trainable — matching the reference, which loads decoder_checkpoint_path
    and then optimizes strands_generator jointly
    (gaussian_model_latent_strands.py:517-519).  Pytree structures must
    match exactly (same StrandDecoder topology); a mismatch is a loud error,
    not a silent partial load."""
    dec = prior_params.get("decoder")
    if dec is None:
        return state
    cur = state.params["decoder"]
    cur_td = jax.tree_util.tree_structure(cur)
    new_td = jax.tree_util.tree_structure(dec)
    if cur_td != new_td:
        raise ValueError(
            f"prior decoder pytree does not match StrandDecoder: {new_td} "
            f"vs {cur_td}")
    for a, b in zip(jax.tree_util.tree_leaves(cur),
                    jax.tree_util.tree_leaves(dec)):
        if a.shape != b.shape:
            raise ValueError(
                f"prior decoder leaf shape mismatch: {b.shape} vs {a.shape}")
    params = dict(state.params)
    params["decoder"] = jax.tree.map(jnp.asarray, dec)
    print("[stage2] warm_start: strand decoder initialized from converted "
          "pretrained prior")
    return state._replace(params=params, opt=optim.adam_init(params))


def diffusion_loss(params: dict, scfg: TexturedStrandsConfig, key,
                   diffuse_mask=None, denoiser_params=None,
                   ema_denoiser=None, ema_weight=None):
    """L_diff over the scalp latent texture resampled to the diffusion grid
    (the OptimizableTexturedStrands-internal prior term surfaced as
    self.LDiff, gaussian_model_latent_strands.py:501-504).

    With ``denoiser_params`` (a converted upstream checkpoint) the denoiser
    is frozen, matching the reference's pretrained ``model_ema``; otherwise
    it trains jointly with the texture as a self-prior, and — once warmed up
    (``ema_weight`` > 0) — a frozen EMA copy of the self-trained denoiser
    supplies the reference's texture-regularizing gradient."""
    from gaussianhaircut_tpu.models.diffusion import Denoiser, DiffusionConfig
    den = Denoiser(DiffusionConfig(
        input_channels=scfg.geometry_descriptor_size,
        input_size=scfg.diffusion_input))
    g = scfg.geometry_descriptor_size
    tex = params["texture"][:, :, :g]
    t = scfg.texture_size // scfg.diffusion_input

    def latent_of(x):
        lat = x.reshape(scfg.diffusion_input, t, scfg.diffusion_input, t, g)
        return lat.mean(axis=(1, 3))[None]             # [1, D, D, 64]

    k_noise, k_sigma = jax.random.split(key)
    sigma = den.sample_density(k_sigma, (1,))
    mask = None if diffuse_mask is None else diffuse_mask[None, :, :, None]

    if denoiser_params is not None:
        noise = jax.random.normal(k_noise, latent_of(tex).shape)
        return den.loss(denoiser_params, latent_of(tex), noise, sigma, mask)

    # SELF-trained denoiser: learn the texture's latent distribution but
    # do NOT drag the texture toward the LIVE denoiser's moving manifold — a
    # from-scratch denoiser's early loss is huge and destabilizes stage 2
    # (measured at the L=100/10k-strand operating point: lambda 0.01 *
    # L_diff spiked the total to 4.25 and instance count 2.1M -> 9.3M
    # with rising image loss).  The reference's texture-regularizing
    # gradient comes from a PRETRAINED/EMA denoiser (model_ema,
    # gaussian_model_latent_strands.py:501-513); here that pull comes from
    # the EMA copy (frozen per step, updated outside the loss), gated by a
    # warmup threshold so the early-chaos denoiser exerts no pull.
    latent_sg = latent_of(jax.lax.stop_gradient(tex))
    noise = jax.random.normal(k_noise, latent_sg.shape)
    l_train = den.loss(params["denoiser"], latent_sg, noise, sigma, mask)
    if ema_denoiser is None or ema_weight is None:
        return l_train
    ema_frozen = jax.lax.stop_gradient(ema_denoiser)
    l_reg = den.loss(ema_frozen, latent_of(tex), noise, sigma, mask)
    # the stop_gradient keeps l_reg's VALUE out of the denoiser-training
    # signal double-count; only its texture gradient (scaled) is added
    return l_train + ema_weight * (l_reg - jax.lax.stop_gradient(l_reg))


def hair_fields_from_strands(params: dict, pool: ScalpPool,
                             scfg: TexturedStrandsConfig, key,
                             radius_scale) -> tuple[GaussianFields, dict]:
    """Strand generation -> segment-Gaussian fields
    (gaussian_model_latent_strands.py:442-504)."""
    strands = generate_strands(params, pool, scfg, key)
    sg = strands_to_gaussians(strands.points, radius_scale)

    n, s = strands.points.shape[0], strands.points.shape[1] - 1
    k = (scfg.sh_degree + 1) ** 2
    color = ColorDecoder(sh_degree=scfg.sh_degree)
    out = color.apply(params["color_decoder"], strands.z_app)  # [N, 3k+1]
    f_dc = out[:, :3].reshape(n, 1, 1, 3)
    f_rest = out[:, 3:3 * k].reshape(n, 1, k - 1, 3)
    oconf = out[:, 3 * k:].reshape(n, 1, 1)
    features = jnp.concatenate([
        jnp.broadcast_to(f_dc, (n, s, 1, 3)).reshape(n * s, 1, 3),
        jnp.broadcast_to(f_rest, (n, s, k - 1, 3)).reshape(n * s, k - 1, 3),
    ], axis=1)
    # clamped exp: see models/gaussian_model.get_orient_conf
    orient_conf = jnp.exp(jnp.clip(
        jnp.broadcast_to(oconf, (n, s, 1)).reshape(n * s, 1), -30.0, 30.0))

    ones = jnp.ones((n * s, 1), jnp.float32)
    fields = GaussianFields(
        xyz=sg.xyz,
        features=features,
        scaling=sg.scaling,
        rotation_matrix=sg.rotation_matrix,
        opacity=ones,
        label=ones,
        orient_conf=orient_conf,
        valid=jnp.ones(n * s, bool),
        viewspace=jnp.zeros((n * s, 3), jnp.float32),
        use_direction=jnp.ones(n * s, jnp.float32),
    )
    return fields, {"strands": strands}


def concat_fields(head: GaussianFields, hair: GaussianFields) -> GaussianFields:
    return GaussianFields(*[
        jnp.concatenate([getattr(head, f), getattr(hair, f)], axis=0)
        for f in GaussianFields._fields])


def stage2_losses(out, gt_image, gt_mask, gt_orient_angle, gt_orient_conf,
                  l_diff, opt_cfg: OptimizationConfig):
    """train_latent_strands.py:130-152."""
    lce = L.l1_loss(out["mask"][:1], gt_mask[:1])
    ll1 = L.l1_loss(out["render"], gt_image)
    orient_weight = jnp.ones_like(gt_mask[:1])
    if opt_cfg.use_gt_orient_conf:
        orient_weight = orient_weight * gt_orient_conf
    confs = out["orient_conf"] if opt_cfg.train_orient_conf else None
    lor = L.or_loss(out["orient_angle"], gt_orient_angle, confs=confs,
                    weight=orient_weight, mask=gt_mask[:1])
    z = jnp.zeros(())
    ll1 = jnp.where(jnp.isnan(ll1), z, ll1)
    lce = jnp.where(jnp.isnan(lce), z, lce)
    lor = jnp.where(jnp.isnan(lor), z, lor)
    ldf = jnp.where(jnp.isnan(l_diff), z, l_diff)
    total = (ll1 * opt_cfg.lambda_dl1 + lce * opt_cfg.lambda_dmask
             + lor * opt_cfg.lambda_dorient + ldf * opt_cfg.lambda_dsds)
    return total, {"l1": ll1, "mask": lce, "orient": lor, "sds": ldf,
                   "total": total}


@functools.partial(
    jax.jit,
    static_argnames=("scfg", "width", "height", "raster_cfg", "opt_cfg",
                     "white_background", "base_lr", "total_iters"))
def train_step(state: HairTrainState, head: GaussianFields, pool: ScalpPool,
               cam_batch: CameraBatch, gt_image, gt_mask, gt_orient_angle,
               gt_orient_conf, cam_idx, cam_residuals, radius_scale,
               denoiser_params=None, diffuse_mask=None, *,
               scfg: TexturedStrandsConfig, width: int, height: int,
               raster_cfg: RasterConfig, opt_cfg: OptimizationConfig,
               white_background: bool, base_lr: float = 1e-3,
               total_iters: int = 20000):
    bg = default_background(white_background)
    # independent streams for strand-root sampling and diffusion noise/sigma
    # (a shared key would correlate strand selection with the noise draw)
    key, k_strand, k_diff = jax.random.split(state.key, 3)

    cam = camera_geom(cam_batch.colmap_transform[cam_idx],
                      cam_batch.fovx[cam_idx], cam_batch.fovy[cam_idx],
                      width, height, cam_residuals, cam_idx)

    # EMA texture-pull activates after warmup (self-trained-prior path)
    ema_w = None
    if state.ema is not None and opt_cfg.diffusion_ema_warmup > 0:
        ema_w = (state.step >= opt_cfg.diffusion_ema_warmup).astype(
            jnp.float32)

    def loss_fn(params):
        hair, aux = hair_fields_from_strands(params, pool, scfg, k_strand,
                                             radius_scale)
        fields = concat_fields(head, hair)
        out = render_fields(fields, scfg.sh_degree, cam, bg, raster_cfg)
        l_diff = (diffusion_loss(params, scfg, k_diff, diffuse_mask,
                                 denoiser_params, state.ema, ema_w)
                  if scfg.use_diffusion else jnp.zeros(()))
        total, parts = stage2_losses(out, gt_image, gt_mask, gt_orient_angle,
                                     gt_orient_conf, l_diff, opt_cfg)
        # surface the instance count so long runs can detect a silently
        # truncating (overflowed) static buffer from the metrics stream
        parts["num_rendered"] = out["num_rendered"].astype(jnp.float32)
        return total, parts

    (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    ok = optim.grads_are_finite(grads)
    if opt_cfg.hair_grad_clip > 0:
        grads, gnorm = optim.clip_by_global_norm(grads, opt_cfg.hair_grad_clip)
        parts["grad_norm"] = gnorm
    # cosine LR (CosineAnnealingLR(T_max=iters, eta_min=1e-4),
    # gaussian_model_latent_strands.py:519)
    t = state.step.astype(jnp.float32)
    lr = 1e-4 + 0.5 * (base_lr - 1e-4) * (1 + jnp.cos(jnp.pi * t / total_iters))
    updates, new_opt = optim.adamw_update(grads, state.opt, state.params, lr)
    # jnp.where, NOT keep * u (0 * NaN = NaN would destroy the params)
    new_params = jax.tree.map(lambda p, u: p + jnp.where(ok, u, 0.0),
                              state.params, updates)
    new_opt = jax.lax.cond(ok, lambda: new_opt, lambda: state.opt)
    new_ema = state.ema
    if state.ema is not None:
        d = opt_cfg.diffusion_ema_decay
        new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                               state.ema, new_params["denoiser"])
    return (HairTrainState(new_params, new_opt, state.step + 1, key, new_ema),
            dict(parts))


def train(model_cfg, opt_cfg, scfg: TexturedStrandsConfig, pipe_cfg, scene,
          head_model: gm.GaussianModelState, pool: ScalpPool, scene_scale,
          cam_residuals=None, *, model_path_hair: str = "",
          checkpoint_iterations=(20000,), start_checkpoint=None,
          denoiser_params=None, diffuse_mask=None,
          prior_params=None, progress_callback=None) -> HairTrainState:
    """Host loop (train_latent_strands.py:87-181).

    denoiser_params: frozen pretrained diffusion denoiser (converted upstream
    weights); None trains a self-prior denoiser jointly when
    scfg.use_diffusion.
    prior_params: converted strand-prior pytrees (prior_io.load_prior); a
    "decoder" section WARM-STARTS the trainable strand decoder — the
    reference's decoder_checkpoint_path semantics (hair_strands_textured.yaml
    via gaussian_model_latent_strands.py: pretrained decoder, then trained
    jointly with the texture by AdamW, :517-519)."""
    import random

    cams = scene.train_cameras
    width, height = cams[0].width, cams[0].height
    cam_batch = CameraBatch.from_cameras(cams)
    from gaussianhaircut_tpu.train.stage1 import GtBatch
    gt = GtBatch.from_cameras(cams)
    head = make_head_fields(head_model)

    state = init_hair_state(scfg, jax.random.PRNGKey(0),
                            own_denoiser=denoiser_params is None)
    if prior_params is not None:
        state = warm_start(state, prior_params)
    if start_checkpoint:
        state = load_checkpoint(start_checkpoint, state)

    raster_cfg = RasterConfig(tile_w=pipe_cfg.tile, tile_h=pipe_cfg.tile,
                              capacity_mult=pipe_cfg.instance_capacity_mult,
                              backend=pipe_cfg.raster_backend)
    radius_scale = jnp.asarray(model_cfg.strand_scale * float(scene_scale),
                               jnp.float32)
    logger = MetricsLogger(model_path_hair) if model_path_hair else None
    rng = random.Random(0)
    stack = []
    # static-capacity health (stage-1's arena-resize analog): the strand
    # count is fixed, but the per-camera instance footprint varies with view
    # and with the decoder's geometry.  GROW on overflow (correctness: the
    # CUDA arena never drops instances); SHRINK once after warmup when the
    # running max shows large headroom (binning/sort cost scales with
    # capacity — a 2x oversized buffer is a ~2x slower sort).
    import dataclasses as _dc
    import math as _math
    n_fit = head.xyz.shape[0] + scfg.num_strands * (scfg.strand_length - 1)
    instance_cap = raster_cfg.instance_capacity(n_fit)
    nr_max = 0.0
    shrunk = False
    for iteration in range(int(state.step) + 1, opt_cfg.iterations + 1):
        if not stack:
            stack = list(range(len(cams)))
            rng.shuffle(stack)
        cam_idx = stack.pop(rng.randrange(len(stack)))
        state, metrics = train_step(
            state, head, pool, cam_batch, gt.image[cam_idx], gt.mask[cam_idx],
            gt.orient_angle[cam_idx], gt.orient_conf[cam_idx],
            jnp.asarray(cam_idx), cam_residuals, radius_scale,
            denoiser_params, diffuse_mask,
            scfg=scfg, width=width, height=height, raster_cfg=raster_cfg,
            opt_cfg=opt_cfg, white_background=model_cfg.white_background,
            total_iters=opt_cfg.iterations)
        if iteration % 100 == 0:
            nr = float(metrics["num_rendered"])
            nr_max = max(nr_max, nr)
            occ = nr / instance_cap
            if occ > 1.0:
                new_mult = max(raster_cfg.capacity_mult + 1,
                               _math.ceil(raster_cfg.capacity_mult * occ * 1.25))
                print(f"\n[s2 iter {iteration}] instance buffer overflow "
                      f"({int(nr)} > {instance_cap}): growing capacity_mult "
                      f"{raster_cfg.capacity_mult} -> {new_mult}", flush=True)
                raster_cfg = _dc.replace(raster_cfg, capacity_mult=new_mult)
                instance_cap = raster_cfg.instance_capacity(n_fit)
            elif (not shrunk and iteration >= 500
                  and nr_max < 0.45 * instance_cap):
                # generous margin: the student's footprint can grow ~2.3x
                # past early renders (NOTES_ROUND4 capacity lesson)
                new_mult = max(1, _math.ceil(
                    raster_cfg.capacity_mult * (nr_max / instance_cap) * 1.8))
                if new_mult < raster_cfg.capacity_mult:
                    print(f"\n[s2 iter {iteration}] right-sizing capacity_mult "
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
        if iteration in checkpoint_iterations and model_path_hair:
            save_checkpoint(state, os.path.join(model_path_hair, "checkpoints",
                                                f"{iteration}.npz"))
    if logger:
        logger.close()
    return state


def _flat_with_paths(tree, prefix: str) -> dict:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "".join(
            f"/{p.key}" if hasattr(p, "key") else f"/{p.idx}" for p in path)
        out[key] = leaf
    return out


def save_checkpoint(state: HairTrainState, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {}
    for tree, pre in ((state.params, "params"), (state.opt.mu, "mu"),
                      (state.opt.nu, "nu")):
        blob.update({k: np.asarray(v)
                     for k, v in _flat_with_paths(tree, pre).items()})
    if state.ema is not None:
        blob.update({k: np.asarray(v)
                     for k, v in _flat_with_paths(state.ema, "ema").items()})
    blob["opt_count"] = np.asarray(state.opt.count)
    blob["step"] = np.asarray(state.step)
    blob["key"] = np.asarray(state.key)
    np.savez(path, **blob)


def load_checkpoint(path: str, template: HairTrainState) -> HairTrainState:
    """Path-keyed load: sections present in the checkpoint but not the
    template (e.g. a jointly-trained denoiser when the template runs a frozen
    one) are ignored; template-only sections keep their init values."""
    d = dict(np.load(path))

    def fill(tree, prefix):
        flat = _flat_with_paths(tree, prefix)
        missing = [k for k in flat if k not in d]
        if missing:
            print(f"[warn] checkpoint {path} lacks {len(missing)} leaves "
                  f"(e.g. {missing[0]}); keeping init values")
        leaves = [jnp.asarray(d[k]) if k in d else v for k, v in flat.items()]
        treedef = jax.tree_util.tree_structure(tree)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    if "leaf_0" in d:  # legacy positional layout
        flat, treedef = jax.tree_util.tree_flatten(
            (template.params, template.opt.mu, template.opt.nu))
        leaves = [jnp.asarray(d[f"leaf_{i}"]) for i in range(len(flat))]
        params, mu, nu = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        params = fill(template.params, "params")
        mu = fill(template.opt.mu, "mu")
        nu = fill(template.opt.nu, "nu")
    ema = template.ema
    if ema is not None:
        if any(k.startswith("ema/") for k in d):
            ema = fill(ema, "ema")
        elif "denoiser" in params:
            # pre-EMA checkpoint: seed the EMA from the loaded denoiser
            ema = jax.tree.map(jnp.copy, params["denoiser"])
    return HairTrainState(params,
                          optim.AdamState(mu, nu, jnp.asarray(d["opt_count"])),
                          jnp.asarray(d["step"]), jnp.asarray(d["key"]), ema)
