"""Strand stack: geometry conversion, generator shapes, one stage-2/3 step."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.models.strands import strands_to_gaussians
from gaussianhaircut_tpu.models.textured_strands import (
    ScalpPool, TexturedStrandsConfig, generate_strands, init_params,
    sample_texture, synthetic_scalp_pool,
)
from gaussianhaircut_tpu.ops.quaternion import build_rotation
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic
from gaussianhaircut_tpu.train import stage2, stage3


def test_strands_to_gaussians_geometry():
    # one straight strand along +y with 4 points
    pts = jnp.asarray([[[0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 3, 0]]], jnp.float32)
    sg = strands_to_gaussians(pts, 0.01)
    assert sg.xyz.shape == (3, 3)
    np.testing.assert_allclose(sg.xyz, [[0, .5, 0], [0, 1.5, 0], [0, 2.5, 0]], atol=1e-6)
    np.testing.assert_allclose(sg.scaling[:, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(sg.scaling[:, 1:], 0.01, atol=1e-6)
    # rotation maps +x onto the segment direction (+y): rows of R are the
    # gaussian principal axes; row 0 should be the segment direction
    rotated = np.einsum("pi,pij->pj", np.tile([[1, 0, 0]], (3, 1)),
                        np.asarray(sg.rotation_matrix))
    np.testing.assert_allclose(rotated, np.tile([[0, 1, 0]], (3, 1)), atol=1e-5)


def test_sample_texture_bilinear():
    tex = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    # uv (0,0) -> corner texel; uv (1,1) -> last texel
    out = sample_texture(tex, jnp.asarray([[0.0, 0.0], [1.0, 1.0]]))
    assert float(out[0, 0]) == 0.0
    assert float(out[1, 0]) == 15.0


def test_generate_strands_shapes():
    cfg = TexturedStrandsConfig(num_strands=32, texture_size=32,
                                strand_length=16, pool_size=1000)
    pool = synthetic_scalp_pool(1000)
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = generate_strands(params, pool, cfg, jax.random.PRNGKey(1))
    assert out.points.shape == (32, 16, 3)
    assert out.z_geom.shape == (32, 64)
    assert out.z_app.shape == (32, 64)
    # strands are rooted at the scalp
    np.testing.assert_allclose(out.points[:, 0], out.p_local[:, 0] + np.asarray(
        pool.origins)[np.asarray(jax.random.choice(jax.random.PRNGKey(1),
                                                   1000, (32,), replace=False))],
        atol=1e-5)


def _toy_setup():
    res = 48
    scfg = TexturedStrandsConfig(num_strands=16, texture_size=32,
                                 strand_length=8, sh_degree=1, pool_size=500)
    pool = synthetic_scalp_pool(500)
    # frozen head: tiny stage-1 model
    rng = np.random.default_rng(0)
    pts = rng.normal(scale=0.2, size=(64, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (64, 3)).astype(np.float32)
    head_model = gm.create_from_pcd(pts, cols, 64, 1, 1.0)
    head = stage2.make_head_fields(head_model)

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0  # camera at z=-2 looking at origin (view z = z + 2)
    cam = CameraStatic(uid=0, colmap_id=0, image_name="0000", width=res,
                       height=res, colmap_transform=w2c, fovx=0.8, fovy=0.8)
    cam_batch = CameraBatch.from_cameras([cam])
    gt_image = jnp.zeros((3, res, res))
    gt_mask = jnp.ones((2, res, res)) * 0.5
    gt_oa = jnp.zeros((1, res, res))
    gt_oc = jnp.ones((1, res, res))
    raster_cfg = RasterConfig(tile_w=16, tile_h=16, chunk=32,
                              capacity_mult=32, backend="jnp")
    opt_cfg = OptimizationConfig(lambda_dorient=0.1)
    return res, scfg, pool, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc, raster_cfg, opt_cfg


def test_stage2_step_runs_and_updates():
    (res, scfg, pool, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
     raster_cfg, opt_cfg) = _toy_setup()
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    tex0 = np.asarray(state.params["texture"]).copy()
    state, metrics = stage2.train_step(
        state, head, pool, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
        jnp.asarray(0), None, jnp.asarray(1e-3),
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_cfg, white_background=False)
    assert np.isfinite(metrics["total"])
    assert int(state.step) == 1
    assert not np.allclose(np.asarray(state.params["texture"]), tex0)


def test_hair_grad_clip_bounds_update():
    """Global-norm clipping contract (optim.clip_by_global_norm): the hair
    stages clip at opt_cfg.hair_grad_clip — the defense against the measured
    iter-940 Adam spike blow-up at the reference operating point (runs/r4
    metrics.jsonl: mask loss 0.11 -> 0.67, never recovered).  The reference
    runs unclipped but optimizes a PRETRAINED decoder
    (gaussian_model_latent_strands.py:99-104); ours trains from scratch."""
    from gaussianhaircut_tpu.train import optim

    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([[12.0]])}
    clipped, gnorm = optim.clip_by_global_norm(grads, 1.0)
    assert abs(float(gnorm) - 13.0) < 1e-5
    cn = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                      for g in jax.tree.leaves(clipped)))
    assert abs(float(cn) - 1.0) < 1e-5
    # below the threshold: untouched
    same, _ = optim.clip_by_global_norm(grads, 100.0)
    np.testing.assert_allclose(np.asarray(same["a"]), np.asarray(grads["a"]))

    # wired into the stage-2 step: grad_norm surfaced, step still updates
    (res, scfg, pool, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
     raster_cfg, opt_cfg) = _toy_setup()
    assert opt_cfg.hair_grad_clip > 0          # default ON for hair stages
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    tex0 = np.asarray(state.params["texture"]).copy()
    state, metrics = stage2.train_step(
        state, head, pool, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
        jnp.asarray(0), None, jnp.asarray(1e-3),
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_cfg, white_background=False)
    assert np.isfinite(float(metrics["grad_norm"]))
    assert not np.allclose(np.asarray(state.params["texture"]), tex0)


def test_stage3_step_runs_and_updates(tmp_path):
    (res, scfg, pool, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
     raster_cfg, opt_cfg) = _toy_setup()
    hair_state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    params, static = stage3.create_from_stage2(
        hair_state.params, pool, scfg, jax.random.PRNGKey(2), num_strands=16)
    from gaussianhaircut_tpu.train.optim import adam_init
    state = stage3.CurvesTrainState(params, static, adam_init(params),
                                    jnp.zeros((), jnp.int32))
    d0 = np.asarray(params.dirs).copy()
    state, metrics = stage3.train_step(
        state, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
        jnp.asarray(0), None, jnp.asarray(1e-3),
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_cfg, white_background=False)
    assert np.isfinite(metrics["total"])
    assert not np.allclose(np.asarray(state.params.dirs), d0)

    # regression (2026-08-17 freeze): an exactly-antipodal segment
    # (dir = (-c, 0, 0), a zero parallel-transport quaternion) must not NaN
    # the gradient tree — the NaN-guard would silently skip EVERY step of
    # the fixed-strand-set stage 3
    bad = params.dirs.at[0, 0].set(jnp.asarray([-0.05, 0.0, 0.0]))
    bad_state = stage3.CurvesTrainState(
        params._replace(dirs=bad), static, adam_init(params),
        jnp.zeros((), jnp.int32))
    b0 = np.asarray(bad)
    bad_state, bmetrics = stage3.train_step(
        bad_state, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
        jnp.asarray(0), None, jnp.asarray(1e-3),
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_cfg, white_background=False)
    assert float(bmetrics["grads_finite"]) == 1.0
    assert not np.allclose(np.asarray(bad_state.params.dirs), b0)

    # checkpoint roundtrip
    stage3.save_checkpoint(state, str(tmp_path / "c/ck.npz"))
    st2 = stage3.load_checkpoint(str(tmp_path / "c/ck.npz"))
    np.testing.assert_allclose(np.asarray(st2.params.dirs),
                               np.asarray(state.params.dirs))
    pts = stage3.export_points(state)
    assert pts.shape == (16, 8, 3)
