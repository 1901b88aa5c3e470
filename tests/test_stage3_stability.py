"""Stage-3 stability regression (round-4 root cause, NOTES_ROUND4 session 3,
tools/s3_lr_probe.py): cumsum-dirs refinement moves strand TIPS by up to
(L-1) x lr per Adam step, so at the reference operating point (L=100,
train_strands.py:87-180 / gaussian_model_strands.py:578-594) the camera-
extent spatial_lr_scale heuristic alone lands at lr/segment ~0.12 and
measurably DIVERGES.  stage3.stable_spatial_lr_scale bounds lr/segment at
0.012; stage3.train(spatial_lr_scale="auto") applies it.

The integration test runs refinement at L=100 on a scene whose camera extent
makes the UNBOUNDED heuristic unstable: if the bound is ever removed (auto
reverts to extent), the run degrades chamfer/PSNR and this test goes red —
the encoded form of the r4 failure mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianhaircut_tpu.config import (ModelConfig, OptimizationConfig,
                                        PipelineConfig)
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.models.textured_strands import (
    TexturedStrandsConfig, synthetic_scalp_pool)
from gaussianhaircut_tpu.ops.chamfer import chamfer_distance
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.render.renderer import default_background, render_fields
from gaussianhaircut_tpu.scene.cameras import CameraStatic, camera_geom
from gaussianhaircut_tpu.train import optim, stage2, stage3


def test_stable_spatial_lr_scale_binds_at_reference_operating_point():
    """The r4 failure configuration (L=100: segments ~8e-4, camera extent
    0.61) must be bounded to lr/segment = 0.012, NOT the extent heuristic's
    ~0.12."""
    opt_cfg = OptimizationConfig()
    seg, extent = 8e-4, 0.61
    s = stage3.stable_spatial_lr_scale(opt_cfg, seg, extent)
    ratio = opt_cfg.position_lr_init * s / seg
    assert ratio == pytest.approx(0.012, rel=1e-6)
    assert s < extent / 5, f"bound did not bind: {s} vs extent {extent}"
    # a scene whose extent heuristic is already stable is left alone
    s2 = stage3.stable_spatial_lr_scale(opt_cfg, seg=1.0, cameras_extent=0.5)
    assert s2 == 0.5


def _strand_scene(tmp_path, n_strands=160, length=100, res=64, views=4):
    rng = np.random.default_rng(0)
    scfg = TexturedStrandsConfig(num_strands=n_strands, texture_size=32,
                                 strand_length=length, sh_degree=1,
                                 pool_size=2000)
    pool = synthetic_scalp_pool(2000)
    hair_state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))

    # teacher curves (frozen origins shared with the student)
    params_t, static = stage3.create_from_stage2(
        hair_state.params, pool, scfg, jax.random.PRNGKey(1), n_strands)

    pts = rng.normal(scale=0.2, size=(48, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (48, 3)).astype(np.float32)
    head_model = gm.create_from_pcd(pts, cols, 48, 1, 1.0)
    head = stage2.make_head_fields(head_model)

    import math
    cams = []
    fov = 0.8
    for i in range(views):
        a = 2 * math.pi * i / views
        center = np.array([2.0 * math.sin(a), 0.2, 2.0 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        w2c[:3, 3] = -w2c[:3, :3] @ center
        cams.append(CameraStatic(uid=i, colmap_id=i, image_name=f"{i:04d}",
                                 width=res, height=res, colmap_transform=w2c,
                                 fovx=fov, fovy=fov))

    raster_cfg = RasterConfig(tile_w=16, tile_h=16, chunk=64,
                              capacity_mult=16, backend="jnp")
    radius_scale = jnp.asarray(6e-4, jnp.float32)
    bg = default_background(False)
    fields_t = stage2.concat_fields(
        head, stage3.curves_fields(params_t, static, scfg, radius_scale))

    @jax.jit
    def render_gt(colmap_t, fovx, fovy):
        cam = camera_geom(colmap_t, fovx, fovy, res, res, None)
        out = render_fields(fields_t, scfg.sh_degree, cam, bg, raster_cfg)
        return (jnp.clip(out["render"], 0, 1), jnp.clip(out["mask"], 0, 1),
                jnp.clip(out["orient_angle"], 0, 1))

    for c in cams:
        img, mask, angle = jax.device_get(render_gt(
            jnp.asarray(c.colmap_transform), jnp.asarray(c.fovx),
            jnp.asarray(c.fovy)))
        c.image = np.asarray(img)
        c.mask_hair = np.asarray(mask[:1])
        c.mask_body = np.asarray(mask[1:2])
        c.orient_angle = np.asarray(angle)
        c.orient_conf = np.ones((1, res, res), np.float32)

    class Scene:
        train_cameras = cams
        test_cameras = []
        cameras_extent = 2.2   # the UNSTABLE heuristic: lr/segment ~0.4 here

    # student: teacher dirs perturbed by ~20% of a segment length
    seg = float(jnp.linalg.norm(params_t.dirs, axis=-1).mean())
    noise = rng.normal(scale=0.2 * seg,
                       size=params_t.dirs.shape).astype(np.float32)
    params_s = params_t._replace(dirs=params_t.dirs + noise)
    state_s = stage3.CurvesTrainState(params_s, static,
                                      optim.adam_init(params_s),
                                      jnp.zeros((), jnp.int32))
    ckpt = str(tmp_path / "s3_start.npz")
    stage3.save_checkpoint(state_s, ckpt)
    return (scfg, pool, hair_state, head_model, Scene, params_t, static,
            ckpt, seg)


@pytest.mark.slow
def test_stage3_auto_lr_refines_without_drift(tmp_path):
    """300 refinement iters at L=100 from a perturbed start with
    spatial_lr_scale="auto" must IMPROVE chamfer to the teacher (and must
    not drift it >5% above the initial value) and must not increase the
    image loss.  With the stability bound removed (auto = camera extent,
    lr/segment ~0.4) this same run drifts chamfer by >2x — red."""
    (scfg, pool, hair_state, head_model, Scene, params_t, static, ckpt,
     seg) = _strand_scene(tmp_path)

    t_pts = np.asarray(stage3.curves_points(params_t, static)).reshape(-1, 3)

    def chamfer(state):
        p = np.asarray(stage3.curves_points(state.params,
                                            state.static)).reshape(-1, 3)
        return float(chamfer_distance(jnp.asarray(p), jnp.asarray(t_pts)))

    state0 = stage3.load_checkpoint(ckpt)
    cham0 = chamfer(state0)

    model_cfg = ModelConfig()
    opt_cfg = OptimizationConfig(iterations=300, lambda_dmask=0.1,
                                 lambda_dorient=0.1, lambda_dssim=0.2,
                                 train_orient_conf=False)
    pipe_cfg = PipelineConfig(raster_backend="jnp", tile=16,
                              instance_capacity_mult=16)

    l1s = []
    state = stage3.train(
        model_cfg, opt_cfg, scfg, pipe_cfg, Scene, head_model,
        hair_state.params, pool, scene_scale=6e-4 / model_cfg.strand_scale,
        num_strands=scfg.num_strands, cam_residuals=None,
        start_checkpoint=ckpt, use_sds=False,
        progress_callback=lambda it, st, m: l1s.append(float(m["l1"])))

    # the auto bound must have been applied: per-step tip motion bounded
    chamN = chamfer(state)
    assert chamN <= 1.05 * cham0, \
        f"chamfer drifted: {cham0:.3e} -> {chamN:.3e}"
    assert chamN < cham0, \
        f"refinement did not improve chamfer: {cham0:.3e} -> {chamN:.3e}"
    first = float(np.mean(l1s[:20]))
    last = float(np.mean(l1s[-20:]))
    assert last <= first, f"image l1 degraded: {first:.5f} -> {last:.5f}"
