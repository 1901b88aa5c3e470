"""End-to-end stage-1 smoke fit on a synthetic toy scene (the BASELINE.json
"tiny multi-view toy scene" config, on CPU): loss must drop substantially and
the machinery (densify, opacity reset, camera residuals, PLY export) must run.
"""
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianhaircut_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.render.renderer import default_background, render
from gaussianhaircut_tpu.scene.cameras import CameraStatic, CameraBatch, camera_geom
from gaussianhaircut_tpu.scene.dataset import SceneData
from gaussianhaircut_tpu.train import stage1


def make_toy_scene(n_views=6, res=64, n_pts=300, seed=0):
    """Cameras on a ring looking at the origin; a colored point blob as GT
    geometry.  GT images rendered with the model itself from slightly jittered
    parameters would be circular — instead render GT from a *known* Gaussian
    set, then fit a fresh model to those images."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=0.3, size=(n_pts, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, size=(n_pts, 3)).astype(np.float32)

    cams = []
    fov = math.radians(50)
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        center = np.array([2.5 * math.sin(a), 0.3, 2.5 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R_w2c = np.stack([right, upv, fwd], axis=0)  # rows
        t = -R_w2c @ center
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R_w2c
        w2c[:3, 3] = t
        cam = CameraStatic(uid=i, colmap_id=i, image_name=f"{i:04d}",
                           width=res, height=res, colmap_transform=w2c,
                           fovx=fov, fovy=fov)
        cams.append(cam)
    return cams, pts, cols


def render_gt_images(cams, pts, cols, res):
    """Render ground-truth with a fixed (non-fitted) Gaussian set."""
    cap = pts.shape[0]
    state = gm.create_from_pcd(pts, cols, cap, 0, 1.0)
    cfg = RasterConfig(tile_w=16, tile_h=16, chunk=32, capacity_mult=16,
                       backend="jnp")
    bg = default_background(False)
    cam_batch = CameraBatch.from_cameras(cams)
    outs = []
    for i, cam in enumerate(cams):
        geom = camera_geom(cam_batch.colmap_transform[i], cam_batch.fovx[i],
                           cam_batch.fovy[i], res, res, None)
        out = render(state.params, state.aux.alive, 0, geom, bg, cfg)
        outs.append(out)
    return outs


@pytest.mark.slow
def test_stage1_toy_fit(tmp_path):
    res = 64
    cams, pts, cols = make_toy_scene(res=res)
    gt_outs = render_gt_images(cams, pts, cols, res)
    for cam, out in zip(cams, gt_outs):
        cam.image = np.asarray(out["render"])
        cam.mask_hair = np.asarray(out["mask"][:1])
        cam.mask_body = np.clip(np.asarray(out["mask"][1:]), 0, 1)
        cam.orient_angle = np.asarray(out["orient_angle"])
        cam.orient_conf = np.ones_like(cam.orient_angle)

    # perturbed init: GT points + noise
    rng = np.random.default_rng(1)
    init_pts = pts + rng.normal(scale=0.05, size=pts.shape).astype(np.float32)
    scene = SceneData(train_cameras=cams, test_cameras=[], points=init_pts,
                      colors=np.full_like(cols, 0.5), cameras_extent=2.75)

    model_cfg = ModelConfig(sh_degree=1, model_path=str(tmp_path / "out"),
                            trainable_cameras=True, trainable_intrinsics=True)
    opt_cfg = OptimizationConfig(iterations=120, densify_from_iter=30,
                                 densify_until_iter=100,
                                 densification_interval=40,
                                 opacity_reset_interval=1000,
                                 lambda_dorient=0.1)
    pipe_cfg = PipelineConfig(raster_backend="jnp", tile=16,
                              gaussian_capacity=1024,
                              instance_capacity_mult=16)

    history = []
    state = stage1.train(
        model_cfg, opt_cfg, pipe_cfg, scene,
        test_iterations=(), save_iterations=(120,), checkpoint_iterations=(120,),
        progress_callback=lambda it, st, m: history.append(float(m["total"])))

    first = np.mean(history[:10])
    last = np.mean(history[-10:])
    assert last < 0.7 * first, f"loss did not decrease: {first} -> {last}"
    assert int(state.model.num_alive()) >= 300  # densification grew or kept points
    # artifacts written
    assert os.path.exists(tmp_path / "out/point_cloud/iteration_120/point_cloud.ply")
    assert os.path.exists(tmp_path / "out/checkpoints/120.npz")
    assert os.path.exists(tmp_path / "out/cameras/120.pkl")

    # checkpoint round-trips
    st2 = stage1.load_checkpoint(str(tmp_path / "out/checkpoints/120.npz"))
    assert int(st2.step) == 120
    np.testing.assert_allclose(np.asarray(st2.model.params.xyz),
                               np.asarray(state.model.params.xyz))

    # PLY round-trips through the reference field layout
    loaded = gm.load_ply(str(tmp_path / "out/point_cloud/iteration_120/raw_point_cloud.ply"),
                         2048, 1)
    n_alive = int(state.model.num_alive())
    assert int(loaded.num_alive()) == n_alive


def test_overflow_auto_recovery(tmp_path):
    """When binning overflows the static instance capacity, the trainer grows
    capacity_mult and re-specializes (the CUDA dynamic-arena analog,
    rasterize_points.cu:27-33)."""
    import io
    from contextlib import redirect_stdout

    import jax.numpy as jnp

    from gaussianhaircut_tpu.config import (ModelConfig, OptimizationConfig,
                                            PipelineConfig)
    from gaussianhaircut_tpu.train import stage1 as s1

    res = 48
    cams, pts, cols = make_toy_scene(n_views=3, res=res, n_pts=400)
    gt_outs = render_gt_images(cams, pts, cols, res)
    for cam, out in zip(cams, gt_outs):
        cam.image = np.asarray(out["render"])
        cam.mask_hair = np.asarray(out["mask"][:1])
        cam.mask_body = np.clip(np.asarray(out["mask"][1:]), 0, 1)
        cam.orient_angle = np.asarray(out["orient_angle"])
        cam.orient_conf = np.ones_like(cam.orient_angle)

    class scene:
        train_cameras = cams
        test_cameras = []
        points = pts
        colors = cols
        cameras_extent = 1.0

    model_cfg = ModelConfig()
    model_cfg.model_path = ""
    model_cfg.trainable_cameras = False
    model_cfg.trainable_intrinsics = False
    opt_cfg = OptimizationConfig(iterations=100, lambda_dorient=0.1,
                                 densify_until_iter=0)
    pipe_cfg = PipelineConfig()
    pipe_cfg.gaussian_capacity = 512
    pipe_cfg.raster_backend = "jnp"
    pipe_cfg.tile = 16
    pipe_cfg.instance_capacity_mult = 1   # deliberately too small

    buf = io.StringIO()
    with redirect_stdout(buf):
        state = s1.train(model_cfg, opt_cfg, pipe_cfg, scene,
                         test_iterations=(), save_iterations=(),
                         checkpoint_iterations=())
    out = buf.getvalue()
    assert "instance buffer overflow" in out
    assert "growing instance_capacity_mult" in out
    assert bool(jnp.isfinite(state.model.params.xyz).all())


def test_logger_images_and_histograms(tmp_path):
    """The observability surface (train_gaussians.py:264-293): image grids
    land as PNGs, histograms land in the JSONL with quantile summaries."""
    import json as _json

    from gaussianhaircut_tpu.utils.logger import MetricsLogger

    lg = MetricsLogger(str(tmp_path))
    img = np.random.default_rng(0).uniform(size=(3, 8, 8)).astype(np.float32)
    lg.images(5, **{"test_view_0/render": img,
                    "test_view_0/render_mask": img[:2]})
    lg.histogram(5, "scene/opacity_histogram", np.linspace(0, 1, 100))
    lg.close()
    pngs = sorted((tmp_path / "images").glob("*.png"))
    assert len(pngs) == 2, pngs
    recs = [_json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    hist = [r for r in recs if r.get("histogram")]
    assert hist and hist[0]["count"] == 100
    assert abs(hist[0]["quantiles"][3] - 0.5) < 0.02


def test_train_loop_logs_images(tmp_path):
    """A tiny train() with a model_path + test iteration writes render PNGs
    and histogram records."""
    from gaussianhaircut_tpu.config import (ModelConfig, OptimizationConfig,
                                            PipelineConfig)
    from gaussianhaircut_tpu.scene.dataset import SceneData

    res = 64
    cams, pts, cols = make_toy_scene(n_views=3, res=res, n_pts=100)
    for cam, out in zip(cams, render_gt_images(cams, pts, cols, res)):
        cam.image = np.asarray(out["render"])
        cam.mask_hair = np.asarray(out["mask"][:1])
        cam.mask_body = np.clip(np.asarray(out["mask"][1:]), 0, 1)
        cam.orient_angle = np.asarray(out["orient_angle"])
        cam.orient_conf = np.ones_like(cam.orient_angle)
    scene = SceneData(train_cameras=cams, test_cameras=[], points=pts,
                      colors=np.full_like(cols, 0.5), cameras_extent=2.75)
    mp = str(tmp_path / "model")
    model_cfg = ModelConfig(sh_degree=1, model_path=mp)
    opt_cfg = OptimizationConfig(iterations=3, densify_from_iter=100,
                                 densify_until_iter=0, lambda_dorient=0.1)
    pipe_cfg = PipelineConfig(raster_backend="jnp", tile=16,
                              instance_capacity_mult=24, gaussian_capacity=256)
    stage1.train(model_cfg, opt_cfg, pipe_cfg, scene,
                 test_iterations=(2,), save_iterations=(),
                 checkpoint_iterations=())
    import pathlib
    pngs = list(pathlib.Path(mp, "images").glob("train_view_*render_*.png"))
    assert pngs, "render image grids must be written at test iterations"
    recs = pathlib.Path(mp, "metrics.jsonl").read_text()
    assert "opacity_histogram" in recs and "label_histogram" in recs
