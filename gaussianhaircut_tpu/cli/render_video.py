"""Novel-view video export (the render_video.py role, reference
src/postprocessing/render_video.py): interpolate a smooth camera path through
the optimized cameras, render the reconstruction along it, write the video,
and export the Blender hand-off bundle for offline Cycles strand rendering."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from gaussianhaircut_tpu import config as cfg_mod
    from gaussianhaircut_tpu.cli.render_gaussians import find_max_iteration, \
        load_camera_residuals
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.postprocessing.video import (
        export_blender_inputs, interpolate_camera_path, write_video)
    from gaussianhaircut_tpu.render.renderer import default_background, render
    from gaussianhaircut_tpu.scene.cameras import CameraBatch, camera_geom
    from gaussianhaircut_tpu.scene.dataset import load_scene, fov2focal
    from gaussianhaircut_tpu.utils.image import save_image

    parser = argparse.ArgumentParser("render_video")
    cfg_mod.add_model_args(parser)
    cfg_mod.add_pipeline_args(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--num_frames", default=150, type=int)
    parser.add_argument("--fps", default=30, type=int)
    parser.add_argument("--strands_pkl", default="", type=str)
    args = parser.parse_args(argv)

    model_cfg = cfg_mod.extract(cfg_mod.ModelConfig, args)
    pipe_cfg = cfg_mod.extract(cfg_mod.PipelineConfig, args)
    iteration = args.iteration if args.iteration != -1 else \
        find_max_iteration(model_cfg.model_path)

    scene = load_scene(model_cfg, load_gt=False)
    cams = scene.train_cameras
    state = gm.load_ply(os.path.join(
        model_cfg.model_path, "point_cloud", f"iteration_{iteration}",
        "raw_point_cloud.ply"), 0, model_cfg.sh_degree)

    # smooth path through every Nth optimized camera
    keys = list(range(0, len(cams), max(1, len(cams) // 12)))
    rots = np.stack([cams[i].colmap_transform[:3, :3] for i in keys])
    trans = np.stack([cams[i].colmap_transform[:3, 3] for i in keys])
    samples = np.linspace(0, len(keys) - 1, args.num_frames)
    r_path, t_path = interpolate_camera_path(rots, trans, np.arange(len(keys)),
                                             samples)
    width, height = cams[0].width, cams[0].height
    fovx, fovy = cams[0].fovx, cams[0].fovy
    raster_cfg = RasterConfig(tile_w=pipe_cfg.tile, tile_h=pipe_cfg.tile,
                              capacity_mult=pipe_cfg.instance_capacity_mult,
                              backend=pipe_cfg.raster_backend)
    bg = default_background(model_cfg.white_background)

    frames_dir = os.path.join(model_cfg.model_path, "video_frames")
    os.makedirs(frames_dir, exist_ok=True)

    # model state is a jit ARGUMENT (large closure constants render empty
    # through the axon TPU backend — NOTES_ROUND2.md)
    @jax.jit
    def render_one(params, alive, w2c):
        geom = camera_geom(w2c, jnp.asarray(fovx), jnp.asarray(fovy),
                           width, height, None)
        return render(params, alive, state.max_sh_degree,
                      geom, bg, raster_cfg)["render"]

    blender_cams = {}
    for i in range(args.num_frames):
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = r_path[i]
        w2c[:3, 3] = t_path[i]
        img = np.asarray(render_one(state.params, state.aux.alive,
                                    jnp.asarray(w2c)))
        save_image(img[:3], os.path.join(frames_dir, f"{i:06d}.png"))
        blender_cams[f"{i:06d}"] = {
            "Rt": w2c, "width": width, "height": height,
            "fx": fov2focal(fovx, width), "fy": fov2focal(fovy, height)}

    write_video(frames_dir, os.path.join(model_cfg.model_path, "video.mp4"),
                args.fps)
    if args.strands_pkl:
        export_blender_inputs(
            os.path.join(model_cfg.model_path, "blender_inputs"),
            blender_cams, args.strands_pkl,
            os.path.join(model_cfg.model_path, "point_cloud",
                         f"iteration_{iteration}", "point_cloud.ply"))


if __name__ == "__main__":
    main()
