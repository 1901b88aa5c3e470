"""Stage-2 training CLI (the train_latent_strands.py entry point,
reference src/train_latent_strands.py:272-309 — same flag surface;
strand-network config via the yaml-equivalent flags below)."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from gaussianhaircut_tpu import config as cfg_mod


def load_scene_scale(source_path: str) -> float:
    p = os.path.join(source_path, "scale.pickle")
    if os.path.exists(p):
        with open(p, "rb") as f:
            return float(pickle.load(f)["scale"])
    return 1.0


def main(argv=None):
    from gaussianhaircut_tpu.cli.render_gaussians import (
        find_head_ply, find_max_iteration, load_camera_residuals)
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.models.textured_strands import (
        ScalpPool, TexturedStrandsConfig, synthetic_scalp_pool)
    from gaussianhaircut_tpu.scene.dataset import load_scene
    from gaussianhaircut_tpu.train import stage2

    parser = argparse.ArgumentParser("train_latent_strands")
    cfg_mod.add_model_args(parser)
    cfg_mod.add_optim_args(parser)
    cfg_mod.add_pipeline_args(parser)
    parser.add_argument("--model_path_hair", type=str, required=True)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[-1],
                        help="accepted for stage-1-compatible invocation "
                        "(run_pipeline passes one flag set to every "
                        "trainer); stage 2 has no test-eval loop")
    parser.add_argument("--pointcloud_path_head", type=str, default="")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[20_000])
    parser.add_argument("--start_checkpoint_hair", type=str, default=None)
    parser.add_argument("--num_strands", type=int, default=10_000)
    parser.add_argument("--texture_size", type=int, default=256)
    parser.add_argument("--strand_length", type=int, default=100)
    parser.add_argument("--diffusion_input", type=int, default=32)
    parser.add_argument("--use_diffusion", action="store_true",
                        help="apply the L_diff latent-texture prior at "
                        "lambda_dsds (train_latent_strands.py:140-152)")
    parser.add_argument("--prior_checkpoint", type=str, default="",
                        help="converted upstream prior npz "
                        "(tools/convert_neuralhaircut_ckpt.py); its denoiser "
                        "section is used frozen. Implies --use_diffusion.")
    args = parser.parse_args(argv)

    model_cfg = cfg_mod.extract(cfg_mod.ModelConfig, args)
    opt_cfg = cfg_mod.extract(cfg_mod.OptimizationConfig, args)
    pipe_cfg = cfg_mod.extract(cfg_mod.PipelineConfig, args)
    use_diffusion = args.use_diffusion or bool(args.prior_checkpoint)
    scfg = TexturedStrandsConfig(num_strands=args.num_strands,
                                 texture_size=args.texture_size,
                                 strand_length=args.strand_length,
                                 diffusion_input=args.diffusion_input,
                                 sh_degree=model_cfg.sh_degree,
                                 use_diffusion=use_diffusion)

    denoiser_params = None
    prior_params = None
    if args.prior_checkpoint:
        from gaussianhaircut_tpu.models.prior_io import load_prior
        prior_params = load_prior(args.prior_checkpoint)
        denoiser_params = prior_params.get("denoiser")
        if denoiser_params is None:
            print("[warn] prior checkpoint has no denoiser section; "
                  "training a self-prior denoiser jointly")
        elif opt_cfg.hair_grad_clip > 0:
            # with a CONVERTED pretrained prior the reference's unclipped
            # dynamics (train_latent_strands.py joint backprop) are the
            # known-good baseline; the clip default exists for the
            # from-scratch path — see OptimizationConfig.hair_grad_clip
            print(f"[note] hair_grad_clip={opt_cfg.hair_grad_clip} deviates "
                  "from the reference's unclipped training; with a converted "
                  "pretrained prior you may pass --hair_grad_clip 0 for "
                  "exact reference semantics")

    scene = load_scene(model_cfg)
    iteration = find_max_iteration(model_cfg.model_path)
    head_ply = find_head_ply(model_cfg.model_path, iteration,
                             args.pointcloud_path_head)
    head_model = gm.load_ply(head_ply, 0, model_cfg.sh_degree)

    residuals = load_camera_residuals(model_cfg.model_path, iteration,
                                      scene.train_cameras) \
        if model_cfg.trainable_cameras else None

    if model_cfg.flame_mesh_dir and os.path.isdir(model_cfg.flame_mesh_dir):
        pool = ScalpPool.from_flame_dir(model_cfg.flame_mesh_dir,
                                        model_cfg.source_path, scfg)
    else:
        print("[warn] no flame_mesh_dir; using synthetic scalp pool")
        pool = synthetic_scalp_pool(scfg.pool_size)

    scene_scale = load_scene_scale(model_cfg.source_path)
    stage2.train(model_cfg, opt_cfg, scfg, pipe_cfg, scene, head_model, pool,
                 scene_scale, residuals, model_path_hair=args.model_path_hair,
                 checkpoint_iterations=tuple(args.checkpoint_iterations),
                 start_checkpoint=args.start_checkpoint_hair,
                 denoiser_params=denoiser_params, prior_params=prior_params)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
