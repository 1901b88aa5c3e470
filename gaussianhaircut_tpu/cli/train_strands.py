"""Stage-3 training CLI (the train_strands.py entry point,
reference src/train_strands.py:269-306)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from gaussianhaircut_tpu import config as cfg_mod


def main(argv=None):
    import jax

    from gaussianhaircut_tpu.cli.render_gaussians import (
        find_head_ply, find_max_iteration, load_camera_residuals)
    from gaussianhaircut_tpu.cli.train_latent_strands import load_scene_scale
    from gaussianhaircut_tpu.models import gaussian_model as gm
    from gaussianhaircut_tpu.models.textured_strands import (
        ScalpPool, TexturedStrandsConfig, synthetic_scalp_pool)
    from gaussianhaircut_tpu.scene.dataset import load_scene
    from gaussianhaircut_tpu.train import stage2, stage3

    parser = argparse.ArgumentParser("train_strands")
    cfg_mod.add_model_args(parser)
    cfg_mod.add_optim_args(parser)
    cfg_mod.add_pipeline_args(parser)
    parser.add_argument("--model_path_hair", type=str, required=True)
    parser.add_argument("--model_path_curves", type=str, required=True)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[-1],
                        help="accepted for stage-1-compatible invocation "
                        "(run_pipeline passes one flag set to every "
                        "trainer); stage 3 has no test-eval loop")
    parser.add_argument("--pointcloud_path_head", type=str, default="")
    parser.add_argument("--start_checkpoint_hair", type=str, required=True,
                        help="stage-2 checkpoint npz")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[10_000])
    parser.add_argument("--start_checkpoint_curves", type=str, default=None)
    parser.add_argument("--num_strands", type=int, default=10_000)
    parser.add_argument("--texture_size", type=int, default=256)
    parser.add_argument("--strand_length", type=int, default=100)
    parser.add_argument("--diffusion_input", type=int, default=32)
    parser.add_argument("--use_sds", action="store_true",
                        help="apply the HAAR-style SDS regularizer at "
                        "lambda_dsds (gaussian_model_strands.py:456-515)")
    parser.add_argument("--prior_checkpoint", type=str, default="",
                        help="converted upstream strand-prior npz "
                        "(tools/convert_neuralhaircut_ckpt.py). Implies "
                        "--use_sds.")
    args = parser.parse_args(argv)

    model_cfg = cfg_mod.extract(cfg_mod.ModelConfig, args)
    opt_cfg = cfg_mod.extract(cfg_mod.OptimizationConfig, args)
    pipe_cfg = cfg_mod.extract(cfg_mod.PipelineConfig, args)
    scfg = TexturedStrandsConfig(num_strands=args.num_strands,
                                 texture_size=args.texture_size,
                                 strand_length=args.strand_length,
                                 diffusion_input=args.diffusion_input,
                                 sh_degree=model_cfg.sh_degree)

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

    hair_state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    hair_state = stage2.load_checkpoint(args.start_checkpoint_hair, hair_state)

    use_sds = args.use_sds or bool(args.prior_checkpoint)
    prior = None
    if use_sds:
        from gaussianhaircut_tpu.models import prior_io
        if args.prior_checkpoint:
            prior = prior_io.load_strand_prior(args.prior_checkpoint)
            if opt_cfg.hair_grad_clip > 0 or opt_cfg.sds_grad_ratio > 0:
                # with a CONVERTED pretrained prior the reference's unclipped
                # joint SDS backprop (train_strands.py:128-147) is the
                # known-good baseline; clip/cap defaults exist for the
                # from-scratch path — see OptimizationConfig.sds_grad_ratio
                print("[note] hair_grad_clip/sds_grad_ratio deviate from the "
                      "reference's unclipped joint-SDS training; with a "
                      "converted pretrained prior pass --hair_grad_clip 0 "
                      "--sds_grad_ratio 0 for exact reference semantics")
        else:
            print("[warn] --use_sds without --prior_checkpoint: using a "
                  "fresh (untrained) prior — convert the upstream "
                  "strand_ckpt.pth for the paper's regularizer")
            prior = prior_io.init_prior(scfg, jax.random.PRNGKey(7))
        if "denoiser" not in prior:
            # fall back to the stage-2 self-prior denoiser if one was trained
            if "denoiser" in hair_state.params:
                prior["denoiser"] = hair_state.params["denoiser"]
            else:
                prior["denoiser"] = prior_io.init_prior(
                    scfg, jax.random.PRNGKey(8))["denoiser"]

    scene_scale = load_scene_scale(model_cfg.source_path)
    state = stage3.train(
        model_cfg, opt_cfg, scfg, pipe_cfg, scene, head_model,
        hair_state.params, pool, scene_scale, args.num_strands, residuals,
        model_path_curves=args.model_path_curves,
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        start_checkpoint=args.start_checkpoint_curves,
        prior=prior, use_sds=use_sds)
    print("\nTraining complete.")
    return state


if __name__ == "__main__":
    main()
