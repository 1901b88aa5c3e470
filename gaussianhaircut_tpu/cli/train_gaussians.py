"""Stage-1 training CLI (the train_gaussians.py entry point,
reference src/train_gaussians.py:295-321 — same flags)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from gaussianhaircut_tpu import config as cfg_mod
from gaussianhaircut_tpu.scene.dataset import load_scene
from gaussianhaircut_tpu.train import stage1


def main(argv=None):
    parser = argparse.ArgumentParser("train_gaussians")
    cfg_mod.add_model_args(parser)
    cfg_mod.add_optim_args(parser)
    cfg_mod.add_pipeline_args(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[1_000, 5_000, 15_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[1_000, 5_000, 15_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[1_000, 5_000, 15_000, 30_000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--gui", action="store_true",
                        help="serve the SIBR live viewer on --ip/--port "
                        "(train_gaussians.py:79-92)")
    parser.add_argument("--mesh", type=str, default="",
                        help="multi-chip mesh 'DATAxTILE' (e.g. 4x2): "
                        "cameras shard over DATA devices, the rasterizer "
                        "shards over TILE row shards per camera (new "
                        "TPU-native capability; empty = single chip)")
    args = parser.parse_args(argv)

    if args.gui:
        from gaussianhaircut_tpu.render import network_gui
        network_gui.init(args.ip, args.port)
        print(f"GUI server started at {args.ip}:{args.port}")

    model_cfg = cfg_mod.extract(cfg_mod.ModelConfig, args)
    opt_cfg = cfg_mod.extract(cfg_mod.OptimizationConfig, args)
    pipe_cfg = cfg_mod.extract(cfg_mod.PipelineConfig, args)
    save_iters = sorted(set(args.save_iterations + [opt_cfg.iterations]))

    print(f"Optimizing {model_cfg.model_path}")
    cfg_mod.save_config(model_cfg.model_path, model_cfg, opt_cfg, pipe_cfg)

    scene = load_scene(model_cfg)
    stage1.train(model_cfg, opt_cfg, pipe_cfg, scene,
                 test_iterations=tuple(args.test_iterations),
                 save_iterations=tuple(save_iters),
                 checkpoint_iterations=tuple(args.checkpoint_iterations),
                 start_checkpoint=args.start_checkpoint,
                 mesh_spec=args.mesh)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
