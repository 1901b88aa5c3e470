"""Configuration: typed dataclasses + argparse bridging.

Replaces the reference's reflection-based ``ParamGroup`` system
(src/arguments/__init__.py:19-144) with plain dataclasses, while keeping the
same CLI flag names and defaults so existing run.sh invocations translate
1:1.  The `cfg_args`-style dump/reload is replaced by JSON (no ``eval``).
"""
from __future__ import annotations

import dataclasses
import json
import os
from argparse import ArgumentParser
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    """Reference: ModelParams (arguments/__init__.py:47-76)."""
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images_2"
    resolution: int = -1
    iteration_data: int = 30_000
    white_background: bool = False
    data_device: str = "tpu"
    binarize_masks: bool = False
    eval: bool = False
    load_synthetic_rgba: bool = False
    load_synthetic_geom: bool = False
    trainable_cameras: bool = True
    trainable_intrinsics: bool = True
    use_barf: bool = True
    flame_mesh_dir: str = ""
    strand_scale: float = 1e-3
    interpolate_cameras: bool = False
    speed_up: int = 4
    max_frames: int = 300
    frame_offset: int = 0


@dataclass(frozen=True)
class OptimizationConfig:
    """Reference: OptimizationParams (arguments/__init__.py:85-122).
    Frozen/hashable: passed as a static jit argument."""
    iterations: int = 30_000
    iterations_cam: int = 15_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    cam_lr_max_steps: int = 15_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    label_lr: float = 0.05
    orient_conf_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    cam_rotation_lr: float = 0.001
    cam_translation_lr_init: float = 0.0016
    cam_translation_lr_final: float = 0.000016
    cam_fov_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dl1: float = 0.8
    lambda_dssim: float = 0.2
    lambda_dmask: float = 0.2
    lambda_dorient: float = 0.0
    lambda_dsds: float = 0.0
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    opacity_reg_from_iter: int = 30_000
    gaussian_pruning_threshold: float = 0.5
    train_orient_conf: bool = True
    use_gt_orient_conf: bool = True
    # TPU-framework addition (stage 2/3 hair trainers only; stage 1 ignores
    # it): global-norm gradient clip.  0 disables.  The reference runs
    # unclipped but optimizes a PRETRAINED strand decoder; training the
    # decoder from scratch needs this — see optim.clip_by_global_norm.
    hair_grad_clip: float = 1.0
    # TPU-framework addition (stage 3): cap the SDS-term gradient at
    # `ratio * ||image-loss grad||`.  The reference backprops
    # lambda_dsds * L_diff jointly (train_strands.py:128-147) through a
    # CONVERGED pretrained prior whose gradients are naturally small; a
    # self-distilled prior can emit gradients 1e7x the image losses, and
    # per-coordinate Adam then follows the prior exclusively (measured:
    # runs/r4 stage3 l1 0.009 -> 0.165 in 700 iters).  <= 0 disables
    # (exact reference joint-backprop semantics).
    sds_grad_ratio: float = 1.0
    # TPU-framework addition (stage 2, self-trained-prior path only): once
    # the jointly-trained denoiser has warmed up for this many steps, a
    # frozen EMA copy of it starts regularizing the texture — restoring the
    # reference's model_ema texture-pull (gaussian_model_latent_
    # strands.py:501-513) that the stop-gradient in diffusion_loss removes
    # for the live denoiser.  <= 0 disables the EMA pull entirely.
    diffusion_ema_warmup: int = 2000
    diffusion_ema_decay: float = 0.995


@dataclass
class PipelineConfig:
    """Reference: PipelineParams (arguments/__init__.py:78-83) + TPU knobs."""
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    # TPU-native additions:
    raster_backend: str = "auto"            # auto | pallas | jnp
    gaussian_capacity: int = 0              # 0 -> auto from init size
    instance_capacity_mult: int = 8
    tile: int = 32
    data_parallel: int = 1                  # cameras per step across the mesh


def add_dataclass_args(parser: ArgumentParser, dc_type, shorthand: dict | None = None):
    """Register dataclass fields as --flags (bools become store_true, matching
    arguments/__init__.py:29-38)."""
    shorthand = shorthand or {}
    for f in dataclasses.fields(dc_type):
        names = [f"--{f.name}"]
        if f.name in shorthand:
            names.append(shorthand[f.name])
        if f.type in ("bool", bool):
            parser.add_argument(*names, default=f.default, action="store_true")
        else:
            parser.add_argument(*names, default=f.default, type=type(f.default))
    return parser


_SHORTHANDS = {"source_path": "-s", "model_path": "-m", "images": "-i",
               "resolution": "-r", "white_background": "-w"}


def add_model_args(parser):
    return add_dataclass_args(parser, ModelConfig, _SHORTHANDS)


def add_optim_args(parser):
    return add_dataclass_args(parser, OptimizationConfig)


def add_pipeline_args(parser):
    return add_dataclass_args(parser, PipelineConfig)


def extract(dc_type, args):
    """Build a dataclass from parsed argparse Namespace."""
    kwargs = {f.name: getattr(args, f.name) for f in dataclasses.fields(dc_type)
              if hasattr(args, f.name)}
    cfg = dc_type(**kwargs)
    if isinstance(cfg, ModelConfig) and cfg.source_path:
        cfg.source_path = os.path.abspath(cfg.source_path)
    return cfg


def save_config(model_path: str, model: ModelConfig, optim=None, pipe=None) -> None:
    """Persist configs (the cfg_args analog, train_gaussians.py:221-222) as
    JSON — reloadable without eval()."""
    os.makedirs(model_path, exist_ok=True)
    blob = {"model": dataclasses.asdict(model)}
    if optim is not None:
        blob["optim"] = dataclasses.asdict(optim)
    if pipe is not None:
        blob["pipeline"] = dataclasses.asdict(pipe)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(blob, f, indent=2)


def load_config(model_path: str):
    with open(os.path.join(model_path, "cfg_args.json")) as f:
        blob = json.load(f)
    model = ModelConfig(**blob["model"])
    optim = OptimizationConfig(**blob.get("optim", {}))
    pipe = PipelineConfig(**blob.get("pipeline", {}))
    return model, optim, pipe
