"""Export stage-2 latent strands at high density
(the export_strands.py contract, reference src/preprocessing/export_strands.py:
run the trained generator at 30k strands, prune strands that intersect the
FLAME head, save pkl + ply)."""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main(argv=None):
    import jax

    from gaussianhaircut_tpu.cli.export_curves import export_strand_points
    from gaussianhaircut_tpu.models.textured_strands import (
        ScalpPool, TexturedStrandsConfig, generate_strands, synthetic_scalp_pool)
    from gaussianhaircut_tpu.preprocessing.scene_tools import mesh_sdf_sign
    from gaussianhaircut_tpu.train import stage2
    from gaussianhaircut_tpu.utils import mesh as mesh_util

    parser = argparse.ArgumentParser("export_strands")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--model_name", required=True)
    parser.add_argument("--flame_mesh_dir", default="")
    parser.add_argument("--iter", default="20000")
    parser.add_argument("--num_strands", type=int, default=30_000)
    parser.add_argument("--texture_size", type=int, default=256)
    args = parser.parse_args(argv)

    scfg = TexturedStrandsConfig(num_strands=args.num_strands,
                                 texture_size=args.texture_size)
    if args.flame_mesh_dir and os.path.isdir(args.flame_mesh_dir):
        pool = ScalpPool.from_flame_dir(args.flame_mesh_dir, args.data_dir, scfg)
    else:
        pool = synthetic_scalp_pool(scfg.pool_size)

    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    ckpt = os.path.join(args.data_dir, "strands_reconstruction",
                        args.model_name, "checkpoints", f"{args.iter}.npz")
    state = stage2.load_checkpoint(ckpt, state)

    out = generate_strands(state.params, pool, scfg, jax.random.PRNGKey(7),
                           args.num_strands)
    pts = np.asarray(out.points)

    flame_mesh = os.path.join(args.flame_mesh_dir, "stage_3", "mesh_final.obj")
    if os.path.exists(flame_mesh):
        head = mesh_util.load_obj(flame_mesh)
        inside = mesh_sdf_sign(pts.reshape(-1, 3), head)
        frac_inside = inside.reshape(pts.shape[0], -1).mean(axis=1)
        keep = frac_inside < 0.5
        print(f"Pruning {int((~keep).sum())} strands that intersect the head mesh")
        pts = pts[keep]

    print(f"Saving {pts.shape[0]} strands")
    out_dir = os.path.join(args.data_dir, "strands_reconstruction",
                           args.model_name, "strands")
    export_strand_points(pts, out_dir, args.iter)


if __name__ == "__main__":
    main()
