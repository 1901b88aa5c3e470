"""Export stage-3 strand polylines to pkl + ply
(the export_curves.py contract, reference src/preprocessing/export_curves.py:
pkl of [N, L=100, 3] float strands + a point-only PLY).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from gaussianhaircut_tpu.scene import ply as ply_io


def export_strand_points(pts: np.ndarray, out_dir: str, iteration) -> None:
    """pts [N, L, 3] -> <out>/ {iter}_strands.pkl + {iter}_strands.ply."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{iteration}_strands.pkl"), "wb") as f:
        pickle.dump(pts, f)
    xyz = pts.reshape(-1, 3)
    v = np.zeros(xyz.shape[0], dtype=[(n, "<f4") for n in
                                      ("x", "y", "z", "nx", "ny", "nz")])
    for i, n in enumerate(("x", "y", "z")):
        v[n] = xyz[:, i]
    ply_io.write_ply(os.path.join(out_dir, f"{iteration}_strands.ply"), v)


def main(argv=None):
    from gaussianhaircut_tpu.train import stage3

    parser = argparse.ArgumentParser("export_curves")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--model_name", required=True)
    parser.add_argument("--iter", default="10000")
    args = parser.parse_args(argv)

    ckpt = os.path.join(args.data_dir, "curves_reconstruction",
                        args.model_name, "checkpoints", f"{args.iter}.npz")
    state = stage3.load_checkpoint(ckpt)
    pts = stage3.export_points(state)
    print(f"Saving {pts.shape[0]} strands")
    out_dir = os.path.join(args.data_dir, "curves_reconstruction",
                           args.model_name, "strands")
    export_strand_points(pts, out_dir, args.iter)


if __name__ == "__main__":
    main()
