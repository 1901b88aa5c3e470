"""Reorganize a synthetic (NeuralHaircut-style) dump into the pipeline layout
(the preprocess_synthetic_scene.py equivalent, reference
src/preprocessing/preprocess_synthetic_scene.py): copies/links images, masks
and camera files into the directory contract the trainers read."""
from __future__ import annotations

import os
import shutil


def preprocess_synthetic_scene(src_dir: str, dst_dir: str) -> None:
    mapping = {
        "image": "images_2",
        "images": "images_2",
        "hair_mask": "masks_2/hair",
        "mask": "masks_2/body",
        "orientation_maps": "orientations_2/angles",
        "confidence_maps": "orientations_2/vars",
    }
    os.makedirs(dst_dir, exist_ok=True)
    for src_name, dst_name in mapping.items():
        s = os.path.join(src_dir, src_name)
        if not os.path.isdir(s):
            continue
        d = os.path.join(dst_dir, dst_name)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        if not os.path.exists(d):
            shutil.copytree(s, d)
    for f in ("cameras.npz", "projection.npy", "point_cloud.ply"):
        s = os.path.join(src_dir, f)
        if os.path.exists(s):
            shutil.copy2(s, os.path.join(dst_dir, f))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser("preprocess_synthetic_scene")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    a = p.parse_args(argv)
    preprocess_synthetic_scene(a.src, a.dst)


if __name__ == "__main__":
    main()
