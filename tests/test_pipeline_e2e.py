"""End-to-end on-disk pipeline: synthetic COLMAP scene -> train_gaussians CLI
-> render_gaussians CLI, exercising every disk contract in between."""
import math
import os

import numpy as np
import pytest
from PIL import Image

from gaussianhaircut_tpu.scene import colmap as colmap_io


def _build_scene(root, res=48, n_views=4, n_pts=120):
    rng = np.random.default_rng(3)
    os.makedirs(f"{root}/sparse/0", exist_ok=True)
    for sub in ("images_2", "masks_2/hair", "masks_2/body",
                "orientations_2/angles", "orientations_2/vars"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)

    pts = rng.normal(scale=0.3, size=(n_pts, 3))
    rgb = rng.integers(50, 200, (n_pts, 3)).astype(np.uint8)
    with open(f"{root}/sparse/0/points3D.txt", "w") as f:
        f.write("# points\n# \n# \n")
        for i, (p, c) in enumerate(zip(pts, rgb)):
            f.write(f"{i} {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]} 0.5\n")

    fov = math.radians(50)
    focal = res / (2 * math.tan(fov / 2))
    cams = {1: colmap_io.ColmapCamera(1, "PINHOLE", res, res,
                                      np.array([focal, focal, res / 2, res / 2]))}
    colmap_io.write_cameras_text(f"{root}/sparse/0/cameras.txt", cams)

    imgs = {}
    for i in range(n_views):
        a = 2 * math.pi * i / n_views
        center = np.array([2.5 * math.sin(a), 0.3, 2.5 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R_w2c = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        t = -R_w2c @ center
        name = f"{i:06d}.png"
        imgs[i + 1] = colmap_io.ColmapImage(
            i + 1, colmap_io.rotmat_to_qvec(R_w2c), t, 1, name)
        img = rng.integers(0, 255, (res, res, 3)).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images_2/{name}")
        mask = np.full((res, res), 255, np.uint8)
        Image.fromarray(mask).save(f"{root}/masks_2/hair/{name}")
        Image.fromarray(mask).save(f"{root}/masks_2/body/{name}")
        ang = rng.integers(0, 180, (res, res)).astype(np.uint8)
        Image.fromarray(ang).save(f"{root}/orientations_2/angles/{name}")
        np.save(f"{root}/orientations_2/vars/{i:06d}.npy",
                rng.random((res, res)).astype(np.float16))
    colmap_io.write_images_text(f"{root}/sparse/0/images.txt", imgs)
    return root


@pytest.mark.slow
def test_cli_train_and_render(tmp_path):
    scene_dir = _build_scene(str(tmp_path / "scene"))
    model_dir = str(tmp_path / "model")

    from gaussianhaircut_tpu.cli import render_gaussians, train_gaussians

    train_gaussians.main([
        "-s", scene_dir, "-m", model_dir,
        "--iterations", "12", "--iterations_cam", "8",
        "--densify_from_iter", "100", "--densify_until_iter", "0",
        "--test_iterations", "-1",
        "--save_iterations", "12", "--checkpoint_iterations", "12",
        "--raster_backend", "jnp", "--tile", "16",
        "--gaussian_capacity", "256", "--lambda_dorient", "0.1",
    ])

    ply = os.path.join(model_dir, "point_cloud/iteration_12/raw_point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_dir, "cameras/12.pkl"))
    assert os.path.exists(os.path.join(model_dir, "cfg_args.json"))

    render_gaussians.main([
        "-s", scene_dir, "-m", model_dir, "--iteration", "12",
        "--skip_test", "--raster_backend", "jnp", "--tile", "16",
    ])
    out = os.path.join(model_dir, "train/ours_12/renders/000000.png")
    assert os.path.exists(out)
    arr = np.asarray(Image.open(out))
    assert arr.shape[0] > 0 and arr.std() >= 0
    assert os.path.exists(os.path.join(model_dir, "train/ours_12/orients/000000.png"))
    assert os.path.exists(os.path.join(model_dir, "cameras/12_matrices.pkl"))


@pytest.mark.slow
def test_cli_full_strand_pipeline(tmp_path):
    """Stages 1->2->3->export->render through the CLIs, asserting every
    on-disk contract (run.sh:169-233 equivalents)."""
    scene_dir = _build_scene(str(tmp_path / "scene"))
    model_dir = str(tmp_path / "model")
    hair_dir = str(tmp_path / "hair")
    curves_dir = os.path.join(scene_dir, "curves_reconstruction", "test3")

    from gaussianhaircut_tpu.cli import (export_curves, render_strands,
                                         train_gaussians,
                                         train_latent_strands, train_strands)

    train_gaussians.main([
        "-s", scene_dir, "-m", model_dir,
        "--iterations", "8", "--iterations_cam", "4",
        "--densify_from_iter", "100", "--densify_until_iter", "0",
        "--test_iterations", "-1",
        "--save_iterations", "8", "--checkpoint_iterations", "8",
        "--raster_backend", "jnp", "--tile", "16",
        "--gaussian_capacity", "256", "--lambda_dorient", "0.1",
    ])

    small = ["--num_strands", "8", "--texture_size", "16",
             "--strand_length", "8", "--diffusion_input", "4",
             "--raster_backend", "jnp", "--tile", "16",
             "--instance_capacity_mult", "64",
             "--lambda_dorient", "0.1", "--lambda_dsds", "0.01"]

    train_latent_strands.main([
        "-s", scene_dir, "-m", model_dir, "--model_path_hair", hair_dir,
        "--iterations", "3", "--checkpoint_iterations", "3",
        "--use_diffusion"] + small)
    ck2 = os.path.join(hair_dir, "checkpoints", "3.npz")
    assert os.path.exists(ck2)

    train_strands.main([
        "-s", scene_dir, "-m", model_dir, "--model_path_hair", hair_dir,
        "--model_path_curves", curves_dir,
        "--start_checkpoint_hair", ck2,
        "--iterations", "2", "--checkpoint_iterations", "2",
        "--use_sds"] + small)
    ck3 = os.path.join(curves_dir, "checkpoints", "2.npz")
    assert os.path.exists(ck3)

    export_curves.main(["--data_dir", scene_dir, "--model_name", "test3",
                        "--iter", "2"])
    strands_pkl = os.path.join(curves_dir, "strands", "2_strands.pkl")
    assert os.path.exists(strands_pkl)
    import pickle
    with open(strands_pkl, "rb") as f:
        pts = pickle.load(f)
    assert pts.shape == (8, 8, 3) and np.isfinite(pts).all()
    assert os.path.exists(os.path.join(curves_dir, "strands", "2_strands.ply"))

    render_strands.main([
        "-s", scene_dir, "-m", model_dir, "--model_hair_path", hair_dir,
        "--checkpoint_curves", ck3, "--skip_test",
        "--raster_backend", "jnp", "--tile", "16",
        "--instance_capacity_mult", "64"])
    out = os.path.join(hair_dir, "train/ours_8/renders/000000.png")
    assert os.path.exists(out)
    arr = np.asarray(Image.open(out))
    assert arr.shape[0] > 0
