"""The classical mask fallback (cli/calc_masks.py grabcut path) must produce
masks that are (a) anatomically sane on a portrait-like frame and (b) good
enough to drive a stage-1 training run whose loss decreases — i.e. the
documented smoke-grade stand-in for Matte-Anything
(src/preprocessing/calc_masks.py:90-271) yields a *trainable* scene, not just
files on disk."""
import math
import os

import numpy as np
import pytest

from gaussianhaircut_tpu.cli import calc_masks
from gaussianhaircut_tpu.preprocessing.scene_tools import resize_images
from gaussianhaircut_tpu.scene import colmap as colmap_io


def _portrait(res=96, seed=0):
    """Synthetic head-and-shoulders frame (BGR) + GT region masks."""
    import cv2
    rng = np.random.default_rng(seed)
    img = np.full((res, res, 3), (225, 215, 205), np.uint8)  # light bg
    img = (img + rng.integers(-8, 8, img.shape)).clip(0, 255).astype(np.uint8)
    gt_body = np.zeros((res, res), bool)
    gt_face = np.zeros((res, res), bool)
    gt_hair = np.zeros((res, res), bool)

    cx, cy = res // 2, int(res * 0.42)
    # torso: mid-tone shirt
    cv2.rectangle(img, (int(res * 0.25), int(res * 0.70)),
                  (int(res * 0.75), res - 1), (90, 60, 50), -1)
    gt_body[int(res * 0.70):, int(res * 0.25):int(res * 0.75)] = True
    # face: skin-tone ellipse (inside calc_masks' YCrCb skin gate)
    cv2.ellipse(img, (cx, cy), (int(res * 0.16), int(res * 0.20)), 0, 0, 360,
                (140, 160, 215), -1)
    fy, fx = np.ogrid[:res, :res]
    gt_face = (((fx - cx) / (res * 0.16)) ** 2
               + ((fy - cy) / (res * 0.20)) ** 2) <= 1.0
    # hair: dark cap over the top half of the head, wider than the face
    cv2.ellipse(img, (cx, cy - int(res * 0.10)),
                (int(res * 0.20), int(res * 0.16)), 0, 180, 360, (25, 22, 28), -1)
    hcx, hcy = cx, cy - int(res * 0.10)
    gt_hair = ((((fx - hcx) / (res * 0.20)) ** 2
                + ((fy - hcy) / (res * 0.16)) ** 2) <= 1.0) & (fy <= hcy)
    gt_hair &= ~gt_face
    gt_body |= gt_face | gt_hair
    return img, gt_hair, gt_face, gt_body


def test_grabcut_masks_portrait():
    img, gt_hair, gt_face, gt_body = _portrait()
    hair, face, body = calc_masks.grabcut_masks(img)
    # non-empty, and each mask concentrates on its GT region
    for name, m, gt in (("hair", hair, gt_hair), ("face", face, gt_face),
                        ("body", body, gt_body)):
        m = m > 127
        assert m.sum() > 20, f"{name} mask is (near) empty"
        precision = (m & gt).sum() / m.sum()
        recall = (m & gt).sum() / gt.sum()
        assert precision > 0.5, f"{name} precision {precision:.2f}"
        assert recall > 0.3, f"{name} recall {recall:.2f}"
    # hair and face must be essentially disjoint (downstream losses assume it)
    inter = ((hair > 127) & (face > 127)).sum()
    assert inter < 0.1 * max((hair > 127).sum(), 1)


def _build_portrait_scene(root, res=96, n_views=4):
    """Full-res images/ + COLMAP sparse; masks come from the fallback CLI."""
    from PIL import Image
    rng = np.random.default_rng(7)
    os.makedirs(f"{root}/sparse/0", exist_ok=True)
    os.makedirs(f"{root}/images", exist_ok=True)

    # subject sits at the origin; seed points inside it
    pts = rng.normal(scale=0.25, size=(160, 3)).astype(np.float32)
    rgb = rng.integers(40, 210, (160, 3)).astype(np.uint8)
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
        # near-frontal arc: the portrait drawing stays approximately valid
        a = math.radians(-9 + 6 * i)
        center = np.array([2.5 * math.sin(a), 0.1, 2.5 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R_w2c = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        t = -R_w2c @ center
        name = f"{i:06d}.png"
        imgs[i + 1] = colmap_io.ColmapImage(
            i + 1, colmap_io.rotmat_to_qvec(R_w2c), t, 1, name)
        img_bgr, _, _, _ = _portrait(res=res, seed=i)
        Image.fromarray(img_bgr[..., ::-1]).save(f"{root}/images/{name}")
    colmap_io.write_images_text(f"{root}/sparse/0/images.txt", imgs)


@pytest.mark.slow
def test_fallback_masks_make_scene_trainable(tmp_path):
    """images/ -> calc_masks fallback -> resize -> load_scene -> stage-1 train:
    loss must drop with the fallback's masks gating the hair/body losses."""
    from PIL import Image

    from gaussianhaircut_tpu.config import (ModelConfig, OptimizationConfig,
                                            PipelineConfig)
    from gaussianhaircut_tpu.scene.dataset import load_scene
    from gaussianhaircut_tpu.train import stage1

    root = str(tmp_path / "scene")
    res = 96
    _build_portrait_scene(root, res=res)

    calc_masks.main(["--scene_path", root, "--images_dir", "images"])
    for sub in ("hair", "face", "body"):
        assert len(os.listdir(f"{root}/masks/{sub}")) == 4
    resize_images(root, factors=(2,))
    assert os.path.isdir(f"{root}/images_2")
    assert os.path.isdir(f"{root}/masks_2/hair")

    # orientation maps from the real Gabor pipeline would also work; a
    # constant stand-in keeps this test about the masks
    os.makedirs(f"{root}/orientations_2/angles", exist_ok=True)
    os.makedirs(f"{root}/orientations_2/vars", exist_ok=True)
    for i in range(4):
        Image.fromarray(np.full((res // 2, res // 2), 90, np.uint8)).save(
            f"{root}/orientations_2/angles/{i:06d}.png")
        np.save(f"{root}/orientations_2/vars/{i:06d}.npy",
                np.full((res // 2, res // 2), 0.5, np.float16))

    model_cfg = ModelConfig(source_path=root, model_path=str(tmp_path / "out"),
                            eval=False)
    scene = load_scene(model_cfg)
    assert len(scene.train_cameras) == 4
    # the fallback's hair mask must actually reach the loss: nonzero coverage
    cov = [float(np.mean(c.mask_hair)) for c in scene.train_cameras]
    assert all(c > 0.005 for c in cov), f"hair masks ~empty: {cov}"

    opt_cfg = OptimizationConfig(iterations=80, densify_from_iter=1000,
                                 densify_until_iter=0,
                                 opacity_reset_interval=10_000,
                                 lambda_dorient=0.1)
    pipe_cfg = PipelineConfig(raster_backend="jnp", tile=16,
                              gaussian_capacity=512,
                              instance_capacity_mult=16)
    history = []
    stage1.train(model_cfg, opt_cfg, pipe_cfg, scene,
                 test_iterations=(), save_iterations=(), checkpoint_iterations=(),
                 progress_callback=lambda it, st, m: history.append(float(m["total"])))
    first = np.mean(history[:8])
    last = np.mean(history[-8:])
    assert last < 0.8 * first, f"loss did not decrease: {first} -> {last}"
