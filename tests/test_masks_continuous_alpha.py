"""Continuous-alpha mattes (the Matte-Anything output contract,
src/preprocessing/calc_masks.py:230-271: float alphas saved as 8-bit PNGs)
must flow through scene loading and the stage-1 losses unchanged — i.e. the
loss math is proven on NON-binary masks, not just the grabcut fallback's
0/1 output (tests/test_masks_fallback.py covers the binary path)."""
import os

import numpy as np
import pytest

from tests.test_masks_fallback import _build_portrait_scene, _portrait
from gaussianhaircut_tpu.preprocessing.scene_tools import resize_images


def _soft(mask_bool, res, sigma=3.0):
    """Binary region -> continuous alpha with a wide soft edge (distance-
    based falloff), mimicking a matting model's fractional hair boundary."""
    import cv2

    m = mask_bool.astype(np.uint8)
    dist_in = cv2.distanceTransform(m, cv2.DIST_L2, 3)
    dist_out = cv2.distanceTransform(1 - m, cv2.DIST_L2, 3)
    signed = dist_in - dist_out
    alpha = 1.0 / (1.0 + np.exp(-signed / sigma))
    return (alpha * 255).astype(np.uint8)


@pytest.mark.slow
def test_continuous_alpha_masks_train(tmp_path):
    from PIL import Image

    from gaussianhaircut_tpu.config import (ModelConfig, OptimizationConfig,
                                            PipelineConfig)
    from gaussianhaircut_tpu.scene.dataset import load_scene
    from gaussianhaircut_tpu.train import stage1

    root = str(tmp_path / "scene")
    res = 96
    _build_portrait_scene(root, res=res)

    # write CONTINUOUS alphas (no calc_masks): the external matting model's
    # on-disk contract — masks/{hair,face,body}/<frame>.png, 8-bit alpha
    for sub in ("hair", "face", "body"):
        os.makedirs(f"{root}/masks/{sub}", exist_ok=True)
    for i in range(4):
        _, gt_hair, gt_face, gt_body = _portrait(res=res, seed=i)
        name = f"{i:06d}.png"
        Image.fromarray(_soft(gt_hair, res)).save(f"{root}/masks/hair/{name}")
        Image.fromarray(_soft(gt_face, res)).save(f"{root}/masks/face/{name}")
        Image.fromarray(_soft(gt_body, res)).save(f"{root}/masks/body/{name}")
    resize_images(root, factors=(2,))

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

    # the loaded mattes must actually BE continuous: a real fraction of
    # pixels strictly inside (0.05, 0.95) — if loading binarized them this
    # test is not covering the alpha path
    fracs = []
    for c in scene.train_cameras:
        m = np.asarray(c.mask_hair)
        assert m.min() >= 0.0 and m.max() <= 1.0
        fracs.append(float(np.mean((m > 0.05) & (m < 0.95))))
    assert all(f > 0.01 for f in fracs), \
        f"hair mattes look binary after loading: mid-fracs {fracs}"

    opt_cfg = OptimizationConfig(iterations=80, densify_from_iter=1000,
                                 densify_until_iter=0,
                                 opacity_reset_interval=10_000,
                                 lambda_dorient=0.1)
    pipe_cfg = PipelineConfig(raster_backend="jnp", tile=16,
                              gaussian_capacity=512,
                              instance_capacity_mult=16)
    history = []
    stage1.train(model_cfg, opt_cfg, pipe_cfg, scene,
                 test_iterations=(), save_iterations=(),
                 checkpoint_iterations=(),
                 progress_callback=lambda it, st, m: history.append(
                     float(m["total"])))
    assert all(np.isfinite(history)), "non-finite loss on continuous alphas"
    first = np.mean(history[:8])
    last = np.mean(history[-8:])
    assert last < 0.8 * first, f"loss did not decrease: {first} -> {last}"
