"""De-risk tools/convert_hyperiqa.py the way the strand-prior converter is:
its distillation loop must demonstrably fit a *known* teacher (an image-
derived sharpness functional — no torch/hyperIQA clone needed), and the saved
npz must round-trip through preprocessing.iqa.CnnScorer preserving the
teacher's quality ordering.  Mirrors the reference's pretrained-IQA frame
scoring contract (src/preprocessing/preprocess_raw_images.py:70-122)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")
from convert_hyperiqa import distill, save_npz  # noqa: E402


def _laplacian_var(batch):
    """Teacher: variance of the 4-neighbour Laplacian (sharpness axis)."""
    g = batch.mean(-1)
    lap = (-4 * g[:, 1:-1, 1:-1] + g[:, :-2, 1:-1] + g[:, 2:, 1:-1]
           + g[:, 1:-1, :-2] + g[:, 1:-1, 2:])
    return 100.0 * lap.reshape(len(batch), -1).var(axis=1)


def _blur(img, sigma, rng=None):
    if sigma <= 0:
        return img
    import cv2
    k = 2 * int(3 * sigma) + 1
    return cv2.GaussianBlur(img, (k, k), sigma)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    bases = [rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
             for _ in range(6)]
    sigmas = [0.0, 0.7, 1.4, 2.2, 3.0]
    imgs = np.stack([_blur(b, s) for b in bases for s in sigmas])
    return imgs, len(sigmas)


def test_distill_fits_known_teacher(tmp_path, corpus):
    imgs, n_sigma = corpus
    train = imgs[: 4 * n_sigma]   # 4 textures train
    held = imgs[4 * n_sigma:]     # 2 textures held out

    params = distill(train, _laplacian_var, steps=260, batch=8, seed=0,
                     channels=(8, 16, 32), log_every=0)

    import jax
    import jax.numpy as jnp

    def forward(params, x):
        for i in range(3):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}_w"], (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + params[f"conv{i}_b"])
        return jnp.mean(x, axis=(1, 2)) @ params["head_w"] + params["head_b"]

    pred = np.asarray(forward(params, jnp.asarray(held)))
    teach = _laplacian_var(held)
    # rank agreement on unseen textures: the student learned the quality
    # axis, not the content axis
    from scipy.stats import spearmanr
    rho = spearmanr(pred, teach).statistic
    assert rho > 0.8, f"held-out rank correlation too low: {rho:.3f}"

    # npz -> CnnScorer round trip preserves the blur ordering per texture
    out = str(tmp_path / "iqa.npz")
    save_npz(params, out)
    from gaussianhaircut_tpu.preprocessing.iqa import CnnScorer
    scorer = CnnScorer(out)
    assert scorer.kind == "distilled-hyperiqa"
    s = np.asarray(scorer._fn(scorer.params, jnp.asarray(held)))
    for t in range(2):
        per_tex = s[t * n_sigma:(t + 1) * n_sigma]
        assert per_tex[0] > per_tex[-1], (
            f"sharpest not scored above blurriest: {per_tex}")
    # the public path (resize to 224) must at least run and be finite
    val = scorer((held[0] * 255).astype(np.uint8))
    assert np.isfinite(val)
