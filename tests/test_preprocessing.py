"""Preprocessing glue contracts."""
import numpy as np

def test_calc_face_alignment_contract(tmp_path):
    """lmks_2d.pkl / lmks_3d.pkl keyed by basename with [68, 2]/[68, 3]
    arrays (src/preprocessing/calc_face_alignment.py:47-48), from both the
    precomputed-npy mode and the geometric fallback."""
    import pickle

    from PIL import Image

    from gaussianhaircut_tpu.cli import calc_face_alignment as cfa

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = np.full((48, 40, 3), 60, np.uint8)
        arr[10:38, 8:32] = (190, 140, 110)  # skin patch
        Image.fromarray(arr).save(img_dir / f"{i:04d}.png")

    # fallback mode
    cfa.main(["--data_path", str(tmp_path), "--no_vis"])
    with open(tmp_path / "face_alignment" / "lmks_2d.pkl", "rb") as f:
        l2 = pickle.load(f)
    with open(tmp_path / "face_alignment" / "lmks_3d.pkl", "rb") as f:
        l3 = pickle.load(f)
    assert set(l2) == {"0000", "0001"} and set(l3) == {"0000", "0001"}
    assert l2["0000"].shape == (68, 2) and l3["0000"].shape == (68, 3)
    # landmarks inside the skin bbox, roughly
    assert l2["0000"][:, 0].min() >= 0 and l2["0000"][:, 1].max() <= 48

    # precomputed mode overrides
    lm_dir = tmp_path / "lms"
    lm_dir.mkdir()
    fixed = rng.uniform(0, 40, (68, 2)).astype(np.float32)
    np.save(lm_dir / "0000_2d.npy", fixed)
    cfa.main(["--data_path", str(tmp_path), "--landmarks_dir", str(lm_dir),
              "--no_vis"])
    with open(tmp_path / "face_alignment" / "lmks_2d.pkl", "rb") as f:
        l2b = pickle.load(f)
    np.testing.assert_allclose(l2b["0000"], fixed)
    assert "0001" not in l2b  # no npy for it -> absent, like a failed detect


def test_merge_smplx_stream(tmp_path):
    """initialization_pixie is a CONCATENATED pickle stream in sorted frame
    order (merge_smplx_predictions.py:13-16)."""
    import pickle

    from gaussianhaircut_tpu.cli import merge_smplx_predictions as msp

    for frame in ("b", "a"):
        d = tmp_path / "pixie" / frame
        d.mkdir(parents=True)
        with open(d / f"{frame}_param.pkl", "wb") as f:
            pickle.dump({"frame": frame, "shape": np.zeros(3)}, f)
    n = msp.merge(str(tmp_path))
    assert n == 2
    frames = [r["frame"] for r in
              msp.read_stream(str(tmp_path / "initialization_pixie"))]
    assert frames == ["a", "b"]  # sorted path order


def test_mscn_iqa_ranks_degradations():
    """The NSS scorer must rank: sharp > blurred, sharp > noisy (the property
    the variance-of-Laplacian proxy fails on noise — it REWARDS noise)."""
    import cv2

    from gaussianhaircut_tpu.preprocessing import iqa
    from gaussianhaircut_tpu.preprocessing.frames import sharpness_iqa

    rng = np.random.default_rng(0)
    # a structured natural-ish image: smooth gradients + edges
    x, y = np.meshgrid(np.linspace(0, 1, 160), np.linspace(0, 1, 160))
    img = (0.5 + 0.3 * np.sin(9 * x) * np.cos(7 * y)
           + 0.2 * ((x + y) > 1.0)) * 255
    img = np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)

    blurred = cv2.GaussianBlur(img, (15, 15), 5)
    noisy = np.clip(img.astype(np.float32)
                    + rng.normal(0, 40, img.shape), 0, 255).astype(np.uint8)

    s_sharp = iqa.mscn_iqa(img)
    s_blur = iqa.mscn_iqa(blurred)
    s_noise = iqa.mscn_iqa(noisy)
    assert s_sharp > s_blur, (s_sharp, s_blur)
    assert s_sharp > s_noise, (s_sharp, s_noise)
    # document the proxy's failure mode the NSS scorer fixes
    assert sharpness_iqa(noisy) > sharpness_iqa(img), \
        "if Laplacian stops rewarding noise, revisit the scorer tiering"


def test_cnn_scorer_loads_npz(tmp_path):
    """CnnScorer loads the converter's npz schema and scores an image."""
    from gaussianhaircut_tpu.preprocessing.iqa import CnnScorer
    from tools.convert_hyperiqa import init_params

    import jax

    blob = init_params(jax.random.PRNGKey(0))
    blob["kind"] = np.asarray("distilled-hyperiqa")
    path = str(tmp_path / "iqa.npz")
    np.savez(path, **blob)
    sc = CnnScorer(path)
    img = (np.random.default_rng(0).uniform(0, 255, (120, 90, 3))
           ).astype(np.uint8)
    v = sc(img)
    assert np.isfinite(v)
