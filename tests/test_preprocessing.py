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
