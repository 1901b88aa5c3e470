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


def test_extract_scalp_canonical_topology(tmp_path):
    """Canonical scalp-UV branch (VERDICT r3 missing #4 / next #8): FLAME-
    style topology files (new_scalp_vertex_idx.npy + scalp_uvmap.npy, the
    NeuralHaircut contract of extract_non_visible_head_scalp.py:178-243)
    drive extract_scalp, and the emitted scalp.obj carries the CANONICAL UVs
    remapped to the cut submesh's vertex order — pinning the dif_mask / UV
    layout contract that ScalpPool.from_flame_dir then consumes."""
    import math
    import pickle

    import cv2
    from PIL import Image

    from gaussianhaircut_tpu.models.textured_strands import (
        ScalpPool, TexturedStrandsConfig)
    from gaussianhaircut_tpu.preprocessing import scalp as scalp_mod
    from gaussianhaircut_tpu.utils import mesh as mesh_util

    # --- UV-sphere head mesh ---
    rings, segs = 12, 16
    verts, faces = [], []
    for r in range(rings + 1):
        th = math.pi * r / rings
        for s in range(segs):
            ph = 2 * math.pi * s / segs
            verts.append([math.sin(th) * math.cos(ph), math.cos(th),
                          math.sin(th) * math.sin(ph)])
    for r in range(rings):
        for s in range(segs):
            a = r * segs + s
            b = r * segs + (s + 1) % segs
            c = (r + 1) * segs + s
            d = (r + 1) * segs + (s + 1) % segs
            faces.append([a, b, c])
            faces.append([b, d, c])
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)

    flame_dir = tmp_path / "flame_fitting"
    (flame_dir / "stage_3").mkdir(parents=True)
    mesh_util.save_obj(str(flame_dir / "stage_3" / "mesh_final.obj"),
                       verts, faces)

    # --- canonical scalp topology: the top cap, with planar UVs in [-1, 1]
    # in CANONICAL (ids-row) order, deliberately NOT in global-vertex order
    ids = np.nonzero(verts[:, 1] > 0.55)[0].astype(np.int64)
    ids = ids[np.argsort(-verts[ids, 0])]      # scramble vs global order
    uv_file = np.stack([verts[ids, 0], verts[ids, 2]], -1)  # [-1, 1] planar
    topo_dir = tmp_path / "topology"
    topo_dir.mkdir()
    np.save(topo_dir / "new_scalp_vertex_idx.npy", ids)
    np.save(topo_dir / "scalp_uvmap.npy", uv_file)

    # --- views + masks: hair covers the whole silhouette, so every visible
    # vertex is "hair-probable" and the cut reduces to the canonical ids
    w = h = 96
    data_dir = tmp_path / "data"
    for sub in ("hair", "body"):
        (data_dir / "masks_2" / sub).mkdir(parents=True)
    cams = {}
    fov = math.radians(45)
    t = 1.0 / math.tan(fov / 2)
    near, far = 0.1, 10.0
    for i in range(4):
        a = 2 * math.pi * i / 4
        center = np.array([3.0 * math.sin(a), 0.4, 3.0 * math.cos(a)])
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        w2c = np.eye(4)
        w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], 0)
        w2c[:3, 3] = -w2c[:3, :3] @ center
        proj = np.zeros((4, 4))
        proj[0, 0] = t
        proj[1, 1] = t
        proj[2, 2] = far / (far - near)
        proj[2, 3] = -far * near / (far - near)
        proj[3, 2] = 1.0
        full = (proj @ w2c).T                    # row-vector convention
        name = f"{i:04d}"
        cams[name] = full
        mask = np.full((h, w), 255, np.uint8)
        cv2.imwrite(str(data_dir / "masks_2" / "hair" / f"{name}.png"), mask)
        cv2.imwrite(str(data_dir / "masks_2" / "body" / f"{name}.png"), mask)

    scalp_mod.extract_scalp(str(flame_dir), str(data_dir), cams,
                            scalp_topology_dir=str(topo_dir))

    out = flame_dir / "scalp_data"
    with open(out / "cut_scalp_verts.pickle", "rb") as f:
        used = np.asarray(pickle.load(f))
    assert len(used) > 0 and np.isin(used, ids).all()

    # the UV layout contract: scalp.obj's vt rows are the canonical UVs of
    # the kept verts (remapped from ids-row order), mapped [-1,1] -> [0,1]
    cut = mesh_util.load_obj(str(out / "scalp.obj"))
    row_of = {int(g): k for k, g in enumerate(ids)}
    want_uv = (uv_file[[row_of[int(u)] for u in used]] + 1) / 2
    np.testing.assert_allclose(np.asarray(cut.uvs), want_uv, atol=1e-5)
    np.testing.assert_allclose(cut.verts, verts[used], atol=1e-6)

    # dif_mask: 256^2, nonzero coverage where the cap's UV faces land
    mask = np.asarray(Image.open(out / "dif_mask.png"))
    assert mask.shape == (256, 256)
    cover = (mask > 0).mean()
    assert 0.005 < cover < 0.9, cover

    # the pool consumes the artifact: canonical UVs interpolate into [0, 1]
    cfg = TexturedStrandsConfig(pool_size=256)
    pool = ScalpPool.from_flame_dir(str(flame_dir), str(data_dir), cfg)
    assert pool.origins.shape == (256, 3)
    assert float(pool.uvs.min()) >= 0.0 and float(pool.uvs.max()) <= 1.0
    # sampled roots live on the cap (y above the cut's lower edge)
    assert float(np.asarray(pool.origins)[:, 1].min()) > 0.4
