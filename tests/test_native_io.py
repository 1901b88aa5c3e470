"""Native C++ I/O extension vs the Python parsers."""
import struct

import numpy as np
import pytest

from gaussianhaircut_tpu import native
from gaussianhaircut_tpu.scene import colmap, ply


def _write_points3d_bin(path, xyz, rgb, err):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<iiii", 0, 1, 2, 3))


def _write_images_bin(path, imgs):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(imgs)))
        for iid, q, t, cid, name in imgs:
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", cid))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, 5))


@pytest.fixture(scope="module")
def native_ok():
    if not native.available():
        pytest.skip("native extension unavailable (no g++?)")
    return True


def test_native_points3d(tmp_path, rng, native_ok):
    xyz = rng.normal(size=(50, 3))
    rgb = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    err = rng.random(50)
    p = str(tmp_path / "points3D.bin")
    _write_points3d_bin(p, xyz, rgb, err)
    x2, c2, e2 = colmap.read_points3d_binary(p)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(c2, rgb)
    np.testing.assert_allclose(e2, err)


def test_native_images(tmp_path, rng, native_ok):
    imgs = [(3, rng.normal(size=4), rng.normal(size=3), 1, "frame_000.png"),
            (7, rng.normal(size=4), rng.normal(size=3), 1, "frame_001.png")]
    p = str(tmp_path / "images.bin")
    _write_images_bin(p, imgs)
    out = colmap.read_images_binary(p)
    assert set(out.keys()) == {3, 7}
    np.testing.assert_allclose(out[3].qvec, imgs[0][1])
    assert out[7].name == "frame_001.png"


def test_native_ply_matches_python(tmp_path, rng, native_ok):
    n = 23
    names = ["x", "y", "z", "opacity"]
    v = np.zeros(n, dtype=[(f, "<f4") for f in names])
    for f in names:
        v[f] = rng.normal(size=n).astype(np.float32)
    p = str(tmp_path / "a.ply")
    ply.write_ply(p, v)
    fast = native.read_ply_vertex_f32(p)
    assert fast is not None
    fnames, data = fast
    assert fnames == names
    for i, f in enumerate(names):
        np.testing.assert_allclose(data[:, i], v[f])
