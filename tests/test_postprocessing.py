"""Postprocessing contracts that can be validated without Blender/ffmpeg:
the hand-off bundle layout, the in-Blender script's syntax, and the camera
path interpolation (render_video.py / render_color.py equivalents)."""
import os
import pickle
import py_compile

import numpy as np

from gaussianhaircut_tpu.postprocessing import blender_render_script, video


def test_blender_script_compiles(tmp_path):
    src = blender_render_script.__file__
    py_compile.compile(src, cfile=str(tmp_path / "c.pyc"), doraise=True)


def test_export_blender_inputs_roundtrip(tmp_path):
    strands = tmp_path / "s.pkl"
    head = tmp_path / "h.ply"
    strands.write_bytes(pickle.dumps(np.zeros((2, 4, 3), np.float32)))
    head.write_bytes(b"ply")
    cams = {"000000": {"P": np.eye(4).tolist(), "width": 64, "height": 64}}
    out = str(tmp_path / "blender_inputs")
    video.export_blender_inputs(out, cams, str(strands), str(head))
    with open(os.path.join(out, "cameras.pkl"), "rb") as f:
        loaded = pickle.load(f)
    assert loaded.keys() == cams.keys()
    paths = dict(line.strip().split("=", 1)
                 for line in open(os.path.join(out, "inputs.txt")))
    assert paths["strands"] == str(strands)
    assert paths["head"] == str(head)


def test_interpolate_camera_path():
    # two cameras 90 degrees apart around y; interpolation must stay a valid
    # rotation and pass through the endpoints
    r0 = np.eye(3)
    a = np.pi / 2
    r1 = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                   [-np.sin(a), 0, np.cos(a)]])
    rs = np.stack([r0, r1])
    ts = np.array([[0.0, 0, 2], [2, 0, 0.0]])
    ri, ti = video.interpolate_camera_path(rs, ts, [0.0, 1.0],
                                           np.linspace(0.0, 1.0, 9))
    assert ri.shape == (9, 3, 3) and ti.shape == (9, 3)
    np.testing.assert_allclose(ri[0], r0, atol=1e-6)
    np.testing.assert_allclose(ri[-1], r1, atol=1e-6)
    for r in ri:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(ti[0], ts[0], atol=1e-6)
    np.testing.assert_allclose(ti[-1], ts[1], atol=1e-6)


def test_blender_render_requires_binary(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        video.blender_render("definitely-not-blender", str(tmp_path),
                             str(tmp_path))
