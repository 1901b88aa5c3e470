"""Visualization/video postprocessing.

Role-equivalents of src/postprocessing/ (render_video.py, render_color.py,
concat_video.py):

- ``interpolate_camera_path``: rotation-spline + lerp novel camera paths
  (render_video.py's interpolation of K/R/T);
- ``write_video``: frames dir -> mp4 via cv2 (replacing the ffmpeg shell-out);
- ``concat_videos``: side-by-side GT | render panels (concat_video.py:22,41);
- ``export_blender_inputs`` + ``blender_render_script``: the Blender
  hand-off: writes the camera matrices / head PLY / strand pkl layout that
  render_color.py consumes, plus a standalone Cycles script to run inside
  Blender where available (this image has no Blender binary).
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def interpolate_camera_path(rotations: np.ndarray, translations: np.ndarray,
                            key_times, sample_times) -> tuple[np.ndarray, np.ndarray]:
    """RotationSpline over key rotations + lerp of translations."""
    from scipy.spatial.transform import Rotation, RotationSpline
    spline = RotationSpline(key_times, Rotation.from_matrix(rotations))
    r = spline(sample_times).as_matrix()
    t = np.stack([np.interp(sample_times, key_times, translations[:, i])
                  for i in range(translations.shape[1])], axis=-1)
    return r, t


def write_video(frames_dir: str, out_path: str, fps: int = 30) -> None:
    import cv2
    names = sorted(n for n in os.listdir(frames_dir)
                   if n.endswith((".png", ".jpg")))
    if not names:
        raise FileNotFoundError(f"no frames in {frames_dir}")
    first = cv2.imread(os.path.join(frames_dir, names[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for n in names:
        vw.write(cv2.imread(os.path.join(frames_dir, n)))
    vw.release()


def concat_videos(dirs: list[str], out_path: str, fps: int = 30) -> None:
    """Side-by-side panel video from several frame directories
    (concat_video.py's GT | blender | 3DGS layout)."""
    import cv2
    name_lists = [sorted(os.listdir(d)) for d in dirs]
    n = min(len(l) for l in name_lists)
    first = [cv2.imread(os.path.join(d, l[0])) for d, l in zip(dirs, name_lists)]
    h = min(f.shape[0] for f in first)
    widths = [int(f.shape[1] * h / f.shape[0]) for f in first]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (sum(widths), h))
    for i in range(n):
        row = []
        for d, l, w in zip(dirs, name_lists, widths):
            img = cv2.imread(os.path.join(d, l[i]))
            row.append(cv2.resize(img, (w, h)))
        vw.write(np.concatenate(row, axis=1))
    vw.release()


def export_blender_inputs(out_dir: str, camera_params: dict,
                          strands_pkl: str, head_ply: str) -> None:
    """Write the blender hand-off bundle render_color.py expects: camera
    projection pkl + paths file."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cameras.pkl"), "wb") as f:
        pickle.dump(camera_params, f)
    with open(os.path.join(out_dir, "inputs.txt"), "w") as f:
        f.write(f"strands={os.path.abspath(strands_pkl)}\n")
        f.write(f"head={os.path.abspath(head_ply)}\n")


def blender_render(blender_binary: str, inputs_dir: str, out_dir: str) -> None:
    """Shell out to Blender with the bundled Cycles script (render_video.py:
    207-214's process boundary); raises if no binary."""
    import shutil
    import subprocess
    if not shutil.which(blender_binary):
        raise FileNotFoundError(
            f"Blender binary '{blender_binary}' not found; run "
            "postprocessing on a machine with Blender 3.6 using "
            "blender_render_script.py")
    script = os.path.join(os.path.dirname(__file__), "blender_render_script.py")
    subprocess.check_call([blender_binary, "-b", "-P", script, "--",
                           inputs_dir, out_dir])
