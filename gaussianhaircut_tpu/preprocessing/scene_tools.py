"""Scene-geometry preprocessing: sphere crop/scale, COLMAP->cameras.npz,
FLAME-intersection filtering, image resizing.

Behavioral ports (numpy; all off the training hot path — SURVEY.md §2.1):
- scale_scene_into_sphere (reference src/preprocessing/scale_scene_into_sphere
  .py:30-70): iterative median-based robust sphere fit around confident hair
  Gaussians (label >= 0.5, opacity >= 0.5), writes scale.pickle + cropped PLY;
- colmap_parsing (src/preprocessing/colmap_parsing.py): sparse_txt ->
  cameras.npz (world_mat_i = K @ E) + point_cloud.ply for FLAME fitting;
- filter_flame_intersections (src/preprocessing/filter_flame_intersections.py
  :88-121): prune hair Gaussians whose icosphere proxies fall inside the
  FLAME head mesh (SDF sign via a numpy winding-number/closest-triangle test);
- resize_images (src/preprocessing/resize_images.py): images_2/_4, masks_2/_4.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.scene import colmap as colmap_io
from gaussianhaircut_tpu.scene import ply as ply_io
from gaussianhaircut_tpu.utils import mesh as mesh_util


def robust_sphere_fit(xyz_hair: np.ndarray, iters: int = 5):
    """(translation [3], scale) via the reference's iterated median trim
    (scale_scene_into_sphere.py:47-58)."""
    if xyz_hair.shape[0] == 0:
        raise ValueError("robust_sphere_fit: empty point selection")
    tr = np.zeros(3)
    pts = xyz_hair
    s = 1.0
    for _ in range(iters):
        norm = np.linalg.norm(pts - tr, axis=-1)
        threshold = np.median(norm) * 5
        keep = norm < threshold
        if not keep.any():
            break
        pts = pts[keep]
        tr = pts.mean(axis=0)
        s = norm[keep].max()
    return tr, float(s)


def scale_scene_into_sphere(model_path: str, data_path: str, iteration: int,
                            sh_degree: int = 3) -> dict:
    """Crop the stage-1 model to the hair sphere and write
    scale.pickle (the stage-2/3 scene-scale contract)."""
    src = os.path.join(model_path, "point_cloud", f"iteration_{iteration}",
                       "raw_point_cloud.ply")
    state = gm.load_ply(src, 0, sh_degree)
    p = state.params
    alive = np.asarray(state.aux.alive)
    labels = np.asarray(gm.get_label(p))[:, 0]
    opac = np.asarray(gm.get_opacity(p))[:, 0]
    xyz = np.asarray(p.xyz)

    # selection cascade: the reference assumes a converged stage-1 model with
    # confident hair labels (scale_scene_into_sphere.py); an undertrained
    # model (smoke runs, early checkpoints) can have NO gaussian passing both
    # thresholds — fall back to progressively weaker selections rather than
    # crash on an empty reduction
    for hair in (alive & (labels >= 0.5) & (opac >= 0.5),
                 alive & (labels >= 0.5),
                 alive):
        if hair.any():
            break
    tr, s = robust_sphere_fit(xyz[hair])

    keep = alive & (np.linalg.norm(xyz - tr, axis=-1) < s)
    import jax.numpy as jnp
    state = state.replace(aux=state.aux._replace(alive=jnp.asarray(keep)))
    out_dir = os.path.join(model_path, "point_cloud_cropped",
                           f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    gm.save_ply(state, os.path.join(out_dir, "point_cloud.ply"))

    d = {"scale": s, "translation": [float(v) for v in tr]}
    os.makedirs(data_path, exist_ok=True)
    with open(os.path.join(data_path, "scale.pickle"), "wb") as f:
        pickle.dump(d, f)
    return d


def colmap_to_h3ds(scene_path: str, images_dir: str = "images_4",
                   sparse_dir: str = "sparse_txt") -> None:
    """COLMAP sparse_txt -> cameras.npz (world_mat_i = K @ E) + point_cloud.ply
    (colmap_parsing.py)."""
    sp = os.path.join(scene_path, sparse_dir)
    cams = colmap_io.read_cameras_text(os.path.join(sp, "cameras.txt"))
    imgs = colmap_io.read_images_text(os.path.join(sp, "images.txt"))
    xyz, rgb, _ = colmap_io.read_points3d_text(os.path.join(sp, "points3D.txt"))

    cam = next(iter(cams.values()))
    if cam.model == "PINHOLE":
        fx, fy, x0, y0 = cam.params[:4]
    else:  # SIMPLE_PINHOLE
        fx, x0, y0 = cam.params[:3]
        fy = fx
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, x0, y0

    data = {}
    for img in imgs.values():
        E = np.eye(4)
        E[:3, :3] = colmap_io.qvec_to_rotmat(img.qvec)
        E[:3, 3] = img.tvec
        data[img.name] = K @ E

    images_folder = os.path.join(scene_path, images_dir)
    names = [n for n in data
             if os.path.exists(os.path.join(images_folder, n))]
    out = {}
    for i, name in enumerate(sorted(names)):
        out[f"world_mat_{i}"] = data[name]
        out[f"scale_mat_{i}"] = np.eye(4)
    np.savez(os.path.join(scene_path, "cameras.npz"), **out)
    ply_io.store_point_cloud(os.path.join(scene_path, "point_cloud.ply"),
                             xyz, rgb.astype(np.float64))


# ------------------------------------------------------------------ SDF ----

def mesh_sdf_sign(points: np.ndarray, mesh: mesh_util.Mesh,
                  chunk: int = 4096) -> np.ndarray:
    """True where a point is INSIDE the (closed) mesh, via the generalized
    winding number (robust to small gaps) — the pysdf-equivalent needed by
    filter_flame_intersections.py:115-118."""
    v = mesh.verts
    f = mesh.faces
    inside = np.zeros(len(points), bool)
    tri = v[f]  # [F, 3, 3]
    for s in range(0, len(points), chunk):
        p = points[s:s + chunk]
        a = tri[None, :, 0] - p[:, None]
        b = tri[None, :, 1] - p[:, None]
        c = tri[None, :, 2] - p[:, None]
        la = np.linalg.norm(a, axis=-1)
        lb = np.linalg.norm(b, axis=-1)
        lc = np.linalg.norm(c, axis=-1)
        num = np.einsum("pfi,pfi->pf", a, np.cross(b, c))
        den = (la * lb * lc + np.einsum("pfi,pfi->pf", a, b) * lc
               + np.einsum("pfi,pfi->pf", b, c) * la
               + np.einsum("pfi,pfi->pf", a, c) * lb)
        omega = 2.0 * np.arctan2(num, den)
        wn = omega.sum(axis=1) / (4.0 * np.pi)
        inside[s:s + chunk] = wn > 0.5
    return inside


def icosphere(subdiv: int = 0):
    """Unit icosahedron vertices (the Gaussian proxy shell of
    filter_flame_intersections.py:88-99)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    return verts / np.linalg.norm(verts, axis=-1, keepdims=True)


def filter_flame_intersections(model_path: str, flame_mesh_path: str,
                               iteration: int, sh_degree: int = 3,
                               label_threshold: float = 0.1) -> None:
    """Prune hair Gaussians intersecting the FLAME head: build an icosphere
    proxy per Gaussian (verts scaled by the covariance), test the proxy
    vertices against the head SDF, drop Gaussians with inside verts
    (filter_flame_intersections.py:88-121).  Writes point_cloud_filtered/."""
    src = os.path.join(model_path, "point_cloud_cropped",
                       f"iteration_{iteration}", "raw_point_cloud.ply")
    if not os.path.exists(src):
        src = os.path.join(model_path, "point_cloud",
                           f"iteration_{iteration}", "raw_point_cloud.ply")
    state = gm.load_ply(src, 0, sh_degree)
    p = state.params
    alive = np.asarray(state.aux.alive)
    labels = np.asarray(gm.get_label(p))[:, 0]
    is_hair = labels >= label_threshold

    import jax.numpy as jnp
    from gaussianhaircut_tpu.ops.quaternion import build_rotation
    xyz = np.asarray(p.xyz)
    scales = np.asarray(gm.get_scaling(p))
    rot = np.asarray(build_rotation(p.rotation))
    ico = icosphere()                                     # [12, 3]
    # proxy verts = ico * S @ R + mu (rows of R are principal axes)
    proxy = (np.einsum("vk,pk,pkj->pvj", ico, scales, rot) + xyz[:, None])

    head = mesh_util.load_obj(flame_mesh_path)
    flat = proxy.reshape(-1, 3)
    inside = mesh_sdf_sign(flat, head).reshape(len(xyz), -1).any(axis=1)

    keep = alive & ~(is_hair & inside)
    state = state.replace(aux=state.aux._replace(alive=jnp.asarray(keep)))
    out_dir = os.path.join(model_path, "point_cloud_filtered",
                           f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    gm.save_ply(state, os.path.join(out_dir, "point_cloud.ply"))


def resize_images(scene_path: str, factors=(2, 4)) -> None:
    """images_2/_4 (+ masks_2/_4 when present), reference resize_images.py."""
    from PIL import Image
    for sub, src_name in (("images", "images"), ("masks", "masks")):
        src = os.path.join(scene_path, src_name)
        if not os.path.isdir(src):
            continue
        walk = ([("", n) for n in sorted(os.listdir(src))
                 if os.path.isfile(os.path.join(src, n))]
                + [(d, n) for d in sorted(os.listdir(src))
                   if os.path.isdir(os.path.join(src, d))
                   for n in sorted(os.listdir(os.path.join(src, d)))])
        for f in factors:
            for d, n in walk:
                src_p = os.path.join(src, d, n)
                dst_dir = os.path.join(scene_path, f"{src_name}_{f}", d)
                os.makedirs(dst_dir, exist_ok=True)
                with Image.open(src_p) as im:
                    im.resize((im.width // f, im.height // f),
                              Image.LANCZOS).save(os.path.join(dst_dir, n))
