"""Scalp extraction: find the hair-covered (non-visible) head region and cut
a scalp submesh + UV diffusion mask.

Behavioral port of src/preprocessing/extract_non_visible_head_scalp.py:
38-243: rasterize the fitted FLAME head into every view, accumulate per-vertex
visibility under the (dilated) head-minus-hair mask, mark faces whose
probability of being *visible head* is low (they are under hair), cut that
region as the scalp, and paint the 256^2 UV diffusion mask.

Replaces the pytorch3d mesh rasterizer with a small numpy z-buffer (one-time
preprocessing, off the hot path).  The canonical NeuralHaircut scalp topology
(vertex ids + UVs) is used when its data files are supplied; otherwise the
scalp region is taken from the visibility statistics alone and UVs come from
a spherical parameterization of the cut.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from gaussianhaircut_tpu.utils import mesh as mesh_util


def rasterize_pix_to_face(verts_pix: np.ndarray, depths: np.ndarray,
                          faces: np.ndarray, width: int, height: int) -> np.ndarray:
    """Z-buffered face index per pixel ([-1] = background).

    verts_pix [V, 2], depths [V] (camera z), faces [F, 3].
    """
    zbuf = np.full((height, width), np.inf, np.float32)
    p2f = np.full((height, width), -1, np.int64)
    tri = verts_pix[faces]           # [F, 3, 2]
    triz = depths[faces]             # [F, 3]
    valid = (triz > 1e-4).all(axis=1)
    for fi in np.nonzero(valid)[0]:
        t = tri[fi]
        x0 = max(int(np.floor(t[:, 0].min())), 0)
        x1 = min(int(np.ceil(t[:, 0].max())) + 1, width)
        y0 = max(int(np.floor(t[:, 1].min())), 0)
        y1 = min(int(np.ceil(t[:, 1].max())) + 1, height)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        d = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float64)
        v0 = t[1] - t[0]
        v1 = t[2] - t[0]
        den = v0[0] * v1[1] - v1[0] * v0[1]
        if abs(den) < 1e-12:
            continue
        q = d - t[0]
        b1 = (q[:, 0] * v1[1] - v1[0] * q[:, 1]) / den
        b2 = (v0[0] * q[:, 1] - q[:, 0] * v0[1]) / den
        b0 = 1 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        if not inside.any():
            continue
        z = b0 * triz[fi, 0] + b1 * triz[fi, 1] + b2 * triz[fi, 2]
        px = d[inside].astype(np.int64)
        zi = z[inside]
        flat = px[:, 1] * width + px[:, 0]
        closer = zi < zbuf.reshape(-1)[flat]
        flat = flat[closer]
        zbuf.reshape(-1)[flat] = zi[closer]
        p2f.reshape(-1)[flat] = fi
    return p2f


def vertex_visibility(mesh: mesh_util.Mesh, K: np.ndarray, w2c: np.ndarray,
                      width: int, height: int, head_mask: np.ndarray):
    """(visible [V], visible_under_head_mask [V]) for one view."""
    v_cam = mesh.verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = v_cam[:, 2]
    proj = v_cam @ K[:3, :3].T
    pix = proj[:, :2] / np.maximum(proj[:, 2:3], 1e-9)
    p2f = rasterize_pix_to_face(pix, z, mesh.faces, width, height)

    vis = np.zeros(len(mesh.verts), bool)
    vis_head = np.zeros(len(mesh.verts), bool)
    seen = np.unique(p2f[p2f >= 0])
    vis[mesh.faces[seen].reshape(-1)] = True
    p2f_head = np.where(head_mask, p2f, -1)
    seen_h = np.unique(p2f_head[p2f_head >= 0])
    vis_head[mesh.faces[seen_h].reshape(-1)] = True
    return vis, vis_head


def paint_uv_mask(uvs: np.ndarray, faces: np.ndarray, size: int = 256) -> np.ndarray:
    """Rasterize scalp faces into the UV chart -> uint8 mask (the dif_mask
    contract; uvs in [-1, 1] like the NeuralHaircut uv map)."""
    import cv2
    img = np.zeros((size, size), np.uint8)
    pts = (size / 2.0 * (uvs + 1.0))
    for f in faces:
        poly = pts[f].astype(np.int32)
        cv2.fillPoly(img, [poly[:, ::-1]], 255)
    return np.flip(img.T, axis=0).copy()


# FLAME scalp left/right symmetry groups, indices into the canonical
# NeuralHaircut scalp-vertex ordering (data constants from
# extract_non_visible_head_scalp.py:178-200): each pair of rows is mirrored
# across the head midline; a group is treated as hair-covered if any member
# is, so the scalp cut stays symmetric under one-sided occlusion.
_SCALP_SYM_ROWS = [
    ([327, 304, 286, 264, 247, 235], [94, 114, 140, 156, 184, 201]),
    ([236, 251, 271, 294, 309, 329], [197, 179, 155, 138, 112, 92]),
    ([336, 315, 298, 277, 253, 237], [87, 111, 136, 154, 171, 194]),
    ([238, 255, 284, 301, 324, 343], [191, 165, 152, 125, 108, 84]),
    ([354, 330, 305, 285, 258, 239], [79, 99, 118, 144, 159, 189]),
]
_SCALP_SYM_PAIRS = (
    [414, 419, 425, 426, 422, 424, 421,
     412, 417, 428, 433, 434, 429, 420, 410, 402,
     403, 409, 415, 432, 437, 435, 423, 411, 398, 393, 387],
    [17, 15, 12, 10, 13, 8, 5,
     19, 16, 9, 3, 4, 11, 18, 23, 31,
     27, 24, 20, 7, 0, 1, 22, 28, 36, 43, 47],
)


def _apply_scalp_symmetry(hair_mask_scalp: np.ndarray) -> np.ndarray:
    """hair_mask_scalp [N_scalp] bool in canonical scalp-vertex order."""
    m = hair_mask_scalp.copy()
    n = len(m)
    for left, right in _SCALP_SYM_ROWS:
        idx = [i for i in left + right if i < n]
        if idx:
            v = m[idx].any()
            m[idx] = v
    li = [i for i in _SCALP_SYM_PAIRS[0] if i < n]
    ri = [i for i in _SCALP_SYM_PAIRS[1] if i < n]
    for i, j in zip(li, ri):
        v = m[i] | m[j]
        m[i] = v
        m[j] = v
    return m


def extract_scalp(flame_mesh_dir: str, data_dir: str, cams_matrices: dict,
                  masks_dir: str = "masks_2", prob_thr: float = 0.9,
                  n_views_thr: float = 0.2,
                  scalp_topology_dir: str | None = None) -> None:
    """Main entry (extract_non_visible_head_scalp.py:96-243 behavior).

    cams_matrices: image_name -> full projection matrix [4, 4] (row-vector,
    the cameras/{iter}_matrices.pkl contract).  Writes
    flame_mesh_dir/scalp_data/{scalp.obj, cut_scalp_verts.pickle,
    dif_mask.png}.
    """
    import cv2

    head = mesh_util.load_obj(os.path.join(flame_mesh_dir, "stage_3",
                                           "mesh_final.obj"))
    vis_total = np.zeros(len(head.verts))
    vis_head_total = np.zeros(len(head.verts))
    n_views = 0
    kernel = np.ones((5, 5), np.uint8)
    for name, full_proj in cams_matrices.items():
        hair_p = os.path.join(data_dir, masks_dir, "hair", f"{name}.png")
        body_p = os.path.join(data_dir, masks_dir, "body", f"{name}.png")
        if not (os.path.exists(hair_p) and os.path.exists(body_p)):
            continue
        hair = cv2.dilate(cv2.imread(hair_p, 0), kernel) / 255.0 >= 0.5
        body = cv2.dilate(cv2.imread(body_p, 0), kernel) / 255.0 >= 0.5
        head_mask = body & ~hair
        h, w = head_mask.shape
        # decompose the row-vector full projection: ndc = x_hom @ P
        # -> column-vector m = P.T; pixel K from ndc via ndc2Pix
        m = np.asarray(full_proj).T
        # view z for depth: recompute via the w2c part is not recoverable from
        # the projection alone, so rasterize in NDC depth (monotone in z).
        v_hom = np.concatenate([head.verts, np.ones((len(head.verts), 1))], 1)
        clip = v_hom @ np.asarray(full_proj)
        wc = np.maximum(clip[:, 3:4], 1e-9)
        ndc = clip[:, :3] / wc
        pix = np.stack([((ndc[:, 0] + 1) * w - 1) / 2,
                        ((ndc[:, 1] + 1) * h - 1) / 2], -1)
        depth = wc[:, 0]
        p2f = rasterize_pix_to_face(pix, depth, head.faces, w, h)
        vis = np.zeros(len(head.verts), bool)
        vis_h = np.zeros(len(head.verts), bool)
        seen = np.unique(p2f[p2f >= 0])
        if len(seen):
            vis[head.faces[seen].reshape(-1)] = True
        p2f_head = np.where(head_mask, p2f, -1)
        seen_h = np.unique(p2f_head[p2f_head >= 0])
        if len(seen_h):
            vis_h[head.faces[seen_h].reshape(-1)] = True
        vis_total += vis
        vis_head_total += vis_h
        n_views += 1

    if n_views == 0:
        raise FileNotFoundError("no usable views/masks for scalp extraction")

    prob_vis_head = vis_head_total / np.maximum(vis_total, 1)
    prob_hair = 1 - prob_vis_head
    scalp_vert_mask = (prob_hair > prob_thr) | (vis_total / n_views < n_views_thr)

    # optional canonical scalp restriction (NeuralHaircut topology files)
    uvs = None
    canonical_ids = None
    if scalp_topology_dir and os.path.exists(
            os.path.join(scalp_topology_dir, "new_scalp_vertex_idx.npy")):
        ids = np.load(os.path.join(scalp_topology_dir, "new_scalp_vertex_idx.npy"))
        canonical_ids = np.asarray(ids, np.int64)
        canonical = np.zeros(len(head.verts), bool)
        canonical[canonical_ids] = True
        # symmetrize in the canonical scalp-vertex ordering before cutting
        # (extract_non_visible_head_scalp.py:178-200)
        scalp_vert_mask[canonical_ids] = _apply_scalp_symmetry(
            scalp_vert_mask[canonical_ids])
        scalp_vert_mask &= canonical
        uv_path = os.path.join(scalp_topology_dir, "scalp_uvmap.npy")
        if os.path.exists(uv_path):
            uvs = np.load(uv_path)

    keep_faces = scalp_vert_mask[head.faces].all(axis=1)
    sub_faces = head.faces[keep_faces]
    used = np.unique(sub_faces)
    remap = -np.ones(len(head.verts), np.int64)
    remap[used] = np.arange(len(used))
    scalp_verts = head.verts[used]
    scalp_faces = remap[sub_faces]

    if uvs is not None:
        # scalp_uvmap.npy rows follow the CANONICAL scalp-vertex ordering
        # (row k <-> new_scalp_vertex_idx[k], values in [-1, 1]); remap them
        # to the cut submesh's vertex order (used is a subset of the
        # canonical ids because scalp_vert_mask was restricted above)
        row_of = -np.ones(len(head.verts), np.int64)
        row_of[canonical_ids] = np.arange(len(canonical_ids))
        uvs = np.asarray(uvs, np.float64)[row_of[used]]

    if uvs is None:
        # spherical parameterization of the cut region
        c = scalp_verts.mean(0)
        d = scalp_verts - c
        d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        uvs = np.stack([np.arctan2(d[:, 0], d[:, 2]) / np.pi,
                        d[:, 1]], -1)

    out = os.path.join(flame_mesh_dir, "scalp_data")
    os.makedirs(out, exist_ok=True)
    mesh_util.save_obj(os.path.join(out, "scalp.obj"), scalp_verts,
                       scalp_faces, (uvs + 1) / 2, scalp_faces)
    with open(os.path.join(out, "cut_scalp_verts.pickle"), "wb") as f:
        pickle.dump(used.tolist(), f)
    mask = paint_uv_mask(uvs, scalp_faces)
    import PIL.Image
    PIL.Image.fromarray(mask).save(os.path.join(out, "dif_mask.png"))
