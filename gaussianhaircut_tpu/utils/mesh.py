"""Minimal mesh utilities: OBJ I/O (with UVs), area sampling, scalp frames.

Used by the textured-strands generator (scalp geometry from the FLAME-fitting
head_prior.obj) and by preprocessing filters.  No external mesh deps.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Mesh(NamedTuple):
    verts: np.ndarray        # [V, 3]
    faces: np.ndarray        # [F, 3] vertex indices
    uvs: np.ndarray | None   # [T, 2]
    face_uvs: np.ndarray | None  # [F, 3] uv indices


def load_obj(path: str) -> Mesh:
    verts, uvs, faces, face_uvs = [], [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                idx = []
                tidx = []
                for tok in line.split()[1:]:
                    parts = tok.split("/")
                    idx.append(int(parts[0]) - 1)
                    if len(parts) > 1 and parts[1]:
                        tidx.append(int(parts[1]) - 1)
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
                    if tidx:
                        face_uvs.append([tidx[0], tidx[k], tidx[k + 1]])
    return Mesh(np.asarray(verts, np.float64), np.asarray(faces, np.int64),
                np.asarray(uvs, np.float64) if uvs else None,
                np.asarray(face_uvs, np.int64) if face_uvs else None)


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray,
             uvs=None, face_uvs=None) -> None:
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if uvs is not None:
            for t in uvs:
                f.write(f"vt {t[0]} {t[1]}\n")
        for i, face in enumerate(faces):
            if uvs is not None and face_uvs is not None:
                t = face_uvs[i]
                f.write(f"f {face[0]+1}/{t[0]+1} {face[1]+1}/{t[1]+1} {face[2]+1}/{t[2]+1}\n")
            else:
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")


def face_areas(mesh: Mesh) -> np.ndarray:
    v = mesh.verts
    a = v[mesh.faces[:, 1]] - v[mesh.faces[:, 0]]
    b = v[mesh.faces[:, 2]] - v[mesh.faces[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=-1)


def face_normals(mesh: Mesh) -> np.ndarray:
    v = mesh.verts
    n = np.cross(v[mesh.faces[:, 1]] - v[mesh.faces[:, 0]],
                 v[mesh.faces[:, 2]] - v[mesh.faces[:, 0]])
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def sample_surface(mesh: Mesh, n: int, rng: np.random.Generator):
    """Area-weighted surface sampling.  Returns (points [n,3], face idx [n],
    barycentric [n,3])."""
    areas = face_areas(mesh)
    probs = areas / areas.sum()
    fidx = rng.choice(len(probs), size=n, p=probs)
    u = rng.random(n)
    v = rng.random(n)
    flip = u + v > 1
    u[flip] = 1 - u[flip]
    v[flip] = 1 - v[flip]
    bary = np.stack([1 - u - v, u, v], axis=-1)
    pts = np.einsum("nk,nkd->nd", bary, mesh.verts[mesh.faces[fidx]])
    return pts, fidx, bary


def interpolate_uv(mesh: Mesh, fidx: np.ndarray, bary: np.ndarray) -> np.ndarray:
    assert mesh.uvs is not None and mesh.face_uvs is not None
    return np.einsum("nk,nkd->nd", bary, mesh.uvs[mesh.face_uvs[fidx]])


def tangent_frames(mesh: Mesh, fidx: np.ndarray) -> np.ndarray:
    """Per-sample local->world rotation [n, 3, 3] with columns
    (tangent, bitangent, normal).  Tangent follows the UV u-direction when UVs
    exist, else the first edge."""
    v = mesh.verts
    tri = v[mesh.faces[fidx]]                      # [n, 3, 3]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    if mesh.uvs is not None and mesh.face_uvs is not None:
        uv = mesh.uvs[mesh.face_uvs[fidx]]
        du1 = uv[:, 1] - uv[:, 0]
        du2 = uv[:, 2] - uv[:, 0]
        det = du1[:, 0] * du2[:, 1] - du1[:, 1] * du2[:, 0]
        det = np.where(np.abs(det) < 1e-12, 1.0, det)
        t = (du2[:, 1:2] * e1 - du1[:, 1:2] * e2) / det[:, None]
    else:
        t = e1
    t = t - n * np.sum(t * n, axis=-1, keepdims=True)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = np.cross(n, t)
    return np.stack([t, b, n], axis=-1)
