"""Optimizable textured strands: scalp-UV neural texture -> latent strands.

Role-equivalent rebuild of NeuralHaircut's ``OptimizableTexturedStrands``
(external clone; configuration and call surface per
src/arguments/hair_strands_textured.yaml:7-16 and
src/scene/gaussian_model_latent_strands.py:72-78,442-453 /
gaussian_model_strands.py:537):

- a learnable texture over the scalp UV chart: ``texture_size``^2 x
  (64 geometry + 65 appearance) channels;
- each forward samples ``num_strands`` scalp locations, bilinearly reads
  their descriptors, decodes 64-d geometry codes into local strand polylines
  (StrandDecoder, divided by ``scale_decoder``), and places them in world
  space through per-root tangent frames:  p_world = origin + l2w @ p_local;
- the appearance descriptor's first channel is the hair label, the remaining
  64 feed the color decoder downstream;
- optional diffusion prior (HAAR-style) supplies an L_diff regularizer over a
  ``diffusion_input``^2 latent image resampled from guiding strands.

TPU framing: the scalp is pre-sampled into a fixed pool of candidate roots on
the host (mesh ops are init-time, off the hot path — SURVEY.md §2.1); the
per-iteration work (choice, bilinear gather, MLP decode, cumsum) is all
batched jnp inside the train step.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.models.strand_prior import (
    GEOMETRY_DIM, STRAND_LENGTH, ColorDecoder, StrandDecoder,
    points_from_segments,
)
from gaussianhaircut_tpu.utils import mesh as mesh_util


@dataclasses.dataclass(frozen=True)
class TexturedStrandsConfig:
    """hair_strands_textured.yaml:7-16 knobs."""
    num_strands: int = 10_000
    max_num_strands: int = 50_000
    texture_size: int = 256
    geometry_descriptor_size: int = GEOMETRY_DIM
    appearance_descriptor_size: int = 65
    strand_length: int = STRAND_LENGTH
    sh_degree: int = 3
    scale_decoder: float = 100.0     # local-frame normalization constant
    diffusion_input: int = 32
    use_diffusion: bool = False
    num_guiding_strands: int = 1000
    pool_size: int = 200_000         # pre-sampled scalp root candidates


class ScalpPool(NamedTuple):
    """Host-precomputed scalp root candidates (device arrays)."""
    origins: jnp.ndarray       # [S, 3]
    uvs: jnp.ndarray           # [S, 2] in [0, 1]
    local2world: jnp.ndarray   # [S, 3, 3]

    @staticmethod
    def from_mesh(mesh: mesh_util.Mesh, pool_size: int, seed: int = 0,
                  scalp_vert_ids=None) -> "ScalpPool":
        rng = np.random.default_rng(seed)
        if scalp_vert_ids is not None:
            keep = np.zeros(len(mesh.verts), bool)
            keep[np.asarray(scalp_vert_ids)] = True
            fmask = keep[mesh.faces].all(axis=1)
            mesh = mesh_util.Mesh(mesh.verts, mesh.faces[fmask], mesh.uvs,
                                  mesh.face_uvs[fmask] if mesh.face_uvs is not None else None)
        pts, fidx, bary = mesh_util.sample_surface(mesh, pool_size, rng)
        if mesh.uvs is not None and mesh.face_uvs is not None:
            uvs = mesh_util.interpolate_uv(mesh, fidx, bary)
        else:
            # fall back to an area-preserving planar projection of the scalp
            ext_min = mesh.verts.min(0)
            ext = mesh.verts.max(0) - ext_min
            uvs = (pts[:, [0, 2]] - ext_min[[0, 2]]) / np.maximum(ext[[0, 2]], 1e-9)
        frames = mesh_util.tangent_frames(mesh, fidx)
        return ScalpPool(jnp.asarray(pts, jnp.float32),
                         jnp.asarray(np.clip(uvs, 0, 1), jnp.float32),
                         jnp.asarray(frames, jnp.float32))

    @staticmethod
    def from_flame_dir(flame_mesh_dir: str, data_dir: str, cfg,
                       seed: int = 0) -> "ScalpPool":
        """Load the FLAME-fitting scalp (head_prior.obj or final mesh +
        cut_scalp_verts.pickle, the contract of
        preprocessing/extract_non_visible_head_scalp.py)."""
        candidates = [os.path.join(flame_mesh_dir, "scalp_data", "scalp.obj"),
                      os.path.join(flame_mesh_dir, "head_prior.obj"),
                      os.path.join(flame_mesh_dir, "stage_3", "mesh_final.obj")]
        path = next((c for c in candidates if os.path.exists(c)), None)
        if path is None:
            raise FileNotFoundError(f"no scalp mesh under {flame_mesh_dir}")
        mesh = mesh_util.load_obj(path)
        ids = None
        cut = os.path.join(flame_mesh_dir, "scalp_data", "cut_scalp_verts.pickle")
        if "scalp" not in os.path.basename(path) and os.path.exists(cut):
            with open(cut, "rb") as f:
                ids = pickle.load(f)
        return ScalpPool.from_mesh(mesh, cfg.pool_size, seed, ids)


class StrandsOutput(NamedTuple):
    points: jnp.ndarray        # [N, L, 3] world
    p_local: jnp.ndarray       # [N, L, 3] local (decoder frame)
    uvs: jnp.ndarray           # [N, 2]
    local2world: jnp.ndarray   # [N, 3, 3]
    z_geom: jnp.ndarray        # [N, 64]
    z_app: jnp.ndarray         # [N, app-1] appearance code
    label: jnp.ndarray         # [N] first appearance channel


def init_params(cfg: TexturedStrandsConfig, key) -> dict:
    kd, kt = jax.random.split(key)
    decoder = StrandDecoder(length=cfg.strand_length)
    dec_params = decoder.init(kd, jnp.zeros((1, cfg.geometry_descriptor_size)))
    c = cfg.geometry_descriptor_size + cfg.appearance_descriptor_size
    texture = 0.01 * jax.random.normal(
        kt, (cfg.texture_size, cfg.texture_size, c), jnp.float32)
    return {"texture": texture, "decoder": dec_params}


def sample_texture(texture: jnp.ndarray, uvs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample [T, T, C] at uv in [0, 1]^2 -> [N, C]."""
    t = texture.shape[0]
    xy = uvs * (t - 1)
    x0 = jnp.clip(jnp.floor(xy).astype(jnp.int32), 0, t - 2)
    frac = jnp.clip(xy - x0, 0.0, 1.0)
    fx, fy = frac[:, 0:1], frac[:, 1:2]
    c00 = texture[x0[:, 1], x0[:, 0]]
    c01 = texture[x0[:, 1], x0[:, 0] + 1]
    c10 = texture[x0[:, 1] + 1, x0[:, 0]]
    c11 = texture[x0[:, 1] + 1, x0[:, 0] + 1]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def generate_strands(params: dict, pool: ScalpPool,
                     cfg: TexturedStrandsConfig, key,
                     num_strands: int | None = None) -> StrandsOutput:
    """The forward(iter)/forward_inference(n) equivalent
    (gaussian_model_latent_strands.py:442-453)."""
    n = num_strands or cfg.num_strands
    idx = jax.random.choice(key, pool.origins.shape[0], (n,), replace=False)
    origins = pool.origins[idx]
    uvs = pool.uvs[idx]
    l2w = pool.local2world[idx]

    z = sample_texture(params["texture"], uvs)
    g = cfg.geometry_descriptor_size
    z_geom = z[:, :g]
    label = z[:, g]
    z_app = z[:, g + 1:]

    decoder = StrandDecoder(length=cfg.strand_length)
    segs_local = decoder.apply(params["decoder"], z_geom) / cfg.scale_decoder
    p_local = points_from_segments(jnp.zeros_like(origins)[:, None, :], segs_local)
    world = origins[:, None, :] + jnp.einsum("nij,nlj->nli", l2w, p_local)
    return StrandsOutput(world, p_local, uvs, l2w, z_geom, z_app, label)


def encode_strands(encoder_params, p_local: jnp.ndarray,
                   cfg: TexturedStrandsConfig) -> jnp.ndarray:
    """Frozen-encoder geometry codes for guiding strands
    (gaussian_model_strands.py:463)."""
    from gaussianhaircut_tpu.models.strand_prior import StrandEncoder
    enc = StrandEncoder()
    return enc.apply(encoder_params, p_local * cfg.scale_decoder)[:, :GEOMETRY_DIM]


def synthetic_scalp_pool(pool_size: int = 50_000, seed: int = 0) -> ScalpPool:
    """A hemisphere scalp for tests/toy runs (no FLAME fitting needed)."""
    rng = np.random.default_rng(seed)
    u = rng.random(pool_size)
    v = rng.random(pool_size)
    theta = np.arccos(np.clip(1 - 0.5 * u, -1, 1))   # polar cap
    phi = 2 * np.pi * v
    n = np.stack([np.sin(theta) * np.cos(phi), np.cos(theta),
                  np.sin(theta) * np.sin(phi)], -1)
    pts = n * 0.1 + np.array([0, 0.05, 0])
    up = np.array([0.0, 1.0, 0.0])
    t = np.cross(up[None], n)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = np.cross(n, t)
    frames = np.stack([t, b, n], axis=-1)
    uvs = np.stack([u, v], -1)
    return ScalpPool(jnp.asarray(pts, jnp.float32), jnp.asarray(uvs, jnp.float32),
                     jnp.asarray(frames, jnp.float32))
