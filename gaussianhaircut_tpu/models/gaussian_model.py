"""Unstructured 3DGS model as a fixed-capacity JAX pytree.

The reference's ``GaussianModel`` (src/scene/gaussian_model.py:28-741) holds
dynamically-sized torch Parameters and performs optimizer-state surgery when
densifying.  Under XLA we need static shapes, so the TPU-native design is:

- parameter arrays have a fixed capacity ``C`` with an ``alive`` mask
  (SURVEY.md §7.1, fact 2); dead slots render as invalid (culled) and receive
  exactly zero gradient;
- densify/clone/split/prune are masked scatters into free slots inside jit
  (train/densify.py), including the Adam moment resets the reference does by
  replacing optimizer tensors (gaussian_model.py:596-677);
- activations and parameterizations match the reference exactly
  (gaussian_model.py:30-43): scaling=exp, opacity/label=sigmoid,
  rotation=L2-normalize, orient_conf=exp.

PLY I/O reproduces the reference's field layout byte-for-byte
(gaussian_model.py:458-514) so checkpoints interoperate.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gaussianhaircut_tpu.ops import sh as sh_ops
from gaussianhaircut_tpu.ops.knn import mean_knn_sq_dist
from gaussianhaircut_tpu.scene import ply as ply_io


def inverse_sigmoid(x):
    return np.log(x / (1 - x)) if isinstance(x, (float, np.ndarray)) else jnp.log(x / (1 - x))


class GaussianParams(NamedTuple):
    """Learnable parameters, capacity-padded [C, ...]."""
    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3] log-scale
    rotation: jnp.ndarray       # [C, 4] unnormalized quat (w, x, y, z)
    opacity: jnp.ndarray        # [C, 1] logit
    label: jnp.ndarray          # [C, 1] logit (hair probability)
    orient_conf: jnp.ndarray    # [C, 1] log
    viewspace: jnp.ndarray      # [C, 3] zeros; gradient port for the NDC means
                                # (the JAX analog of retain_grad on means2D,
                                # gaussian_renderer/__init__.py:30-34)


class GaussianAux(NamedTuple):
    """Non-learnable model state."""
    alive: jnp.ndarray             # [C] bool
    max_radii2d: jnp.ndarray       # [C] float
    xyz_grad_accum: jnp.ndarray    # [C] float (sum of viewspace grad norms)
    denom: jnp.ndarray             # [C] float


@flax.struct.dataclass
class GaussianModelState:
    params: GaussianParams
    aux: GaussianAux
    active_sh_degree: jnp.ndarray  # int32 scalar
    max_sh_degree: int = flax.struct.field(pytree_node=False)
    spatial_lr_scale: float = flax.struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.aux.alive)


# ------------------------------------------------------------- activations --

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation_matrix(p: GaussianParams) -> jnp.ndarray:
    from gaussianhaircut_tpu.ops.quaternion import build_rotation
    return build_rotation(p.rotation)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_label(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.label)


def get_orient_conf(p: GaussianParams) -> jnp.ndarray:
    # exp like the reference (gaussian_model.py:43), but clamped: the
    # aleatoric -log(conf) term pushes conf up unboundedly wherever the
    # orientation loss vanishes, and exp(>88) = inf NaN-poisons the render.
    # exp(30) ~ 1e13 is far beyond any useful confidence.
    return jnp.exp(jnp.clip(p.orient_conf, -30.0, 30.0))


def get_features(p: GaussianParams) -> jnp.ndarray:
    """[C, K, 3] SH coefficients (dc first, reference get_features)."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


# ------------------------------------------------------------------- init ---

def create_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                    max_sh_degree: int, spatial_lr_scale: float) -> GaussianModelState:
    """Initialize from an SfM point cloud (gaussian_model.py:399-424):
    scales = log sqrt(mean sq dist to 3-NN), opacity = 0.1, label = 0.5."""
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"capacity {capacity} < initial points {n}")
    k = (max_sh_degree + 1) ** 2

    dist2 = np.asarray(mean_knn_sq_dist(jnp.asarray(points, jnp.float32)))
    dist2 = np.maximum(dist2, 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((capacity - n,) + x.shape[1:], fill, x.dtype)], 0)

    f_dc = np.asarray(sh_ops.rgb2sh(jnp.asarray(colors, jnp.float32)))[:, None, :]
    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0

    params = GaussianParams(
        xyz=jnp.asarray(pad(points.astype(np.float32))),
        features_dc=jnp.asarray(pad(f_dc)),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=jnp.asarray(pad(scales.astype(np.float32))),
        rotation=jnp.asarray(pad(rot, fill=0.0)).at[n:, 0].set(1.0),
        opacity=jnp.full((capacity, 1), float(inverse_sigmoid(0.1)), jnp.float32),
        label=jnp.full((capacity, 1), float(inverse_sigmoid(0.5)), jnp.float32),
        orient_conf=jnp.zeros((capacity, 1), jnp.float32),
        viewspace=jnp.zeros((capacity, 3), jnp.float32),
    )
    alive = jnp.arange(capacity) < n
    aux = GaussianAux(alive=alive,
                      max_radii2d=jnp.zeros(capacity, jnp.float32),
                      xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
                      denom=jnp.zeros(capacity, jnp.float32))
    return GaussianModelState(params, aux, jnp.asarray(0, jnp.int32),
                              max_sh_degree, float(spatial_lr_scale))


# ---------------------------------------------------------------- PLY I/O ---

def save_ply(state: GaussianModelState, path: str, to_numpy=np.asarray) -> None:
    """Write raw_<name> (with label) and <name> (without label) next to each
    other, exactly like gaussian_model.py:479-514.  Only alive rows are
    exported."""
    p = state.params
    alive = to_numpy(state.aux.alive)
    idx = np.nonzero(alive)[0]
    xyz = to_numpy(p.xyz)[idx]
    n = xyz.shape[0]
    f_dc = to_numpy(p.features_dc)[idx].transpose(0, 2, 1).reshape(n, -1)
    f_rest = to_numpy(p.features_rest)[idx].transpose(0, 2, 1).reshape(n, -1)
    opac = to_numpy(p.opacity)[idx]
    oconf = to_numpy(p.orient_conf)[idx]
    label = to_numpy(p.label)[idx]
    scale = to_numpy(p.scaling)[idx]
    rot = to_numpy(p.rotation)[idx]

    def fields(with_label):
        names = ["x", "y", "z", "nx", "ny", "nz"]
        names += [f"f_dc_{i}" for i in range(f_dc.shape[1])]
        names += [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        names += ["opacity", "orient_conf"]
        if with_label:
            names.append("label_0")
        names += [f"scale_{i}" for i in range(3)] + [f"rot_{i}" for i in range(4)]
        return names

    def build(with_label):
        cols = [xyz, np.zeros_like(xyz), f_dc, f_rest, opac, oconf]
        if with_label:
            cols.append(label)
        cols += [scale, rot]
        data = np.concatenate(cols, axis=1).astype(np.float32)
        v = np.empty(n, dtype=[(f, "<f4") for f in fields(with_label)])
        for i, f in enumerate(fields(with_label)):
            v[f] = data[:, i]
        return v

    d = os.path.dirname(path)
    name = os.path.basename(path)
    ply_io.write_ply(os.path.join(d, f"raw_{name}"), build(True))
    ply_io.write_ply(path, build(False))


def load_ply(path: str, capacity: int, max_sh_degree: int,
             spatial_lr_scale: float = 1.0) -> GaussianModelState:
    """Load a (raw_)point_cloud.ply in the reference layout
    (gaussian_model.py:521-579)."""
    v = ply_io.read_ply(path)["vertex"]
    n = len(v)
    if capacity < n:
        capacity = -(-n // 256) * 256
    k = (max_sh_degree + 1) ** 2
    names = v.dtype.names

    xyz = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    opacity = np.asarray(v["opacity"], np.float32)[:, None]
    oconf = (np.asarray(v["orient_conf"], np.float32)[:, None]
             if "orient_conf" in names else np.zeros((n, 1), np.float32))
    label = (np.asarray(v["label_0"], np.float32)[:, None]
             if "label_0" in names else np.zeros((n, 1), np.float32))
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], -1).astype(np.float32)[:, None, :]
    rest_names = sorted((x for x in names if x.startswith("f_rest_")),
                        key=lambda x: int(x.split("_")[-1]))
    f_rest = (np.stack([v[x] for x in rest_names], -1).astype(np.float32)
              .reshape(n, 3, k - 1).transpose(0, 2, 1)
              if rest_names else np.zeros((n, k - 1, 3), np.float32))
    scale = np.stack([v[f"scale_{i}"] for i in range(3)], -1).astype(np.float32)
    rot = np.stack([v[f"rot_{i}"] for i in range(4)], -1).astype(np.float32)

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((capacity - n,) + x.shape[1:], fill, x.dtype)], 0)

    params = GaussianParams(
        xyz=jnp.asarray(pad(xyz)),
        features_dc=jnp.asarray(pad(f_dc)),
        features_rest=jnp.asarray(pad(f_rest)),
        scaling=jnp.asarray(pad(scale)),
        rotation=jnp.asarray(pad(rot)).at[n:, 0].set(1.0),
        opacity=jnp.asarray(pad(opacity, fill=-10.0)),
        label=jnp.asarray(pad(label)),
        orient_conf=jnp.asarray(pad(oconf)),
        viewspace=jnp.zeros((capacity, 3), jnp.float32),
    )
    alive = jnp.arange(capacity) < n
    aux = GaussianAux(alive=alive,
                      max_radii2d=jnp.zeros(capacity, jnp.float32),
                      xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
                      denom=jnp.zeros(capacity, jnp.float32))
    return GaussianModelState(params, aux, jnp.asarray(max_sh_degree, jnp.int32),
                              max_sh_degree, spatial_lr_scale)


# ------------------------------------------------------------- checkpoints --

def capture(state: GaussianModelState) -> dict:
    """Checkpoint dict (the analog of gaussian_model.py:65-82's capture tuple;
    optimizer state is saved by the trainer alongside)."""
    out = {f"params.{k}": np.asarray(v) for k, v in state.params._asdict().items()}
    out.update({f"aux.{k}": np.asarray(v) for k, v in state.aux._asdict().items()})
    out["active_sh_degree"] = np.asarray(state.active_sh_degree)
    out["max_sh_degree"] = np.asarray(state.max_sh_degree)
    out["spatial_lr_scale"] = np.asarray(state.spatial_lr_scale)
    return out


def restore(d: dict) -> GaussianModelState:
    params = GaussianParams(**{k.split(".", 1)[1]: jnp.asarray(v)
                               for k, v in d.items() if k.startswith("params.")})
    aux = GaussianAux(**{k.split(".", 1)[1]: jnp.asarray(v)
                         for k, v in d.items() if k.startswith("aux.")})
    return GaussianModelState(params, aux,
                              jnp.asarray(d["active_sh_degree"], jnp.int32),
                              int(d["max_sh_degree"]), float(d["spatial_lr_scale"]))
