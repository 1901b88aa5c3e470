"""Checkpoint IO for the pretrained priors (strand VAE + latent diffusion).

The reference loads NeuralHaircut's pretrained strand prior from
``ext/NeuralHaircut/pretrained_models/strand_prior/strand_ckpt.pth``
(gaussian_model_strands.py:80-81) and a pretrained k-diffusion denoiser via
the strand generator's ``model_ema`` (gaussian_model_strands.py:506-513).
Here the equivalent artifact is a single ``.npz`` holding flax parameter
pytrees under flat ``<module>/<path>/<leaf>`` keys, produced offline by
``tools/convert_neuralhaircut_ckpt.py`` (distillation-based — upstream and
TPU topologies differ, so weights are transferred by fitting our modules to
the upstream modules' input/output behavior, not by key renaming).

Schema (all float32):
  encoder/...    StrandEncoder params   (local points [L,3] -> latent [128])
  decoder/...    StrandDecoder params   (geometry latent [64] -> segs [L-1,3])
  denoiser/...   Denoiser (UNetV1) params over the 32x32x64 latent image
Any subset of the three sections may be present.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_SECTIONS = ("encoder", "decoder", "denoiser")


def _flatten(tree, prefix: str) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "".join(
            f"/{p.key}" if hasattr(p, "key") else f"/{p.idx}" for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_prior(path: str, prior: dict) -> None:
    """prior: any subset of {"encoder", "decoder", "denoiser"} -> flax params."""
    blob = {}
    for name in _SECTIONS:
        if name in prior and prior[name] is not None:
            blob.update(_flatten(prior[name], name))
    unknown = set(prior) - set(_SECTIONS)
    if unknown:
        raise ValueError(f"unknown prior sections: {sorted(unknown)}")
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path, **blob)


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def load_prior(path: str) -> dict:
    """Load {"encoder": ..., "decoder": ..., "denoiser": ...} (present
    sections only) from an npz written by save_prior / the converter."""
    d = dict(np.load(path))
    out = {}
    for name in _SECTIONS:
        section = {k[len(name) + 1:]: v for k, v in d.items()
                   if k.startswith(name + "/")}
        if section:
            out[name] = _unflatten(section)
    if not out:
        raise ValueError(
            f"{path} holds no encoder/decoder/denoiser sections "
            f"(keys: {sorted(d)[:5]}...)")
    return out


def load_strand_prior(path: str) -> dict:
    """The stage-3 SDS prior: requires at least the encoder section
    (gaussian_model_strands.py:80-81's strand_ckpt.pth analog)."""
    prior = load_prior(path)
    if "encoder" not in prior:
        raise ValueError(f"{path} has no 'encoder/...' keys; stage-3 SDS "
                         "needs the strand encoder")
    return prior


def init_prior(scfg, key) -> dict:
    """Fresh (untrained) prior with the correct shapes — the from-scratch
    fallback when no converted upstream checkpoint is available."""
    from gaussianhaircut_tpu.models.diffusion import Denoiser, DiffusionConfig
    from gaussianhaircut_tpu.models.strand_prior import (
        GEOMETRY_DIM, StrandDecoder, StrandEncoder)

    k_enc, k_dec, k_den = jax.random.split(key, 3)
    enc = StrandEncoder()
    dec = StrandDecoder(length=scfg.strand_length)
    den = Denoiser(DiffusionConfig(input_channels=GEOMETRY_DIM,
                                   input_size=scfg.diffusion_input))
    return {
        "encoder": enc.init(k_enc, jnp.zeros((1, scfg.strand_length, 3))),
        "decoder": dec.init(k_dec, jnp.zeros((1, GEOMETRY_DIM))),
        "denoiser": den.init(k_den),
    }
