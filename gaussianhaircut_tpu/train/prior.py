"""Self-distilled SDS strand prior.

The reference's stage-3 SDS term uses two pretrained externals: the frozen
NeuralHaircut strand Encoder (``strand_ckpt.pth``,
src/scene/gaussian_model_strands.py:80-81) and a diffusion denoiser trained
during stage 2 (gaussian_model_strands.py:456-515).  When no upstream
checkpoint is available (zero-egress environments), this module provides the
self-contained equivalent: a FIXED deterministically-initialized StrandEncoder
defines the latent space, and an EDM denoiser is distilled on HAAR-style
latent images of a given strand set (normally the stage-2 generator output),
so SDS regularizes stage-3 refinement toward the stage-2 geometry
distribution — the same role the reference's pretrained prior plays
(train_strands.py:128-147, lambda_sds=0.01 at run.sh:195).

Converted upstream weights (tools/convert_neuralhaircut_ckpt.py) drop into the
same ``{"encoder", "denoiser"}`` pytree contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models.diffusion import (
    Denoiser, DiffusionConfig, sds_latent_image,
)
from gaussianhaircut_tpu.models.strand_prior import GEOMETRY_DIM, StrandEncoder
from gaussianhaircut_tpu.train import optim


def encode_strands(enc_params, points, origins, local2world, scale_decoder):
    """World polylines -> (z_geom [N, 64], v_local [N, L-1, 3]) in the
    encoder's local frame (the inverse of the generator placement,
    gaussian_model_strands.py:456-473)."""
    enc = StrandEncoder()
    inv_l2w = jnp.linalg.inv(local2world)
    p_local = jnp.einsum("nij,nlj->nli", inv_l2w, points - origins)
    z = enc.apply(enc_params, p_local * scale_decoder)[:, :GEOMETRY_DIM]
    v_local = (p_local[:, 1:] - p_local[:, :-1]) * scale_decoder
    return z, v_local


def pretrain_strand_decoder(points, local2world, scfg, *, steps: int, key,
                            lr: float = 1e-3, batch: int = 512,
                            encoder_seed: int = 11) -> tuple[dict, dict]:
    """Pretrain the StrandDecoder to invert the (fixed) StrandEncoder on a
    strand set — the in-environment stand-in for the converted upstream
    decoder checkpoint (decoder_checkpoint_path,
    hair_strands_textured.yaml:9 / gaussian_model_latent_strands.py's
    pretrained strands_generator): stage 2 then starts from a decoder that
    already spans plausible strand geometry instead of random init, which is
    the property the reference's pretraining provides.

    Returns ({"decoder": params}, info) — feed the dict to
    ``stage2.train(prior_params=...)`` / ``stage2.warm_start``.
    """
    from gaussianhaircut_tpu.models.strand_prior import StrandDecoder

    n, length = points.shape[0], points.shape[1]
    enc = StrandEncoder()
    enc_params = enc.init(jax.random.PRNGKey(encoder_seed),
                          jnp.zeros((1, length, 3)))
    z_all, v_local = encode_strands(enc_params, points, points[:, :1],
                                    local2world, scfg.scale_decoder)
    dec = StrandDecoder(length=length)
    dparams = dec.init(jax.random.fold_in(key, 0),
                       jnp.zeros((1, GEOMETRY_DIM)))
    dopt = optim.adam_init(dparams)
    bs = min(batch, n)

    @jax.jit
    def step(dparams, dopt, key):
        idx = jax.random.randint(key, (bs,), 0, n)
        z = jax.lax.stop_gradient(z_all[idx])
        target = jax.lax.stop_gradient(v_local[idx])

        def loss_fn(p):
            pred = dec.apply(p, z)
            return jnp.mean((pred - target) ** 2)

        lval, grads = jax.value_and_grad(loss_fn)(dparams)
        ups, dopt = optim.adam_update(grads, dopt,
                                      jax.tree.map(lambda _: lr, grads))
        return jax.tree.map(lambda p, u: p + u, dparams, ups), dopt, lval

    l0 = lval = None
    for i in range(steps):
        dparams, dopt, lval = step(dparams, dopt, jax.random.fold_in(key, 1 + i))
        if i == 0:
            l0 = float(lval)
    info = {"decoder_pretrain_loss_start": (round(l0, 5)
                                            if l0 is not None else None),
            "decoder_pretrain_loss_end": (round(float(lval), 5)
                                          if lval is not None else None),
            "decoder_pretrain_steps": steps}
    return {"decoder": dparams}, info


def distill_strand_prior(points, uvs, local2world, scfg, *, steps: int,
                         key, lr: float = 1e-4, num_guiding: int = 1000,
                         encoder_seed: int = 11,
                         progress_callback=None) -> tuple[dict, dict]:
    """Train ``{"encoder", "denoiser"}`` on a strand set.

    points [N, L, 3] world; uvs [N, 2] in [0, 1]; local2world [N, 3, 3].
    The encoder is fixed (random init from ``encoder_seed``); the denoiser is
    trained on latent images of ``num_guiding``-strand subsets for ``steps``
    Adam steps.  Returns (prior, info) where info carries the start/end
    denoiser loss for artifact reporting.
    """
    n, length = points.shape[0], points.shape[1]
    enc = StrandEncoder()
    enc_params = enc.init(jax.random.PRNGKey(encoder_seed),
                          jnp.zeros((1, length, 3)))
    z_all, v_local = encode_strands(enc_params, points, points[:, :1],
                                    local2world, scfg.scale_decoder)
    uvs_pm1 = jnp.asarray(2.0 * uvs - 1.0, jnp.float32)
    guide = min(num_guiding, n)

    den = Denoiser(DiffusionConfig(input_channels=GEOMETRY_DIM,
                                   input_size=scfg.diffusion_input))
    dparams = den.init(jax.random.fold_in(key, 0))
    dopt = optim.adam_init(dparams)

    @jax.jit
    def prior_step(dparams, dopt, key):
        k_lat, k_noise, k_sig = jax.random.split(key, 3)
        idx = jax.random.randint(k_lat, (guide,), 0, n)
        x0 = sds_latent_image(z_all[idx], uvs_pm1[idx], v_local[idx],
                              scfg.diffusion_input)[None]
        noise = jax.random.normal(k_noise, x0.shape)
        sigma = den.sample_density(k_sig, (1,))
        lval, grads = jax.value_and_grad(
            lambda p: den.loss(p, x0, noise, sigma))(dparams)
        ups, dopt = optim.adam_update(grads, dopt,
                                      jax.tree.map(lambda _: lr, grads))
        return jax.tree.map(lambda p, u: p + u, dparams, ups), dopt, lval

    l0 = lval = None
    for i in range(steps):
        dparams, dopt, lval = prior_step(dparams, dopt,
                                         jax.random.fold_in(key, 1 + i))
        if i == 0:
            l0 = float(lval)
        if progress_callback is not None:
            progress_callback(i, float(lval))
    info = {"prior_loss_start": round(l0, 4) if l0 is not None else None,
            "prior_loss_end": round(float(lval), 4) if lval is not None else None,
            "prior_steps": steps}
    return {"encoder": enc_params, "denoiser": dparams}, info
