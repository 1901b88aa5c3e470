"""Offline converter: NeuralHaircut pretrained priors -> gaussianhaircut_tpu npz.

The reference pipeline depends on two pretrained artifacts that are cloned /
downloaded at install time (install.sh:28; gaussian_model_strands.py:80-81):

  1. the strand VAE ``strand_ckpt.pth`` (Encoder/Decoder over local strand
     geometry, ext/NeuralHaircut/src/hair_networks/strand_prior.py), and
  2. the latent hair-texture diffusion denoiser (k-diffusion image_v1,
     reached through the strand generator's ``model_ema``).

The TPU re-derivations (models/strand_prior.py, models/diffusion.py) use
different topologies (batched-MXU MLPs instead of the upstream conv stacks),
so weights cannot transfer by key renaming.  This tool transfers them by
**distillation**: it loads the upstream torch modules, samples their
input/output behavior, and fits the flax modules to match.  Run it on any
machine that has the NeuralHaircut clone + checkpoints (this container has
neither); the output npz follows models/prior_io.py's schema and is loaded
with ``load_prior`` / ``--prior_checkpoint``.

Usage:
  python tools/convert_neuralhaircut_ckpt.py \
      --neuralhaircut_dir ext/NeuralHaircut \
      --strand_ckpt ext/NeuralHaircut/pretrained_models/strand_prior/strand_ckpt.pth \
      --out weights/strand_prior.npz [--steps 2000] [--batch 512]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def _distill(flax_module, params, fn_teacher, sample_inputs, steps, batch,
             lr=1e-3, seed=0, label=""):
    """Fit flax_module.apply(params, x) to fn_teacher(x) over sampled x."""
    import jax
    import jax.numpy as jnp
    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = flax_module.apply(p, x)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for i in range(steps):
        x = sample_inputs(rng, batch)
        y = fn_teacher(x)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jnp.asarray(y))
        if i % 100 == 0:
            print(f"[{label}] step {i}: mse={float(loss):.6f}", flush=True)
    return params


def selftest() -> int:
    """Egress-free tool check (CI / pre-flight on the conversion machine):
    (1) the distillation loop fits a KNOWN numpy-MLP teacher into
    StrandDecoder-shaped flax params out of sample; (2) the prior_io npz
    schema round-trips the converted pytrees.  Mirrors
    tests/test_sds.py::test_distill_converges_on_known_teacher."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    import flax.linen as nn

    from gaussianhaircut_tpu.models.prior_io import load_prior, save_prior
    from gaussianhaircut_tpu.models.strand_prior import (
        GEOMETRY_DIM, StrandDecoder, StrandEncoder)

    class Student(nn.Module):
        @nn.compact
        def __call__(self, z):
            x = nn.silu(nn.Dense(128)(z))
            x = nn.silu(nn.Dense(128)(x))
            return nn.Dense(6)(x)

    rng = np.random.default_rng(0)
    w1 = rng.normal(scale=0.15, size=(GEOMETRY_DIM, 32)).astype(np.float32)
    b1 = rng.normal(scale=0.1, size=(32,)).astype(np.float32)
    w2 = rng.normal(scale=0.4, size=(32, 6)).astype(np.float32)

    def teacher(z):
        return np.tanh(np.asarray(z) @ w1 + b1) @ w2

    student = Student()
    params = student.init(jax.random.PRNGKey(1),
                          np.zeros((1, GEOMETRY_DIM), np.float32))
    fitted = _distill(student, params, teacher,
                      lambda r, n: r.normal(size=(n, GEOMETRY_DIM)).astype(
                          np.float32),
                      steps=800, batch=256, lr=3e-3, label="selftest")
    holdout = np.random.default_rng(123).normal(
        size=(512, GEOMETRY_DIM)).astype(np.float32)
    pred = np.asarray(student.apply(fitted, holdout))
    gold = teacher(holdout)
    rel = float(np.mean((pred - gold) ** 2) / np.mean(gold ** 2))

    # schema roundtrip with the real prior modules
    length = 16
    enc = StrandEncoder()
    dec = StrandDecoder(length=length)
    prior = {"encoder": enc.init(jax.random.PRNGKey(2),
                                 np.zeros((1, length, 3), np.float32)),
             "decoder": dec.init(jax.random.PRNGKey(3),
                                 np.zeros((1, GEOMETRY_DIM), np.float32))}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "prior.npz")
        save_prior(path, prior)
        back = load_prior(path)
    import jax.numpy as jnp
    same = all(bool(jnp.array_equal(a, b)) for a, b in zip(
        jax.tree_util.tree_leaves(prior), jax.tree_util.tree_leaves(back)))
    ok = rel < 0.08 and same
    print(f"selftest: distill rel-mse={rel:.4f} roundtrip={same} ->",
          "OK" if ok else "FAILED")
    return 0 if ok else 1


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if "--selftest" in argv:
        return selftest()
    ap = argparse.ArgumentParser("convert_neuralhaircut_ckpt")
    ap.add_argument("--selftest", action="store_true",
                    help="egress-free tool check (handled before parsing)")
    ap.add_argument("--neuralhaircut_dir", required=True,
                    help="path to the NeuralHaircut clone (for src.hair_networks)")
    ap.add_argument("--strand_ckpt", required=True)
    ap.add_argument("--diffusion_ckpt", default="",
                    help="optional k-diffusion denoiser checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--strand_length", type=int, default=100)
    args = ap.parse_args(argv)

    import torch

    sys.path.insert(0, args.neuralhaircut_dir)
    from src.hair_networks.strand_prior import Decoder, Encoder  # upstream

    ckpt = torch.load(args.strand_ckpt, map_location="cpu")
    enc_t = Encoder(None).eval()
    enc_t.load_state_dict(ckpt["encoder"])
    dec_t = Decoder(None).eval()
    dec_t.load_state_dict(ckpt["decoder"])

    import jax
    from gaussianhaircut_tpu.models.prior_io import save_prior
    from gaussianhaircut_tpu.models.strand_prior import (
        GEOMETRY_DIM, StrandDecoder, StrandEncoder)

    length = args.strand_length

    # ---- decoder: geometry latent [64] -> local segment vectors [L-1, 3] ----
    dec = StrandDecoder(length=length)
    dec_params = dec.init(jax.random.PRNGKey(0),
                          np.zeros((1, GEOMETRY_DIM), np.float32))

    def sample_latents(rng, n):
        # match the upstream latent distribution: encode upstream-decoded
        # strands of unit-normal latents (the VAE prior)
        return rng.normal(size=(n, GEOMETRY_DIM)).astype(np.float32)

    @torch.no_grad()
    def teach_decode(z):
        out = dec_t(torch.from_numpy(np.asarray(z)))
        pts = out[0] if isinstance(out, (tuple, list)) else out  # [N, L, 3]
        pts = pts.reshape(len(z), -1, 3)
        return (pts[:, 1:] - pts[:, :-1]).numpy()                # segments

    dec_params = _distill(dec, dec_params, teach_decode, sample_latents,
                          args.steps, args.batch, label="decoder")

    # ---- encoder: local points [L, 3] -> latent (first 64 = geometry) ----
    enc = StrandEncoder()
    enc_params = enc.init(jax.random.PRNGKey(1),
                          np.zeros((1, length, 3), np.float32))

    def sample_strands(rng, n):
        z = sample_latents(rng, n)
        segs = teach_decode(z)
        pts = np.concatenate([np.zeros((n, 1, 3), np.float32),
                              np.cumsum(segs, axis=1)], axis=1)
        return pts

    @torch.no_grad()
    def teach_encode(pts):
        z = enc_t(torch.from_numpy(np.asarray(pts))).numpy()
        want = enc.out_dim
        if z.shape[-1] < want:
            z = np.pad(z, ((0, 0), (0, want - z.shape[-1])))
        return z[:, :want]

    enc_params = _distill(enc, enc_params, teach_encode, sample_strands,
                          args.steps, args.batch, label="encoder")

    prior = {"encoder": enc_params, "decoder": dec_params}

    # ---- denoiser: optional, distilled over random latent images ----
    if args.diffusion_ckpt:
        from gaussianhaircut_tpu.models.diffusion import Denoiser, DiffusionConfig
        den_ckpt = torch.load(args.diffusion_ckpt, map_location="cpu")
        model_t = den_ckpt["model_ema"] if "model_ema" in den_ckpt else den_ckpt
        den = Denoiser(DiffusionConfig(input_channels=GEOMETRY_DIM))
        den_params = den.init(jax.random.PRNGKey(2))

        import jax.numpy as jnp

        class _DenWrap:
            def apply(self, p, xin):
                x, sigma = xin[..., :-1], xin[..., -1, 0, 0]
                return den.denoise(p, x, sigma)

        @torch.no_grad()
        def teach_denoise(xin):
            x = torch.from_numpy(np.asarray(xin[..., :-1])).permute(0, 3, 1, 2)
            sigma = torch.from_numpy(np.asarray(xin[..., -1, 0, 0]))
            out = model_t(x, sigma)
            return out.permute(0, 2, 3, 1).numpy()

        def sample_noisy(rng, n):
            x = rng.normal(size=(n, 32, 32, GEOMETRY_DIM)).astype(np.float32)
            sigma = np.exp(rng.normal(-1.2, 1.2, size=n)).astype(np.float32)
            xin = np.concatenate(
                [x, np.broadcast_to(sigma[:, None, None, None],
                                    (n, 32, 32, 1))], axis=-1)
            return xin

        prior["denoiser"] = _distill(_DenWrap(), den_params, teach_denoise,
                                     sample_noisy, args.steps, max(8, args.batch // 64),
                                     label="denoiser")

    save_prior(args.out, prior)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    raise SystemExit(main())
