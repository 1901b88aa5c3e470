"""End-to-end converter validation: tools/convert_neuralhaircut_ckpt.py's
MAIN path (not just --selftest) against an upstream-shaped checkpoint.

The real NeuralHaircut clone cannot exist in this environment (zero egress;
install.sh:28 clones it at install time), so this test reconstructs the
upstream *consumption contract* exactly as the reference exercises it:

- ``torch.load(strand_ckpt.pth)`` returns ``{"encoder": sd, "decoder": sd}``
  (gaussian_model_strands.py:81 loads the "encoder" key);
- ``Encoder(None)`` / ``Decoder(None)`` are importable from
  ``src.hair_networks.strand_prior`` inside the NeuralHaircut tree and are
  constructible with a single (config) argument
  (gaussian_model_strands.py:80, train converter main());
- ``Decoder`` doubles as a generic MLP head:
  ``Decoder(None, dim_hidden=128, num_layers=2, dim_out=...)``
  (gaussian_model_latent_strands.py:79) — so the twin implements that
  signature;
- encoder maps local points [N, L, 3] -> latent [N, >=64] whose first 64
  dims are the geometry code (gaussian_model_strands.py:463
  ``encoder(pts * scale)[:, :64]``);
- decoder maps a 64-d latent to strand points [N, L, 3].

A torch "upstream twin" with that contract is written into a fabricated
``ext/NeuralHaircut`` mini-tree, its state dict saved with torch.save, and
the converter's main() runs the full distillation -> prior npz -> load_prior
-> stage-2 warm_start chain.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

UPSTREAM_TWIN = textwrap.dedent(
    '''
    """Fabricated src/hair_networks/strand_prior.py twin (call contract of
    the upstream module as consumed by GaussianHaircut; see test docstring).
    """
    import torch
    import torch.nn as nn


    class Decoder(nn.Module):
        def __init__(self, config=None, dim_in=64, dim_hidden=256,
                     num_layers=4, dim_out=None, length=100):
            super().__init__()
            self.length = length
            self.dim_out = dim_out
            out = dim_out if dim_out is not None else length * 3
            dims = [dim_in] + [dim_hidden] * num_layers + [out]
            self.layers = nn.ModuleList(
                [nn.Linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)])
            self.act = nn.ReLU()

        def forward(self, z):
            x = z
            for i, l in enumerate(self.layers):
                x = l(x)
                if i < len(self.layers) - 1:
                    x = self.act(x)
            if self.dim_out is None:
                return x.reshape(len(z), self.length, 3)
            return x


    class Encoder(nn.Module):
        def __init__(self, config=None, dim_latent=128, length=100):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv1d(3, 64, 3, padding=1), nn.ReLU(),
                nn.Conv1d(64, 128, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv1d(128, 128, 3, stride=2, padding=1), nn.ReLU(),
                nn.AdaptiveAvgPool1d(1))
            self.fc = nn.Linear(128, dim_latent)

        def forward(self, pts):
            # pts: [N, L, 3] local strand points
            h = self.conv(pts.transpose(1, 2)).squeeze(-1)
            return self.fc(h)
    '''
)


@pytest.mark.slow
def test_converter_main_on_upstream_shaped_ckpt(tmp_path):
    torch = pytest.importorskip("torch")

    # fabricate the NeuralHaircut mini-tree the converter imports from
    nh = tmp_path / "NeuralHaircut"
    pkg = nh / "src" / "hair_networks"
    pkg.mkdir(parents=True)
    (nh / "src" / "__init__.py").write_text("")
    (pkg / "__init__.py").write_text("")
    (pkg / "strand_prior.py").write_text(UPSTREAM_TWIN)

    # build the upstream twin modules HERE (same file contents) to produce a
    # real-shape state dict, then save the reference's checkpoint layout
    ns = {}
    exec(compile(UPSTREAM_TWIN, "strand_prior.py", "exec"), ns)
    torch.manual_seed(0)
    enc_t = ns["Encoder"](None)
    dec_t = ns["Decoder"](None)
    ckpt_path = tmp_path / "strand_ckpt.pth"
    torch.save({"encoder": enc_t.state_dict(),
                "decoder": dec_t.state_dict()}, ckpt_path)

    out_npz = tmp_path / "strand_prior.npz"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "convert_neuralhaircut_ckpt.py"),
         "--neuralhaircut_dir", str(nh),
         "--strand_ckpt", str(ckpt_path),
         "--out", str(out_npz),
         "--steps", "30", "--batch", "64"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr
    assert out_npz.exists()

    # the converted artifact loads and warm-starts stage 2
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gaussianhaircut_tpu.models.prior_io import load_prior
    from gaussianhaircut_tpu.models.textured_strands import (
        TexturedStrandsConfig)
    from gaussianhaircut_tpu.train import stage2

    prior = load_prior(str(out_npz))
    assert set(prior) >= {"encoder", "decoder"}

    scfg = TexturedStrandsConfig(num_strands=32, texture_size=16,
                                 strand_length=100, sh_degree=1)
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    before = jax.tree_util.tree_leaves(state.params["decoder"])[0].copy()
    warm = stage2.warm_start(state, prior)
    after = jax.tree_util.tree_leaves(warm.params["decoder"])[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))
    # structure preserved: the warmed decoder still decodes
    from gaussianhaircut_tpu.models.strand_prior import (GEOMETRY_DIM,
                                                         StrandDecoder)
    dec = StrandDecoder(length=100)
    segs = dec.apply(warm.params["decoder"],
                     np.zeros((2, GEOMETRY_DIM), np.float32))
    assert segs.shape == (2, 99, 3)


def test_warm_start_rejects_mismatched_decoder():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gaussianhaircut_tpu.models.strand_prior import StrandDecoder
    from gaussianhaircut_tpu.models.textured_strands import (
        TexturedStrandsConfig)
    from gaussianhaircut_tpu.train import stage2

    scfg = TexturedStrandsConfig(num_strands=16, texture_size=16,
                                 strand_length=100, sh_degree=1)
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    # decoder trained for a different strand length -> different leaf shapes
    other = StrandDecoder(length=100, hidden=128).init(
        jax.random.PRNGKey(1), np.zeros((1, 64), np.float32))
    with pytest.raises(ValueError):
        stage2.warm_start(state, {"decoder": other})
