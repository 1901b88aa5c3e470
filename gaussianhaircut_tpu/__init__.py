"""gaussianhaircut_tpu — TPU-native (JAX/XLA/Pallas) strand-based hair reconstruction.

A from-scratch reimplementation of the capabilities of eth-ait/GaussianHaircut
(ECCV 2024, "Human Hair Reconstruction with Strand-Aligned 3D Gaussians")
designed for TPU hardware:

- the CUDA ``diff_gaussian_rasterization_hair`` extension (reference:
  ext/diff_gaussian_rasterization_hair/) becomes a tile-binned, MXU-centric
  Pallas splatting kernel with a deterministic segment-sum backward
  (`gaussianhaircut_tpu.ops.rasterize`);
- all per-Gaussian geometry (EWA covariance projection, conics, SH, strand
  directions) is pure jnp and differentiable end-to-end
  (`gaussianhaircut_tpu.ops.projection`);
- the three optimization stages (unstructured 3DGS / latent textured strands /
  explicit strand refinement) run as jitted JAX training loops
  (`gaussianhaircut_tpu.train`);
- multi-chip scaling uses `jax.sharding.Mesh` + XLA collectives
  (`gaussianhaircut_tpu.parallel`).
"""

__version__ = "0.1.0"
