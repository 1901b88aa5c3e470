"""Stage-3 SDS regularizer and stage-2 diffusion loss paths."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.config import OptimizationConfig
from gaussianhaircut_tpu.models.diffusion import Denoiser, DiffusionConfig
from gaussianhaircut_tpu.models.strand_prior import StrandEncoder
from gaussianhaircut_tpu.models.textured_strands import (
    TexturedStrandsConfig, synthetic_scalp_pool,
)
from gaussianhaircut_tpu.train import stage2, stage3


def test_stage3_sds_loss_grads():
    scfg = TexturedStrandsConfig(num_strands=8, texture_size=16,
                                 strand_length=8, sh_degree=1,
                                 diffusion_input=4, pool_size=200)
    pool = synthetic_scalp_pool(200)
    hair = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    params, static = stage3.create_from_stage2(
        hair.params, pool, scfg, jax.random.PRNGKey(1), 8)

    enc = StrandEncoder()
    enc_params = enc.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, scfg.strand_length, 3)))
    den = Denoiser(DiffusionConfig(input_channels=64,
                                   input_size=scfg.diffusion_input,
                                   mapping_out=32, depths=(1, 1),
                                   channels=(16, 32)))
    prior = {"encoder": enc_params, "denoiser": den.init(jax.random.PRNGKey(3))}
    # NOTE: sds_loss builds its Denoiser from the default DiffusionConfig
    # topology; init a matching one for the test
    den_full = Denoiser(DiffusionConfig(input_channels=64,
                                        input_size=scfg.diffusion_input))
    prior["denoiser"] = den_full.init(jax.random.PRNGKey(3))

    def loss(p):
        return stage3.sds_loss(p, static, prior, scfg, jax.random.PRNGKey(4),
                               num_guiding=8)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert bool(jnp.all(jnp.isfinite(grads.dirs)))
    assert float(jnp.abs(grads.dirs).sum()) > 0


def test_stage2_diffusion_loss():
    scfg = TexturedStrandsConfig(num_strands=8, texture_size=16,
                                 strand_length=8, sh_degree=1,
                                 diffusion_input=4, pool_size=100,
                                 use_diffusion=True)
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    val = stage2.diffusion_loss(state.params, scfg, jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    g = jax.grad(lambda p: stage2.diffusion_loss(p, scfg, jax.random.PRNGKey(1)))(
        state.params)
    assert bool(jnp.all(jnp.isfinite(g["texture"])))
