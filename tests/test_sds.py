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
    """Gradient routing contract of the stage-2 L_diff term: a SELF-trained
    denoiser learns the texture distribution but must not pull the texture
    (a from-scratch denoiser's early loss destabilized the L=100/10k run:
    instance bloat + rising image loss); the texture-regularizing gradient
    only applies with FROZEN (converted pretrained) denoiser weights, like
    the reference's model_ema (gaussian_model_latent_strands.py:501-513)."""
    scfg = TexturedStrandsConfig(num_strands=8, texture_size=16,
                                 strand_length=8, sh_degree=1,
                                 diffusion_input=4, pool_size=100,
                                 use_diffusion=True)
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    val = stage2.diffusion_loss(state.params, scfg, jax.random.PRNGKey(1))
    assert np.isfinite(float(val))
    g = jax.grad(lambda p: stage2.diffusion_loss(p, scfg, jax.random.PRNGKey(1)))(
        state.params)
    # self-prior: denoiser trains, texture untouched
    assert float(jnp.abs(g["texture"]).max()) == 0.0
    dnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g["denoiser"]))
    assert np.isfinite(dnorm) and dnorm > 0.0

    # frozen pretrained denoiser: the texture IS regularized
    frozen = state.params["denoiser"]
    params_nodenoiser = {k: v for k, v in state.params.items()
                         if k != "denoiser"}
    g2 = jax.grad(lambda p: stage2.diffusion_loss(
        p, scfg, jax.random.PRNGKey(1), denoiser_params=frozen))(
            params_nodenoiser)
    assert float(jnp.abs(g2["texture"]).max()) > 0.0
    assert bool(jnp.all(jnp.isfinite(g2["texture"])))


def _mini_prior(scfg, key=3):
    from gaussianhaircut_tpu.models import prior_io
    return prior_io.init_prior(scfg, jax.random.PRNGKey(key))


def test_prior_io_roundtrip_and_changes_sds(tmp_path):
    from gaussianhaircut_tpu.models import prior_io
    scfg = TexturedStrandsConfig(num_strands=8, texture_size=16,
                                 strand_length=8, sh_degree=1,
                                 diffusion_input=4, pool_size=200)
    pool = synthetic_scalp_pool(200)
    hair = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    params, static = stage3.create_from_stage2(
        hair.params, pool, scfg, jax.random.PRNGKey(1), 8)

    prior_a = _mini_prior(scfg, 3)
    prior_b = _mini_prior(scfg, 17)

    path = str(tmp_path / "prior.npz")
    prior_io.save_prior(path, prior_a)
    loaded = prior_io.load_strand_prior(path)
    assert set(loaded) == {"encoder", "decoder", "denoiser"}
    for sec in loaded:
        ref_leaves = jax.tree_util.tree_leaves(prior_a[sec])
        got_leaves = jax.tree_util.tree_leaves(loaded[sec])
        assert len(ref_leaves) == len(got_leaves)
        for r, g in zip(ref_leaves, got_leaves):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    key = jax.random.PRNGKey(4)
    v_loaded = float(stage3.sds_loss(params, static, loaded, scfg, key,
                                     num_guiding=8))
    v_a = float(stage3.sds_loss(params, static, prior_a, scfg, key,
                                num_guiding=8))
    v_b = float(stage3.sds_loss(params, static, prior_b, scfg, key,
                                num_guiding=8))
    assert v_loaded == v_a            # roundtrip preserves behavior
    assert v_a != v_b                 # different weights change SDS output


def test_stage3_train_step_sds_metric_fires():
    import gaussianhaircut_tpu.train.stage3 as s3
    from gaussianhaircut_tpu.ops.rasterize import RasterConfig
    from gaussianhaircut_tpu.render.renderer import GaussianFields
    from gaussianhaircut_tpu.scene.cameras import CameraBatch, CameraStatic
    from gaussianhaircut_tpu.train.optim import adam_init

    res = 32
    scfg = TexturedStrandsConfig(num_strands=8, texture_size=16,
                                 strand_length=8, sh_degree=1,
                                 diffusion_input=4, pool_size=200)
    pool = synthetic_scalp_pool(200)
    hair = stage2.init_hair_state(scfg, jax.random.PRNGKey(0))
    params, static = stage3.create_from_stage2(
        hair.params, pool, scfg, jax.random.PRNGKey(1), 8)
    state = s3.CurvesTrainState(params, static, adam_init(params),
                                jnp.zeros((), jnp.int32))

    n = 4
    head = GaussianFields(
        xyz=jnp.zeros((n, 3)), features=jnp.zeros((n, 4, 3)),
        scaling=jnp.full((n, 3), 1e-3),
        rotation_matrix=jnp.tile(jnp.eye(3)[None], (n, 1, 1)),
        opacity=jnp.full((n, 1), 0.5), label=jnp.zeros((n, 1)),
        orient_conf=jnp.zeros((n, 1)), valid=jnp.ones(n, bool),
        viewspace=jnp.zeros((n, 3)),
        use_direction=jnp.zeros(n, jnp.float32))
    w2c = np.eye(4, dtype=np.float32); w2c[2, 3] = 2.0
    cam = CameraStatic(uid=0, colmap_id=0, image_name="0", width=res,
                       height=res, colmap_transform=w2c, fovx=0.8, fovy=0.8)
    cam_batch = CameraBatch.from_cameras([cam])
    raster_cfg = RasterConfig(tile_w=16, tile_h=16, chunk=32,
                              capacity_mult=64, backend="jnp")
    opt_cfg = OptimizationConfig(lambda_dorient=0.1, lambda_dsds=0.01)
    prior = _mini_prior(scfg)

    state, metrics = s3.train_step(
        state, head, cam_batch, jnp.zeros((3, res, res)),
        jnp.full((2, res, res), 0.5), jnp.zeros((1, res, res)),
        jnp.ones((1, res, res)), jnp.asarray(0), None, jnp.asarray(1e-3),
        prior, jax.random.PRNGKey(9),
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_cfg, white_background=False, use_sds=True)
    assert np.isfinite(float(metrics["sds"]))
    assert float(metrics["sds"]) != 0.0
    # the SDS-grad cap must be active (default sds_grad_ratio=1.0) and valid
    assert "sds_gscale" in metrics
    assert 0.0 < float(metrics["sds_gscale"]) <= 1.0

    # ratio<=0 restores the reference's joint-backprop semantics (no cap)
    import dataclasses
    opt_nocap = dataclasses.replace(opt_cfg, sds_grad_ratio=0.0)
    _, m2 = s3.train_step(
        state, head, cam_batch, jnp.zeros((3, res, res)),
        jnp.full((2, res, res), 0.5), jnp.zeros((1, res, res)),
        jnp.ones((1, res, res)), jnp.asarray(0), None, jnp.asarray(1e-3),
        prior, jax.random.PRNGKey(9),
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_nocap, white_background=False, use_sds=True)
    assert "sds_gscale" not in m2


def test_cap_norm_relative():
    """The stage-3 SDS-vs-image gradient balance guard: a regularizer grad
    1e7x the data grad (the measured runs/r4 stage-3 divergence) must be
    scaled down to the data-grad norm; an already-small one is untouched."""
    from gaussianhaircut_tpu.train.optim import cap_norm_relative, global_norm

    g_img = {"a": jnp.ones((4,)), "b": jnp.full((2, 2), 2.0)}   # norm ~4.47
    g_big = {"a": jnp.full((4,), 1e7), "b": jnp.zeros((2, 2))}
    capped, scale = cap_norm_relative(g_big, g_img, 1.0)
    assert float(scale) < 1e-6
    np.testing.assert_allclose(float(global_norm(capped)),
                               float(global_norm(g_img)), rtol=1e-5)
    # direction preserved
    assert float(capped["a"][0]) > 0 and float(capped["b"][0, 0]) == 0.0

    g_small = {"a": jnp.full((4,), 1e-3), "b": jnp.zeros((2, 2))}
    same, scale2 = cap_norm_relative(g_small, g_img, 1.0)
    assert float(scale2) == 1.0
    np.testing.assert_array_equal(np.asarray(same["a"]),
                                  np.asarray(g_small["a"]))


def test_stage2_train_step_diffusion_metric_fires_and_frozen_denoiser():
    import tests.test_strands as ts
    (res, scfg0, pool, head, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
     raster_cfg, opt_cfg0) = ts._toy_setup()
    import dataclasses
    scfg = dataclasses.replace(scfg0, use_diffusion=True, diffusion_input=4)
    opt_cfg = dataclasses.replace(opt_cfg0, lambda_dsds=0.01)

    # frozen pretrained denoiser path: no denoiser in the learnable params
    state = stage2.init_hair_state(scfg, jax.random.PRNGKey(0),
                                   own_denoiser=False)
    assert "denoiser" not in state.params
    den_params = _mini_prior(scfg)["denoiser"]
    state, metrics = stage2.train_step(
        state, head, pool, cam_batch, gt_image, gt_mask, gt_oa, gt_oc,
        jnp.asarray(0), None, jnp.asarray(1e-3), den_params, None,
        scfg=scfg, width=res, height=res, raster_cfg=raster_cfg,
        opt_cfg=opt_cfg, white_background=False)
    assert np.isfinite(float(metrics["sds"]))
    assert float(metrics["sds"]) != 0.0


def test_distill_converges_on_known_teacher():
    """The converter's core loop (tools/convert_neuralhaircut_ckpt._distill)
    has never run in CI (VERDICT r2 missing #2): distill a KNOWN numpy MLP
    teacher into StrandDecoder-shaped flax params and assert the student
    matches the teacher out of (input) sample."""
    import jax
    import numpy as np

    from gaussianhaircut_tpu.models.strand_prior import GEOMETRY_DIM
    from tools.convert_neuralhaircut_ckpt import _distill

    import flax.linen as nn

    class Student(nn.Module):
        @nn.compact
        def __call__(self, z):
            x = nn.silu(nn.Dense(128)(z))
            x = nn.silu(nn.Dense(128)(x))
            return nn.Dense(6)(x)

    # fixed random teacher MLP in plain numpy (no torch needed)
    rng = np.random.default_rng(0)
    w1 = rng.normal(scale=0.15, size=(GEOMETRY_DIM, 32)).astype(np.float32)
    b1 = rng.normal(scale=0.1, size=(32,)).astype(np.float32)
    w2 = rng.normal(scale=0.4, size=(32, 6)).astype(np.float32)

    def teacher(z):
        return np.tanh(np.asarray(z) @ w1 + b1) @ w2

    student = Student()
    params = student.init(jax.random.PRNGKey(1),
                          np.zeros((1, GEOMETRY_DIM), np.float32))

    def sample_inputs(r, n):
        return r.normal(size=(n, GEOMETRY_DIM)).astype(np.float32)

    fitted = _distill(student, params, teacher, sample_inputs,
                      steps=800, batch=256, lr=3e-3, label="test")

    holdout = sample_inputs(np.random.default_rng(123), 512)
    pred = np.asarray(student.apply(fitted, holdout))
    gold = teacher(holdout)
    rel = float(np.mean((pred - gold) ** 2) / np.mean(gold ** 2))
    assert rel < 0.05, f"distillation failed to converge: rel mse {rel:.4f}"


def test_prior_roundtrip_feeds_stage3_sds(tmp_path):
    """save_prior -> load_strand_prior -> stage3.sds_loss wiring: a converted
    checkpoint must drive the SDS term end to end (finite, nonzero grad on
    strand dirs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianhaircut_tpu.models.prior_io import (
        init_prior, load_strand_prior, save_prior)
    from gaussianhaircut_tpu.models.textured_strands import (
        TexturedStrandsConfig, synthetic_scalp_pool)
    from gaussianhaircut_tpu.train import stage3

    scfg = TexturedStrandsConfig(num_strands=64, texture_size=32,
                                 strand_length=8, sh_degree=1,
                                 pool_size=256, diffusion_input=8)
    prior0 = init_prior(scfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "strand_prior.npz")
    save_prior(path, prior0)
    prior = load_strand_prior(path)
    assert set(prior) >= {"encoder", "denoiser"}

    pool = synthetic_scalp_pool(scfg.pool_size)
    n = 32
    rng = np.random.default_rng(0)
    origins = jnp.asarray(np.asarray(pool.origins)[:n][:, None, :])
    dirs = jnp.asarray(rng.normal(scale=1e-3, size=(n, scfg.strand_length - 1, 3)),
                       jnp.float32)
    params = stage3.CurvesParams(
        dirs=dirs,
        features_dc=jnp.zeros((n, 1, 3)),
        features_rest=jnp.zeros((n, 3, 3)),
        orient_conf=jnp.zeros((n, 1)))
    static = stage3.CurvesStatic(
        origins=origins,
        uvs=jnp.asarray(np.asarray(pool.uvs)[:n]),
        local2world=jnp.asarray(np.asarray(pool.local2world)[:n]),
        z_geom=jnp.zeros((n, 64)))

    def f(dirs):
        return stage3.sds_loss(params._replace(dirs=dirs), static, prior,
                               scfg, jax.random.PRNGKey(5), num_guiding=16)

    val, grad = jax.value_and_grad(f)(dirs)
    assert np.isfinite(float(val)) and float(val) != 0.0
    g = np.asarray(grad)
    assert np.isfinite(g).all() and np.abs(g).max() > 0.0
