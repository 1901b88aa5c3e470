"""pair_cull exactness: dropping (gaussian, tile) pairs whose max alpha over
the tile is provably < 1/255 must leave forward outputs AND gradients
unchanged (both kernels skip alpha < ALPHA_MIN — forward.cu:366-368,
backward.cu's recomputed test), up to chunk-regrouping float noise.

Scenes are built adversarially: opacities spanning the 1/255 threshold,
anisotropic conics (cross terms exercise the per-edge minimum), and
off-image means (AABB corner tiles are the pairs the cull removes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize.api import (
    ndc_xy_to_pixel, rasterize, rasterize_batched,
)
from gaussianhaircut_tpu.ops.rasterize.common import RasterConfig

W, H = 64, 48
NCH = 10


def _scene(rng, p=96, op_lo=0.003, op_hi=1.0):
    mean_pix = rng.uniform([-10, -10], [W + 10, H + 10],
                           size=(p, 2)).astype(np.float32)
    theta = rng.uniform(0, np.pi, p)
    s1 = rng.uniform(0.5, 40.0, p)     # long tails -> big rects
    s2 = rng.uniform(0.5, 6.0, p)
    c, s = np.cos(theta), np.sin(theta)
    cov00 = c * c * s1 + s * s * s2
    cov01 = c * s * s1 - s * c * s2
    cov11 = s * s * s1 + c * c * s2
    det = cov00 * cov11 - cov01 ** 2
    conic = np.stack([cov11 / det, -cov01 / det, cov00 / det],
                     -1).astype(np.float32)
    colors = rng.uniform(0, 1, size=(p, NCH)).astype(np.float32)
    # opacities clustered around the 1/255 threshold: the cull may only
    # remove pairs that are provably below it
    opacity = np.concatenate([
        rng.uniform(op_lo, 0.01, size=(p // 2, 1)),
        rng.uniform(0.01, op_hi, size=(p - p // 2, 1)),
    ]).astype(np.float32)
    depth = rng.uniform(0.5, 10.0, size=(p,)).astype(np.float32)
    valid = np.ones(p, bool)
    bg = np.array([1, 1, 1, 0, 0, 0, 0, 0, 0, 100], np.float32)
    return mean_pix, conic, colors, opacity, depth, valid, bg


def _run(cfg, scene, backend):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    size = np.array([W, H], np.float32)
    ndc_xy = (2.0 * mean_pix + 1.0) / size - 1.0
    ndc = np.concatenate([ndc_xy, np.zeros_like(ndc_xy[:, :1])],
                         -1).astype(np.float32)
    c = RasterConfig(**{**cfg.__dict__, "backend": backend})

    def loss(ndc, conic, colors, opac):
        out = rasterize(ndc, conic, colors, opac, jnp.asarray(depth),
                        jnp.asarray(valid), jnp.asarray(bg), W, H, c)
        return jnp.sum(out["render"] ** 2), out

    (_, out), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)(
        jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
        jnp.asarray(opacity))
    return out, g


def _binned_pairs(cfg, scene):
    """Post-cull pair count (sum of per-tile counts) for a config."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    pre = C.preprocess(jnp.asarray(mean_pix), jnp.asarray(conic),
                       jnp.asarray(depth), jnp.asarray(valid), W, H, cfg,
                       opacity=jnp.asarray(opacity))
    b = C.bin_instances(pre, jnp.asarray(mean_pix), jnp.asarray(conic),
                        jnp.asarray(opacity), jnp.asarray(colors),
                        jnp.asarray(depth), W, H, cfg)
    # recover per-tile counts from the slot validity in gid (gid == P marks
    # masked/padded slots)
    return int(jnp.sum(b.gid < mean_pix.shape[0]))


def test_pair_cull_output_and_grad_exact():
    """Cull on/off on the jnp backend (deterministic f32): the cull
    decisions live in the SHARED binning, so this validates them for both
    backends at tight tolerance.  (A pallas on/off comparison bottoms out at
    the kernel's own chunk-regrouping noise floor: removing exactly-zero
    pairs shifts chunk boundaries, the transmittance factors regroup at
    ~1e-7, and the backward's total - prefix suffix cancellation amplifies
    that to ~2e-3 rel on near-cancelling grads even at HIGHEST precision —
    measured; same class as test_batched_matches_per_camera's 1e-2.)"""
    rng = np.random.default_rng(7)
    scene = _scene(rng)
    base = RasterConfig(tile_w=16, tile_h=16, chunk=32, capacity_mult=24)
    out0, g0 = _run(base, scene, "jnp")
    out1, g1 = _run(RasterConfig(**{**base.__dict__, "pair_cull": True}),
                    scene, "jnp")

    np.testing.assert_allclose(np.asarray(out1["render"]),
                               np.asarray(out0["render"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["final_T"]),
                               np.asarray(out0["final_T"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out1["radii"]),
                                  np.asarray(out0["radii"]))
    for a, b, name in zip(g1, g0, ["ndc", "conic", "colors", "opacity"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6, err_msg=name)

    # and the cull must actually remove pairs on this scene
    pairs0 = _binned_pairs(base, scene)
    pairs1 = _binned_pairs(
        RasterConfig(**{**base.__dict__, "pair_cull": True}), scene)
    assert pairs1 < pairs0, (pairs1, pairs0)


def test_pair_cull_pallas_matches_jnp():
    """pallas-with-cull vs jnp-with-cull: exercises the pallas backward's
    LIVE-count segment reduction (gauss_count_live) — with pre-cull counts
    every segment after the first culled pair misattributes its gradient to
    the wrong gaussian (caught by this test's first version as a row
    shift)."""
    rng = np.random.default_rng(7)
    scene = _scene(rng)
    cfg = RasterConfig(tile_w=16, tile_h=16, chunk=32, capacity_mult=24,
                       pair_cull=True)
    out_j, g_j = _run(cfg, scene, "jnp")
    out_p, g_p = _run(cfg, scene, "pallas")
    np.testing.assert_allclose(np.asarray(out_p["render"]),
                               np.asarray(out_j["render"]),
                               rtol=1e-4, atol=1e-5)
    for a, b, name in zip(g_p, g_j, ["ndc", "conic", "colors", "opacity"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4, err_msg=name)


def test_pair_cull_batched_matches_uncull():
    rng = np.random.default_rng(11)
    scenes = [_scene(rng) for _ in range(3)]
    mean_b = np.stack([s[0] for s in scenes])
    conic_b = np.stack([s[1] for s in scenes])
    colors_b = np.stack([s[2] for s in scenes])
    opac_b = np.stack([s[3] for s in scenes])
    depth_b = np.stack([s[4] for s in scenes])
    valid_b = np.stack([s[5] for s in scenes])
    bg = scenes[0][6]
    size = np.array([W, H], np.float32)
    ndc_xy = (2.0 * mean_b + 1.0) / size - 1.0
    ndc_b = np.concatenate([ndc_xy, np.zeros_like(ndc_xy[..., :1])],
                           -1).astype(np.float32)

    def go(pair_cull):
        c = RasterConfig(tile_w=16, tile_h=16, chunk=32, capacity_mult=24,
                         backend="jnp", pair_cull=pair_cull)

        def loss(ndc, conic, colors, opac):
            out = rasterize_batched(ndc, conic, colors, opac,
                                    jnp.asarray(depth_b),
                                    jnp.asarray(valid_b), jnp.asarray(bg),
                                    W, H, c)
            return jnp.sum(out["render"] ** 2), out

        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)(
            jnp.asarray(ndc_b), jnp.asarray(conic_b), jnp.asarray(colors_b),
            jnp.asarray(opac_b))

    (_, out0), g0 = go(False)
    (_, out1), g1 = go(True)
    np.testing.assert_allclose(np.asarray(out1["render"]),
                               np.asarray(out0["render"]),
                               rtol=1e-5, atol=1e-6)
    for a, b, name in zip(g1, g0, ["ndc", "conic", "colors", "opacity"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_min_quad_rect_exact_vs_grid():
    """_min_quad_rect against a dense grid evaluation, including saddle
    (non-PSD) conics: the closed form may never report a minimum LARGER than
    the true one (that would cull a live pair)."""
    rng = np.random.default_rng(3)
    n = 512
    a = rng.uniform(-0.5, 2.0, n).astype(np.float32)
    c = rng.uniform(-0.5, 2.0, n).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    lx = rng.uniform(-20, 10, n).astype(np.float32)
    ux = lx + rng.uniform(0.5, 30, n).astype(np.float32)
    ly = rng.uniform(-20, 10, n).astype(np.float32)
    uy = ly + rng.uniform(0.5, 30, n).astype(np.float32)

    got = np.asarray(_jit_minq(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                               jnp.asarray(lx), jnp.asarray(ux),
                               jnp.asarray(ly), jnp.asarray(uy)))

    ts = np.linspace(0, 1, 41, dtype=np.float32)
    dx = lx[:, None, None] + (ux - lx)[:, None, None] * ts[None, :, None]
    dy = ly[:, None, None] + (uy - ly)[:, None, None] * ts[None, None, :]
    q = (a[:, None, None] * dx * dx + c[:, None, None] * dy * dy
         + 2 * b[:, None, None] * dx * dy)
    grid_min = q.reshape(n, -1).min(axis=1)
    # closed form <= grid sample (grid is a subset of the box)
    assert np.all(got <= grid_min + 1e-3), (
        np.max(got - grid_min))


@jax.jit
def _jit_minq(a, b, c, lx, ux, ly, uy):
    return C._min_quad_rect(a, b, c, lx, ux, ly, uy)
