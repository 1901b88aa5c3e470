"""Rasterizer correctness: independent naive compositor vs oracle vs
chunk-scan jnp backend vs Pallas (interpret mode), forward and gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianhaircut_tpu.ops.rasterize import common as C
from gaussianhaircut_tpu.ops.rasterize import reference
from gaussianhaircut_tpu.ops.rasterize.api import (
    ndc_xy_to_pixel, rasterize, rasterize_batched,
)
from gaussianhaircut_tpu.ops.rasterize.common import RasterConfig

W, H = 40, 24
NCH = 10


def make_scene(rng, p=64):
    """Random Gaussians roughly covering the image."""
    mean_pix = rng.uniform([-5, -5], [W + 5, H + 5], size=(p, 2)).astype(np.float32)
    # random SPD 2x2 covariances with a few-pixel scale
    theta = rng.uniform(0, np.pi, p)
    s1 = rng.uniform(1.0, 16.0, p)
    s2 = rng.uniform(1.0, 16.0, p)
    c, s = np.cos(theta), np.sin(theta)
    r00, r01 = c, -s
    r10, r11 = s, c
    cov00 = r00 * r00 * s1 + r01 * r01 * s2
    cov01 = r00 * r10 * s1 + r01 * r11 * s2
    cov11 = r10 * r10 * s1 + r11 * r11 * s2
    det = cov00 * cov11 - cov01 ** 2
    conic = np.stack([cov11 / det, -cov01 / det, cov00 / det], -1).astype(np.float32)
    colors = rng.uniform(0, 1, size=(p, NCH)).astype(np.float32)
    opacity = rng.uniform(0.05, 1.0, size=(p, 1)).astype(np.float32)
    depth = rng.uniform(0.5, 10.0, size=(p,)).astype(np.float32)
    depth[: p // 8] = 0.1  # some near-culled
    valid = np.ones(p, bool)
    valid[p // 8: p // 4] = False  # some externally culled
    bg = np.array([1, 1, 1, 0, 0, 0, 0, 0, 0, 100], np.float32)
    return mean_pix, conic, colors, opacity, depth, valid, bg


def pix_to_ndc(mean_pix):
    size = np.array([W, H], np.float32)
    ndc_xy = (2.0 * mean_pix + 1.0) / size - 1.0
    return np.concatenate([ndc_xy, np.zeros_like(ndc_xy[:, :1])], -1).astype(np.float32)


def naive_render(mean_pix, conic, colors, opacity, depth, valid, bg, tile_w, tile_h):
    """Straight Python port of forward.cu compositing (ground truth)."""
    p = mean_pix.shape[0]
    gx = -(-W // tile_w)
    gy = -(-H // tile_h)
    # preprocess
    radius = np.zeros(p)
    rects = np.zeros((p, 4), np.int64)
    ok = np.zeros(p, bool)
    for i in range(p):
        if not valid[i] or depth[i] <= 0.2:
            continue
        a, b, c = conic[i]
        det_inv = a * c - b * b
        if det_inv == 0:
            continue
        det = 1.0 / det_inv
        cov = np.array([c * det, -b * det, a * det])
        mid = 0.5 * (cov[0] + cov[2])
        d = cov[0] * cov[2] - cov[1] ** 2
        lam = mid + np.sqrt(max(0.1, mid * mid - d))
        lam = max(lam, mid - np.sqrt(max(0.1, mid * mid - d)))
        r = np.ceil(3.0 * np.sqrt(max(lam, 0.0)))
        x0 = min(gx, max(0, int((mean_pix[i, 0] - r) / tile_w)))
        y0 = min(gy, max(0, int((mean_pix[i, 1] - r) / tile_h)))
        x1 = min(gx, max(0, int((mean_pix[i, 0] + r + tile_w - 1) / tile_w)))
        y1 = min(gy, max(0, int((mean_pix[i, 1] + r + tile_h - 1) / tile_h)))
        if (x1 - x0) * (y1 - y0) == 0:
            continue
        ok[i] = True
        radius[i] = r
        rects[i] = (x0, y0, x1, y1)

    order = np.argsort(np.where(ok, depth, np.inf), kind="stable")
    out = np.zeros((NCH, H, W), np.float32)
    t_map = np.ones((H, W), np.float32)
    for py in range(H):
        for px in range(W):
            tx, ty = px // tile_w, py // tile_h
            t = 1.0
            cacc = np.zeros(NCH)
            for i in order:
                if not ok[i]:
                    continue
                x0, y0, x1, y1 = rects[i]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx = mean_pix[i, 0] - px
                dy = mean_pix[i, 1] - py
                a, b, c = conic[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, opacity[i, 0] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test = t * (1 - alpha)
                if test < 1e-4:
                    break
                cacc += colors[i] * alpha * t
                t = test
            out[:, py, px] = cacc + t * bg
            t_map[py, px] = t
    return out, t_map


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    return make_scene(rng)


@pytest.fixture(scope="module")
def cfg():
    return RasterConfig(tile_w=8, tile_h=8, chunk=16, capacity_mult=16)


def test_oracle_matches_naive(scene, cfg):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    gold, gold_t = naive_render(mean_pix, conic, colors, opacity, depth, valid,
                                bg, cfg.tile_w, cfg.tile_h)
    img, t_final = reference.rasterize_reference(
        jnp.asarray(mean_pix), jnp.asarray(conic), jnp.asarray(colors),
        jnp.asarray(opacity), jnp.asarray(depth), jnp.asarray(valid),
        jnp.asarray(bg), W, H, cfg, block=256)
    np.testing.assert_allclose(np.asarray(img), gold, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(t_final), gold_t, rtol=2e-5, atol=1e-5)


def _run_backend(scene, cfg, backend):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    cfg = RasterConfig(**{**cfg.__dict__, "backend": backend})
    out = rasterize(jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
                    jnp.asarray(opacity), jnp.asarray(depth), jnp.asarray(valid),
                    jnp.asarray(bg), W, H, cfg)
    return out


def test_jnp_core_matches_naive(scene, cfg):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    gold, gold_t = naive_render(mean_pix, conic, colors, opacity, depth, valid,
                                bg, cfg.tile_w, cfg.tile_h)
    out = _run_backend(scene, cfg, "jnp")
    assert int(out["num_rendered"]) > 0
    np.testing.assert_allclose(np.asarray(out["render"]), gold, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["final_T"]), gold_t, rtol=2e-5, atol=1e-5)


def test_pallas_interpret_matches_naive(scene, cfg):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    gold, gold_t = naive_render(mean_pix, conic, colors, opacity, depth, valid,
                                bg, cfg.tile_w, cfg.tile_h)
    out = _run_backend(scene, cfg, "pallas")
    # slightly looser: the kernel's log-space transmittance cumsum rounds
    # differently than the sequential product
    np.testing.assert_allclose(np.asarray(out["render"]), gold, rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["final_T"]), gold_t, rtol=5e-4, atol=1e-4)


def _loss_fn(backend, scene, cfg):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    cfg = RasterConfig(**{**cfg.__dict__, "backend": backend})
    target = jnp.linspace(0, 1, NCH * H * W).reshape(NCH, H, W)

    def loss(ndc, conic, colors, opacity):
        out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                        jnp.asarray(valid), jnp.asarray(bg), W, H, cfg)
        return jnp.sum((out["render"] - target) ** 2)

    ndc = jnp.asarray(pix_to_ndc(mean_pix))
    return jax.grad(loss, argnums=(0, 1, 2, 3))(
        ndc, jnp.asarray(conic), jnp.asarray(colors), jnp.asarray(opacity))


def _oracle_loss_grads(scene, cfg):
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    target = jnp.linspace(0, 1, NCH * H * W).reshape(NCH, H, W)

    def loss(ndc, conic, colors, opacity):
        mp = ndc_xy_to_pixel(ndc, W, H)
        img, _ = reference.rasterize_reference(
            mp, conic, colors, opacity, jnp.asarray(depth), jnp.asarray(valid),
            jnp.asarray(bg), W, H, cfg, block=256)
        return jnp.sum((img - target) ** 2)

    ndc = jnp.asarray(pix_to_ndc(mean_pix))
    return jax.grad(loss, argnums=(0, 1, 2, 3))(
        ndc, jnp.asarray(conic), jnp.asarray(colors), jnp.asarray(opacity))


def test_gradients_jnp_vs_oracle(scene, cfg):
    g_jnp = _loss_fn("jnp", scene, cfg)
    g_ora = _oracle_loss_grads(scene, cfg)
    for a, b, name in zip(g_jnp, g_ora, ["ndc", "conic", "colors", "opacity"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3, err_msg=name)


def test_gradients_pallas_vs_jnp(scene, cfg):
    g_pal = _loss_fn("pallas", scene, cfg)
    g_jnp = _loss_fn("jnp", scene, cfg)
    # the kernel's suffix accumulator is computed as (total - prefix), which
    # rounds differently than autodiff's direct suffix sums
    for a, b, name in zip(g_pal, g_jnp, ["ndc", "conic", "colors", "opacity"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-3, err_msg=name)


def test_pallas_multisegment_matches_single(scene, cfg):
    """Forcing many tiny segments (segment_chunks=2) must reproduce the
    single-segment forward AND gradients exactly — exercises the
    cross-segment carry/restore and the aliased tile-buffer threading."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(seg):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas",
                            "segment_chunks": seg})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out["render"])

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(*args)
        return img, g

    img1, g1 = run(0)          # single segment
    img2, g2 = run(2)          # many segments
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_pallas_io_manual_bit_matches_auto(scene, cfg):
    """io_mode="manual" (ANY-space tile buffers + explicit once-per-tile
    flush / per-chunk dpay store DMAs) must reproduce io_mode="auto" BIT
    exactly — forward, final_T and all gradients — in both the single-
    segment and the segment-crossing (continuation re-fetch) paths."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(io_mode, seg):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas",
                            "io_mode": io_mode, "segment_chunks": seg})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out["render"])

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(*args)
        return img, g

    for seg in (0, 2):
        img_a, g_a = run("auto", seg)
        img_m, g_m = run("manual", seg)
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_m))
        for a, b in zip(g_a, g_m):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_step_chunks_bit_matches(scene, cfg):
    """step_chunks > 1 (several chunks share one grid step + one grouped
    payload DMA, manual IO) must reproduce the ungrouped manual path BIT
    exactly — forward, final_T and all gradients — including the ragged
    group tail (TC=79 is not a multiple of 4) and segment-crossing
    continuations (segment_chunks=4 with group 2/4)."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(group, seg):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas",
                            "io_mode": "manual", "step_chunks": group,
                            "segment_chunks": seg})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out["render"])

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(*args)
        return img, g

    img_ref, g_ref = run(1, 0)
    for group, seg in ((2, 0), (4, 0), (2, 4), (4, 4)):
        img_g, g_g = run(group, seg)
        np.testing.assert_array_equal(np.asarray(img_ref), np.asarray(img_g),
                                      err_msg=f"group={group} seg={seg}")
        for a, b in zip(g_ref, g_g):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"group={group} seg={seg}")


def test_pay_gather_cm_bit_matches(scene, cfg):
    """pay_gather="cm" (channel-major payload materialization) must produce
    BIT-identical renders and gradients to the row-gather layout — it moves
    the same bytes through a different gather axis."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(backend, pay):
        c = RasterConfig(**{**cfg.__dict__, "backend": backend,
                            "pay_gather": pay})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out["render"])

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(*args)
        return img, g

    for backend in ("jnp", "pallas"):
        img_r, g_r = run(backend, "rows")
        img_c, g_c = run(backend, "cm")
        np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_c),
                                      err_msg=backend)
        for a, b in zip(g_r, g_c):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=backend)


def test_pallas_multisubchunk_matches(scene, cfg):
    """chunk=256 (two in-kernel 128-instance sub-chunks) must match the
    chunk=16 rendering and gradients."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(chunk):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas",
                            "chunk": chunk})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out["render"])

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(*args)
        return img, g

    img1, g1 = run(16)
    img2, g2 = run(256)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=1e-5, atol=1e-5)
    # chunk partitioning shifts the bf16-split prefix groupings; allow the
    # resulting ~4e-4 relative noise on gradients
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_pallas_power_vpu_and_bf16x2_acc_match(scene, cfg):
    """power_mode="vpu" (exact elementwise quadratic form) and
    fwd_acc="bf16x2" must reproduce the default matmul kernels.  In interpret
    mode the HIGHEST matmuls are f32-exact, so "vpu" should agree to float
    roundoff; the bf16x2 compositing split adds ~1e-5 relative."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(**kw):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas", **kw})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"]),
                    out["render"])

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(*args)
        return img, g

    img0, g0 = run()
    img1, g1 = run(power_mode="vpu")
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g0, g1):
        # f32-roundoff-level: exp() and the pixel summation amplify the
        # last-ulp differences between the expanded-polynomial matmul and
        # the centered-difference quadratic
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    img2, g2 = run(power_mode="vpu", fwd_acc="bf16x2")
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img2),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(g0, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)
    # split2: 2-pass power against the bf16-exact centered basis — the
    # coefficients' ~2^-17 representation error feeds exp(), so tolerances
    # sit between vpu (exact) and plain bf16
    img3, g3 = run(power_mode="split2")
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img3),
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(g0, g3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
    # split3: hi+mid+lo coefficient split is f32-grade (~2^-24) — must sit
    # at vpu-level tolerances
    img4, g4 = run(power_mode="split3")
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img4),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g0, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_reduce_featmajor_bit_matches_rowmajor(scene, cfg):
    """reduce_mode="featmajor" re-lays-out the backward segment reduction
    (instance-minor gather + cumsum) but keeps the exact summation order, so
    gradients must be BIT-identical to rowmajor."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(**kw):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas", **kw})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])

        return jax.grad(loss, argnums=(0, 1, 2, 3))(*args)

    g0 = run(reduce_mode="rowmajor")
    g1 = run(reduce_mode="featmajor")
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reduce_scatter_bit_matches_rowmajor(scene, cfg):
    """reduce_mode="scatter" carries the expansion slot through the forward
    binning sort (Binned.src) and inverts the permutation with one i32
    scatter instead of the backward's lax.sort.  Within a gaussian both
    orders ascend by tile id, so the summation order — and the gradients —
    must be BIT-identical to rowmajor, in both sort modes."""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(**kw):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas", **kw})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])

        return jax.grad(loss, argnums=(0, 1, 2, 3))(*args)

    for sort_mode in ("packed", "exact"):
        g0 = run(reduce_mode="rowmajor", sort_mode=sort_mode)
        g1 = run(reduce_mode="scatter", sort_mode=sort_mode)
        for a, b in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=sort_mode)


def _batch_scenes(n=3):
    """n distinct random scenes, stacked [n, P, ...]."""
    scenes = [make_scene(np.random.default_rng(100 + i)) for i in range(n)]
    stack = lambda k: np.stack([s[k] for s in scenes])
    return (stack(0), stack(1), stack(2), stack(3), stack(4), stack(5),
            scenes[0][6])


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_batched_matches_per_camera(cfg, backend):
    """rasterize_batched over B=3 'cameras' == B independent rasterize calls:
    forward image/final_T/radii AND gradients (grads of the batched sum-loss
    vs the per-camera grads, which are independent by construction)."""
    mean_b, conic_b, colors_b, opac_b, depth_b, valid_b, bg = _batch_scenes()
    ndc_b = np.stack([pix_to_ndc(m) for m in mean_b])
    c = RasterConfig(**{**cfg.__dict__, "backend": backend,
                        # several segments, so chunk streams cross segment
                        # boundaries mid-tile in the batched virtual grid too
                        "segment_chunks": 7})

    def batched_loss(ndc, conic, colors, opac):
        out = rasterize_batched(ndc, conic, colors, opac, jnp.asarray(depth_b),
                                jnp.asarray(valid_b), jnp.asarray(bg), W, H, c)
        return jnp.sum(out["render"] ** 2), out

    (_, out_b), g_b = jax.value_and_grad(batched_loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(
        jnp.asarray(ndc_b), jnp.asarray(conic_b), jnp.asarray(colors_b),
        jnp.asarray(opac_b))

    per_cam_rendered = []
    for i in range(ndc_b.shape[0]):
        def one_loss(ndc, conic, colors, opac):
            out = rasterize(ndc, conic, colors, opac, jnp.asarray(depth_b[i]),
                            jnp.asarray(valid_b[i]), jnp.asarray(bg), W, H, c)
            return jnp.sum(out["render"] ** 2), out

        (_, out_1), g_1 = jax.value_and_grad(one_loss, argnums=(0, 1, 2, 3),
                                             has_aux=True)(
            jnp.asarray(ndc_b[i]), jnp.asarray(conic_b[i]),
            jnp.asarray(colors_b[i]), jnp.asarray(opac_b[i]))
        per_cam_rendered.append(int(out_1["num_rendered"]))
        np.testing.assert_allclose(np.asarray(out_b["render"][i]),
                                   np.asarray(out_1["render"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_b["final_T"][i]),
                                   np.asarray(out_1["final_T"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_b["radii"][i]),
                                      np.asarray(out_1["radii"]))
        np.testing.assert_array_equal(np.asarray(out_b["visibility"][i]),
                                      np.asarray(out_1["visibility"]))
        for a, b, name in zip(g_b, g_1, ["ndc", "conic", "colors", "opacity"]):
            # rtol 1e-2: the batched virtual grid changes segment/chunk
            # boundaries, so the kernel's reduction order differs from the
            # per-camera call (measured worst case 0.6% rel on conic grads
            # in interpret mode)
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b),
                                       rtol=1e-2, atol=1e-4, err_msg=name)
    # num_rendered is the TRUE total instance count; num_rendered_bound is
    # the conservative B * max per-camera value overflow checks compare
    # against the full capacity (capacity/truncation are per camera)
    assert int(out_b["num_rendered"]) == sum(per_cam_rendered)
    assert int(out_b["num_rendered_bound"]) == len(per_cam_rendered) * max(
        per_cam_rendered)


@pytest.mark.parametrize("backend", ["jnp"])
def test_packed_sort_matches_exact(scene, cfg, backend):
    """sort_mode='packed' (one (tile|depth-bits) i32 key) == 'exact' (3-key
    f32-depth sort): same image, final_T and gradients on a random scene
    (bucket collisions are tie-broken by gid, the same order exact gives
    exactly-equal depths)."""
    mean, conic, colors, opac, depth, valid, bg = scene
    ndc = pix_to_ndc(mean)

    outs = {}
    for mode in ("packed", "exact"):
        c = RasterConfig(**{**cfg.__dict__, "backend": backend,
                            "sort_mode": mode})

        def loss(ndc_, conic_, colors_, opac_):
            out = rasterize(ndc_, conic_, colors_, opac_, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return jnp.sum(out["render"] ** 2), out

        (_, out), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(
            jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opac))
        outs[mode] = (out, g)

    op, gp = outs["packed"]
    oe, ge = outs["exact"]
    np.testing.assert_allclose(np.asarray(op["render"]),
                               np.asarray(oe["render"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(op["final_T"]),
                               np.asarray(oe["final_T"]), rtol=1e-5, atol=1e-6)
    assert int(op["num_rendered"]) == int(oe["num_rendered"])
    for a, b in zip(gp, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bwd_matmul_bf16x2_close_to_highest(scene, cfg):
    """bwd_matmul='bf16x2' (3-pass split-operand backward matmuls) stays
    within gradient tolerance of HIGHEST.  Interpret-mode check of the
    wiring + numerics; the on-hardware gate is tools/tpu_parity_check.py."""
    mean, conic, colors, opac, depth, valid, bg = scene
    ndc = pix_to_ndc(mean)

    grads = {}
    for mode in ("highest", "bf16x2"):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas",
                            "bwd_matmul": mode})

        def loss(ndc_, conic_, colors_, opac_):
            out = rasterize(ndc_, conic_, colors_, opac_, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return jnp.sum(out["render"] ** 2)

        grads[mode] = jax.grad(loss, argnums=(0, 1, 2, 3))(
            jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opac))

    for a, b, name in zip(grads["bf16x2"], grads["highest"],
                          ["ndc", "conic", "colors", "opacity"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=name)


def test_power_mode_validation_and_large_tile_fallback():
    """ADVICE r3: (a) an unknown power_mode must raise, not silently bench
    the HIGHEST oracle; (b) split2/split3 rely on a bf16-exact pixel basis
    (tiles <= 32) and must resolve to the matmul path for larger tiles
    instead of silently corrupting the exponent."""
    from gaussianhaircut_tpu.ops.rasterize.pallas_core import (
        _basis_exact_bf16, _resolve_power_mode)

    small = RasterConfig(tile_w=32, tile_h=32, power_mode="split3")
    assert _basis_exact_bf16(small)
    assert _resolve_power_mode(small) == "split3"

    big = RasterConfig(tile_w=64, tile_h=64, power_mode="split3")
    assert not _basis_exact_bf16(big)
    assert _resolve_power_mode(big) == "matmul"
    big2 = RasterConfig(tile_w=64, tile_h=64, power_mode="split2")
    assert _resolve_power_mode(big2) == "matmul"
    # vpu/matmul are basis-independent and pass through
    assert _resolve_power_mode(
        RasterConfig(tile_w=64, tile_h=64, power_mode="vpu")) == "vpu"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="power_mode"):
        _resolve_power_mode(RasterConfig(power_mode="splat3"))


def test_reduce_trimm_cumsum_close(scene, cfg):
    """reduce_cumsum="trimm" re-associates the f32 segment prefix-sum as
    blocked triangular matmuls — deterministic but not bit-identical to the
    linear cumsum; gradients must stay at f32-re-association tolerance in
    rowmajor and scatter modes.  (A raw-bf16 payload variant was tried and
    REJECTED here: segment sums with internal cancellation amplified the
    2^-8 row quantization to ~0.7 relative gradient error.)"""
    mean_pix, conic, colors, opacity, depth, valid, bg = scene
    ndc = pix_to_ndc(mean_pix)
    args = (jnp.asarray(ndc), jnp.asarray(conic), jnp.asarray(colors),
            jnp.asarray(opacity))

    def run(**kw):
        c = RasterConfig(**{**cfg.__dict__, "backend": "pallas", **kw})

        def loss(ndc, conic, colors, opacity):
            out = rasterize(ndc, conic, colors, opacity, jnp.asarray(depth),
                            jnp.asarray(valid), jnp.asarray(bg), W, H, c)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["final_T"])

        return jax.grad(loss, argnums=(0, 1, 2, 3))(*args)

    for mode in ("rowmajor", "scatter", "featmajor"):
        g0 = run(reduce_mode=mode, reduce_cumsum="linear")
        # trimm alone: pure f32 re-association — tight tolerance
        g1 = run(reduce_mode=mode, reduce_cumsum="trimm")
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4, err_msg=mode)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="reduce_cumsum"):
        run(reduce_cumsum="trimmm")
