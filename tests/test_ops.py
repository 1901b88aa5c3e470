"""Core math ops: SH, quaternions, Lie maps, EWA projection, losses, kNN."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.ops import sh, quaternion, lie, projection, losses, knn, ssim


def test_eval_sh_deg0_is_constant(rng):
    coeffs = jnp.asarray(rng.normal(size=(5, 1, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    out = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(out, 0.28209479177387814 * coeffs[:, 0, :], rtol=1e-6)


def test_eval_sh_matches_direct_polynomial(rng):
    """Check degree-3 against an independently coded polynomial evaluation."""
    p = 16
    coeffs = rng.normal(size=(p, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(p, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = np.asarray(sh.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(dirs)))

    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    xx, yy, zz = x * x, y * y, z * z
    basis = np.concatenate([
        0.28209479177387814 * np.ones_like(x),
        -0.4886025119029199 * y, 0.4886025119029199 * z, -0.4886025119029199 * x,
        1.0925484305920792 * x * y, -1.0925484305920792 * y * z,
        0.31539156525252005 * (2 * zz - xx - yy),
        -1.0925484305920792 * x * z, 0.5462742152960396 * (xx - yy),
        -0.5900435899266435 * y * (3 * xx - yy),
        2.890611442640554 * x * y * z,
        -0.4570457994644658 * y * (4 * zz - xx - yy),
        0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
        -0.4570457994644658 * x * (4 * zz - xx - yy),
        1.445305721320277 * z * (xx - yy),
        -0.5900435899266435 * x * (xx - 3 * yy),
    ], axis=1)
    gold = np.einsum("pk,pkc->pc", basis, coeffs)
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(4, 3)).astype(np.float32))
    np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, rtol=1e-5, atol=1e-6)


def test_build_rotation_is_rotation(rng):
    q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    R = quaternion.build_rotation(q)
    eye = jnp.eye(3)[None].repeat(8, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, 1, 2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(8), atol=1e-5)


def test_build_rotation_identity():
    R = quaternion.build_rotation(jnp.asarray([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-7)


def test_parallel_transport_rotates_a_to_b(rng):
    a = rng.normal(size=(16, 3)).astype(np.float32)
    b = rng.normal(size=(16, 3)).astype(np.float32)
    q = quaternion.parallel_transport(jnp.asarray(a), jnp.asarray(b))
    R = quaternion.build_rotation(q)
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    # rows of R are the rotated frame: a_row @ R should map onto b
    rotated = np.einsum("pi,pij->pj", an, np.asarray(R))
    np.testing.assert_allclose(rotated, bn, atol=1e-5)


def test_se3_exp_small_angle_matches_first_order():
    wu = jnp.asarray([1e-4, -2e-4, 3e-4, 0.1, 0.2, 0.3], jnp.float32)
    rt = lie.se3_to_SE3(wu)
    np.testing.assert_allclose(rt[:, 3], wu[3:], rtol=1e-3)
    np.testing.assert_allclose(rt[:, :3], np.eye(3), atol=1e-3)


def test_se3_exp_pure_rotation():
    w = jnp.asarray([0.0, 0.0, math.pi / 2, 0, 0, 0], jnp.float32)
    rt = np.asarray(lie.se3_to_SE3(w))
    gold = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(rt[:, :3], gold, atol=1e-5)


def test_ortho6d_identity():
    r = lie.ortho6d_to_rotation(jnp.asarray([1.0, 0, 0, 0, 1, 0]))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_covariance_2d_isotropic_center():
    """An isotropic Gaussian at the image center projects to
    (focal * s / z)^2 * I + 0.3 dilation."""
    cam = projection.CameraGeom(
        viewmatrix=jnp.eye(4), projmatrix=jnp.eye(4),
        tan_fovx=jnp.asarray(0.5), tan_fovy=jnp.asarray(0.5),
        width=100, height=100, campos=jnp.zeros(3))
    s = 0.01
    z = 2.0
    xyz = jnp.asarray([[0.0, 0.0, z]])
    scaling = jnp.full((1, 3), s)
    rot = jnp.eye(3)[None]
    cov3d = projection.covariance_3d(scaling, rot)
    cov2d = projection.covariance_2d(xyz, cov3d, cam)
    focal = 100 / (2 * 0.5)
    expected = (focal * s / z) ** 2
    np.testing.assert_allclose(cov2d[0, 0], expected + 0.3, rtol=1e-5)
    np.testing.assert_allclose(cov2d[0, 2], expected + 0.3, rtol=1e-5)
    np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-7)


def test_conic_inverts_cov2d():
    cov2d = jnp.asarray([[2.0, 0.5, 1.0]])
    conic = projection.conic_from_cov2d(cov2d)
    det = 2.0 * 1.0 - 0.25
    np.testing.assert_allclose(conic[0], [1.0 / det, -0.5 / det, 2.0 / det], rtol=1e-5)


def test_or_loss_wraps():
    pred = jnp.full((1, 4, 4), 0.95)
    gt = jnp.full((1, 4, 4), 0.05)
    loss = losses.or_loss(pred, gt)
    np.testing.assert_allclose(loss, 0.1 * math.pi, rtol=1e-5)


def test_psnr_identity():
    img = jnp.ones((3, 8, 8)) * 0.5
    assert np.isinf(np.asarray(losses.psnr(img, img)))


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    out = np.asarray(knn.mean_knn_sq_dist(jnp.asarray(pts), k=3, block_size=64))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    gold = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, gold, rtol=1e-3, atol=1e-5)


def test_ssim_identity_and_range(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    np.testing.assert_allclose(ssim.ssim(img, img), 1.0, atol=1e-5)
    other = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    v = float(ssim.ssim(img, other))
    assert -1.0 <= v < 1.0


def test_scalp_symmetry_groups():
    from gaussianhaircut_tpu.preprocessing.scalp import (
        _SCALP_SYM_PAIRS, _SCALP_SYM_ROWS, _apply_scalp_symmetry)
    import numpy as np
    n = 450
    m = np.zeros(n, bool)
    # marking one member of a mirrored row group marks the whole group
    m[_SCALP_SYM_ROWS[0][0][0]] = True
    out = _apply_scalp_symmetry(m)
    assert out[_SCALP_SYM_ROWS[0][0]].all()
    assert out[_SCALP_SYM_ROWS[0][1]].all()
    # pairwise symmetry
    m2 = np.zeros(n, bool)
    m2[_SCALP_SYM_PAIRS[0][3]] = True
    out2 = _apply_scalp_symmetry(m2)
    assert out2[_SCALP_SYM_PAIRS[1][3]]
    # untouched vertices stay untouched
    assert out2.sum() == 2
    # robust to short (fallback) scalp orderings
    out3 = _apply_scalp_symmetry(np.zeros(10, bool))
    assert not out3.any()


def test_ssim_blur_matches_direct_conv(rng):
    """The band-matmul blur == a direct SAME-zero-padded separable conv
    (the reference's F.conv2d(padding=w//2) semantics), to f32 precision."""
    img = rng.uniform(size=(3, 20, 33)).astype(np.float32)
    win = ssim._gaussian_window(11, 1.5)
    ref = np.zeros_like(img)
    pad = np.pad(img, ((0, 0), (5, 5), (0, 0)))
    for i in range(20):
        ref[:, i] = np.tensordot(win, pad[:, i:i + 11], axes=(0, 1))
    pad2 = np.pad(ref, ((0, 0), (0, 0), (5, 5)))
    out = np.zeros_like(img)
    for j in range(33):
        out[:, :, j] = np.tensordot(win, pad2[:, :, j:j + 11], axes=(0, 2))
    got = np.asarray(ssim._blur(jnp.asarray(img)))
    np.testing.assert_allclose(got, out, rtol=1e-5, atol=1e-6)


def test_antipodal_segment_grads_finite():
    """An exactly-antipodal strand segment (seg = (-c, 0, 0)) produces a
    ZERO parallel-transport quaternion; build_rotation's normalize must be
    clamped or one such segment NaNs the entire gradient tree and the
    NaN-guard silently freezes stage-3 forever (2026-08-17 postmortem —
    reachable on TPU via bf16-quantized decoder outputs)."""
    from gaussianhaircut_tpu.models.strands import strands_to_gaussians

    pts = np.zeros((1, 3, 3), np.float32)
    pts[0, 1] = [-0.5, 0.0, 0.0]
    pts[0, 2] = [-0.5, 0.1, 0.0]

    def loss(p):
        sg = strands_to_gaussians(p, 1e-3)
        return jnp.sum(sg.rotation_matrix) + jnp.sum(sg.scaling)

    g = jax.grad(loss)(jnp.asarray(pts))
    assert bool(jnp.all(jnp.isfinite(g)))
    # zero quaternion decodes to the identity rotation
    rot = quaternion.build_rotation(jnp.zeros((1, 4)))
    np.testing.assert_allclose(rot[0], np.eye(3), atol=1e-6)


def test_prepare_fm_matches_rowmajor(rng):
    """The feature-major fused precompute (ops/precompute_fm.py) must match
    the row-major reference chain — outputs AND gradients (it is the
    differentiable surface of the whole renderer)."""
    import math as _math

    from gaussianhaircut_tpu.render import renderer

    p = 257
    xyz = rng.normal(scale=0.4, size=(p, 3)).astype(np.float32)
    quat = rng.normal(size=(p, 4)).astype(np.float32) + np.array(
        [2.0, 0, 0, 0], np.float32)
    scaling = np.exp(rng.normal(size=(p, 3)).astype(np.float32) * 0.3 - 4)
    feats = rng.normal(size=(p, 16, 3)).astype(np.float32) * 0.3
    fields = renderer.GaussianFields(
        xyz=jnp.asarray(xyz),
        features=jnp.asarray(feats),
        scaling=jnp.asarray(scaling),
        rotation_matrix=quaternion.build_rotation(jnp.asarray(quat)),
        opacity=jnp.asarray(rng.uniform(0.1, 0.9, (p, 1)).astype(np.float32)),
        label=jnp.asarray(rng.uniform(0, 1, (p, 1)).astype(np.float32)),
        orient_conf=jnp.asarray(rng.uniform(0, 2, (p, 1)).astype(np.float32)),
        valid=jnp.ones((p,), bool),
        viewspace=jnp.zeros((p, 3), jnp.float32),
        use_direction=jnp.asarray((rng.uniform(size=p) > 0.3)
                                  .astype(np.float32)),
    )
    fov = _math.radians(47.0)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, 3] = [0.03, -0.1, 2.2]
    from gaussianhaircut_tpu.scene.cameras import camera_geom
    cam = camera_geom(jnp.asarray(w2c), jnp.asarray(fov), jnp.asarray(fov),
                      96, 64, None)

    from gaussianhaircut_tpu.ops import precompute_fm

    def run(fn, f):
        ndc, conic, colors, opacity, depth, valid = fn(f, 3, cam, 1.0)
        return ndc, conic, colors, opacity, depth

    ref = run(renderer.prepare_raster_inputs_rowmajor, fields)
    got = run(precompute_fm.prepare_fm, fields)
    for a, b, name in zip(got, ref, ("ndc", "conic", "colors", "op", "depth")):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)

    # gradients through every differentiable input
    cot = [jnp.asarray(rng.normal(size=np.shape(t)).astype(np.float32))
           for t in ref]

    def loss(fn, f):
        outs = run(fn, f)
        return sum(jnp.vdot(c, o) for c, o in zip(cot, outs))

    diff = dict(xyz=fields.xyz, features=fields.features,
                scaling=fields.scaling,
                rotation_matrix=fields.rotation_matrix,
                opacity=fields.opacity, label=fields.label,
                orient_conf=fields.orient_conf)

    def wrap(fn):
        def inner(d):
            return loss(fn, fields._replace(**d))
        return inner

    g_ref = jax.grad(wrap(renderer.prepare_raster_inputs_rowmajor))(diff)
    g_got = jax.grad(wrap(precompute_fm.prepare_fm))(diff)
    for k in diff:
        np.testing.assert_allclose(
            g_got[k], g_ref[k], rtol=2e-3, atol=2e-4, err_msg=f"grad {k}")
