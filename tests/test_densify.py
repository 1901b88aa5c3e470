"""Densification semantics: clone, split, prune, opacity reset, moment surgery."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.train import densify, optim


def _state(n=8, cap=32, scale=0.01):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0.3, 0.7, (n, 3)).astype(np.float32)
    st = gm.create_from_pcd(pts, cols, cap, 1, 1.0)
    st = st.replace(params=st.params._replace(
        scaling=jnp.full((cap, 3), np.log(scale), jnp.float32)))
    return st


def test_clone_small_high_grad_gaussians():
    st = _state(scale=0.001)  # max scale < percent_dense * extent -> clone
    opt = optim.adam_init(st.params)
    opt = optim.AdamState(jax.tree.map(lambda x: x + 1.0, opt.mu), opt.nu,
                          opt.count)
    aux = st.aux._replace(
        xyz_grad_accum=jnp.where(jnp.arange(32) < 2, 1.0, 0.0),
        denom=jnp.ones(32))
    st = st.replace(aux=aux)
    st2, opt2 = densify.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), grad_threshold=0.5, min_opacity=0.005,
        extent=1.0, max_screen_size=None, percent_dense=0.01)
    # 2 hot small gaussians cloned -> 10 alive
    assert int(st2.num_alive()) == 10
    # clones land in previously-dead slots with zeroed Adam moments
    new_rows = np.asarray(st2.aux.alive)[8:]
    dests = np.nonzero(new_rows)[0] + 8
    for d in dests:
        assert float(np.abs(np.asarray(opt2.mu.xyz)[d]).sum()) == 0.0
        np.testing.assert_allclose(np.asarray(st2.params.xyz)[d],
                                   np.asarray(st.params.xyz)[:2][list(dests).index(d)])
    # stats reset
    assert float(jnp.sum(st2.aux.xyz_grad_accum)) == 0.0


def test_split_large_high_grad_gaussians():
    st = _state(scale=0.5)  # max scale > percent_dense * extent -> split
    opt = optim.adam_init(st.params)
    aux = st.aux._replace(
        xyz_grad_accum=jnp.where(jnp.arange(32) < 1, 1.0, 0.0),
        denom=jnp.ones(32))
    st = st.replace(aux=aux)
    st2, _ = densify.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), grad_threshold=0.5, min_opacity=0.005,
        extent=1.0, max_screen_size=None, percent_dense=0.01)
    # 1 split: parent dies, 2 children -> 8 - 1 + 2 = 9
    assert int(st2.num_alive()) == 9
    # children have scale / 1.6
    alive2 = np.asarray(st2.aux.alive)
    child_rows = np.nonzero(alive2[8:])[0] + 8
    s = np.exp(np.asarray(st2.params.scaling)[child_rows])
    np.testing.assert_allclose(s, 0.5 / 1.6, rtol=1e-5)


def test_prune_low_opacity():
    st = _state()
    opt = optim.adam_init(st.params)
    low = st.params.opacity.at[:3].set(-10.0)  # sigmoid ~ 0
    st = st.replace(params=st.params._replace(opacity=low))
    st2, _ = densify.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), grad_threshold=9.9, min_opacity=0.005,
        extent=1.0, max_screen_size=None, percent_dense=0.01)
    assert int(st2.num_alive()) == 5


def test_opacity_reset():
    st = _state()
    opt = optim.adam_init(st.params)
    opt = optim.AdamState(opt.mu._replace(opacity=opt.mu.opacity + 3.0),
                          opt.nu, opt.count)
    st2, opt2 = densify.reset_opacity(st, opt)
    op = np.asarray(gm.get_opacity(st2.params))[np.asarray(st2.aux.alive)]
    assert (op <= 0.01 + 1e-5).all()
    assert float(jnp.abs(opt2.mu.opacity).sum()) == 0.0


def test_capacity_overflow_drops_requests():
    st = _state(n=30, cap=32, scale=0.001)
    opt = optim.adam_init(st.params)
    aux = st.aux._replace(xyz_grad_accum=jnp.ones(32) * 1.0,
                          denom=jnp.ones(32))
    st = st.replace(aux=aux)
    st2, _ = densify.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), grad_threshold=0.5, min_opacity=0.005,
        extent=1.0, max_screen_size=None, percent_dense=0.01)
    # only 2 free slots -> at most 32 alive, no corruption
    assert int(st2.num_alive()) == 32


def test_screen_radius_prune_is_dead_like_reference():
    """With max_screen_size set, large accumulated SCREEN radii must NOT
    prune (the reference's big_points_vs check reads max_radii2D that
    densification_postfix just zeroed — dead code, gaussian_model.py:675-735),
    while large WORLD scales must (big_points_ws stays live)."""
    st = _state(scale=0.001)
    opt = optim.adam_init(st.params)
    # gaussian 0: huge accumulated screen radius, small world scale -> survives
    aux = st.aux._replace(max_radii2d=jnp.where(jnp.arange(32) == 0, 500.0, 0.0))
    # gaussian 1: world scale > 0.1 * extent -> pruned
    scaling = st.params.scaling.at[1].set(np.log(0.5))
    st = st.replace(params=st.params._replace(scaling=scaling), aux=aux)
    st2, _ = densify.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), grad_threshold=10.0, min_opacity=0.005,
        extent=1.0, max_screen_size=20, percent_dense=0.01)
    alive = np.asarray(st2.aux.alive)
    assert alive[0], "screen-radius prune must be dead (reference parity)"
    assert not alive[1], "world-size prune must stay live"
    assert int(st2.num_alive()) == 7
