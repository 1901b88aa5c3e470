"""Adaptive density control under jit: masked clone/split/prune at fixed
capacity.

Reference behavior being reproduced (src/scene/gaussian_model.py:679-741 and
train_gaussians.py:160-171):
- stats: per-view accumulation of the viewspace(NDC)-gradient norm and the max
  screen radius for visible Gaussians;
- clone: grad-norm >= threshold and max scale <= percent_dense * extent ->
  duplicate in place;
- split: grad-norm >= threshold and max scale > percent_dense * extent ->
  2 children sampled from the Gaussian, scales / (0.8 * 2), parent pruned;
- prune: opacity < min_opacity, or (after the first opacity reset) screen
  radius > 20 px or world scale > 0.1 * extent;
- every structural change zeroes the affected Adam moment rows (the
  optimizer-state surgery of gaussian_model.py:596-677).

TPU-native formulation: destinations come from a rank-over-free-slots scatter
(deterministic, fully vectorized); overflowing requests are dropped (the
static-capacity tradeoff, SURVEY.md §7.1) — callers can watch `num_alive` vs
capacity and re-jit at a larger capacity outside the step function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianhaircut_tpu.models.gaussian_model import (
    GaussianAux, GaussianModelState, GaussianParams, get_opacity, get_scaling,
)
from gaussianhaircut_tpu.ops.quaternion import build_rotation
from gaussianhaircut_tpu.train.optim import AdamState


def add_stats(aux: GaussianAux, viewspace_grad: jnp.ndarray,
              radii: jnp.ndarray, visibility: jnp.ndarray) -> GaussianAux:
    """train_gaussians.py:163-164 + gaussian_model.py:739-741."""
    gn = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1)
    vis = visibility
    return GaussianAux(
        alive=aux.alive,
        max_radii2d=jnp.where(vis, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
                              aux.max_radii2d),
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(vis, gn, 0.0),
        denom=aux.denom + vis.astype(jnp.float32),
    )


def _scatter_rows(tree, dest, src_tree):
    """tree[dest] = src_tree rows, dropping out-of-range dests."""
    return jax.tree.map(
        lambda t, s: t.at[dest].set(s, mode="drop"), tree, src_tree)


def _zero_rows(tree, dest):
    return jax.tree.map(lambda t: t.at[dest].set(0.0, mode="drop"), tree)


def densify_and_prune(state: GaussianModelState, opt: AdamState, key,
                      grad_threshold: float, min_opacity: float, extent: float,
                      max_screen_size, percent_dense: float):
    """One densification round.  Returns (state, opt)."""
    p = state.params
    aux = state.aux
    cap = p.xyz.shape[0]
    alive = aux.alive

    grads = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads) | ~alive, 0.0, grads)

    scaling = get_scaling(p)
    max_scale = jnp.max(scaling, axis=-1)
    hot = grads >= grad_threshold
    clone_sel = hot & (max_scale <= percent_dense * extent) & alive
    split_sel = hot & (max_scale > percent_dense * extent) & alive

    # Free-slot allocation: dead slots first, in index order.
    free = jnp.argsort(alive)                    # False (dead) sorts first
    num_free = cap - jnp.sum(alive)

    n_clone = jnp.sum(clone_sel)
    clone_rank = jnp.cumsum(clone_sel) - 1       # rank among clones
    clone_slot = jnp.where(clone_sel & (clone_rank < num_free),
                           clone_rank, cap)      # cap -> dropped
    clone_dest = jnp.where(clone_slot < cap, free[jnp.minimum(clone_slot, cap - 1)], cap)

    split_rank = jnp.cumsum(split_sel) - 1
    base = n_clone + 2 * split_rank
    s0 = jnp.where(split_sel & (base + 1 < num_free), base, cap)
    s1 = jnp.where(split_sel & (base + 1 < num_free), base + 1, cap)
    split_dest0 = jnp.where(s0 < cap, free[jnp.minimum(s0, cap - 1)], cap)
    split_dest1 = jnp.where(s1 < cap, free[jnp.minimum(s1, cap - 1)], cap)

    # ---- clone: copy raw rows (gaussian_model.py:706-721) ----
    new_params = _scatter_rows(p, clone_dest, p)

    # ---- split: sample children (gaussian_model.py:679-704) ----
    rot_m = build_rotation(p.rotation)
    k0, k1 = jax.random.split(key)
    child_params = []
    for k in (k0, k1):
        samples = jax.random.normal(k, p.xyz.shape) * scaling
        child_xyz = jnp.einsum("pij,pj->pi", rot_m, samples) + p.xyz
        child = p._replace(
            xyz=child_xyz,
            scaling=jnp.log(scaling / (0.8 * 2.0)),
        )
        child_params.append(child)
    new_params = _scatter_rows(new_params, split_dest0, child_params[0])
    new_params = _scatter_rows(new_params, split_dest1, child_params[1])

    new_alive = alive
    for dest in (clone_dest, split_dest0, split_dest1):
        new_alive = new_alive.at[dest].set(True, mode="drop")
    # parents of successful splits die
    split_ok = split_sel & (base + 1 < num_free)
    new_alive = jnp.where(split_ok, False, new_alive)

    # ---- prune (gaussian_model.py:725-735) ----
    # NOTE on big_points_vs: in the reference, densification_postfix
    # (gaussian_model.py:675-677) re-creates max_radii2D as ZEROS before
    # densify_and_prune's final prune reads it, so the screen-radius prune
    # `max_radii2D > max_screen_size` never fires — dead code inherited from
    # vanilla 3DGS.  Reproducing the live radii check here pruned every
    # accumulated-radius>20px Gaussian each round (far more aggressive than
    # the reference) and measurably hurt reconstruction; only the world-size
    # prune is active when max_screen_size is set.
    prune = (get_opacity(new_params)[:, 0] < min_opacity) & new_alive
    if max_screen_size is not None:
        big_ws = jnp.max(get_scaling(new_params), axis=-1) > 0.1 * extent
        prune = prune | (big_ws & new_alive)
    new_alive = new_alive & ~prune

    # ---- optimizer moment surgery: fresh rows start with zero moments ----
    new_mu, new_nu = opt.mu, opt.nu
    for dest in (clone_dest, split_dest0, split_dest1):
        new_mu = _zero_rows(new_mu, dest)
        new_nu = _zero_rows(new_nu, dest)

    new_aux = GaussianAux(
        alive=new_alive,
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    return (state.replace(params=new_params, aux=new_aux),
            AdamState(new_mu, new_nu, opt.count))


def reset_opacity(state: GaussianModelState, opt: AdamState):
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (gaussian_model.py:516-519, train_gaussians.py:170-171)."""
    p = state.params
    new_op = jnp.log(jnp.minimum(get_opacity(p), 0.01) /
                     (1.0 - jnp.minimum(get_opacity(p), 0.01)))
    new_params = p._replace(opacity=new_op)
    new_mu = opt.mu._replace(opacity=jnp.zeros_like(opt.mu.opacity))
    new_nu = opt.nu._replace(opacity=jnp.zeros_like(opt.nu.opacity))
    return state.replace(params=new_params), AdamState(new_mu, new_nu, opt.count)
