"""Per-leaf Adam with torch semantics + the exponential LR schedule.

A hand-rolled Adam (rather than optax.adam) because densification performs
moment "surgery" — zeroing moment rows for cloned/split/reset slots, the JAX
analog of the reference's optimizer-state replacement
(gaussian_model.py:581-677) — which needs the moments exposed as a plain
pytree.  Update rule matches torch.optim.Adam(eps=1e-15)
(gaussian_model.py:444): m-hat / (sqrt(v-hat) + eps).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AdamState(NamedTuple):
    mu: any
    nu: any
    count: jnp.ndarray


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, lrs, b1: float = 0.9,
                b2: float = 0.999, eps: float = 1e-15, mode: str = "leaf"):
    """Returns (updates, new_state).  `lrs` is a pytree of scalars (static or
    traced) matching `grads`; a leaf lr of 0 freezes that leaf.

    mode="leaf" (default): straight tree.map — one fused elementwise kernel
    per leaf, scalar lr, no relayouts.  mode="flat": ravel+concat the whole
    tree into one vector first.  Flat LOOKED attractive against per-leaf
    dispatch overhead, but on hardware every reshape(-1) of a lane-padded
    [N, 3]-ish leaf is a relayout copy and the lr broadcast materializes a
    full vector: measured 21.8 ms vs 4-8 ms per-leaf at bench scale
    (tools/tpu_profile_step.py Adam_only, 2026-08-17) — kept only for
    comparison harnesses."""
    count = state.count + 1
    c1 = 1 - b1 ** count.astype(jnp.float32)
    c2 = 1 - b2 ** count.astype(jnp.float32)

    if mode == "leaf":
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        updates = jax.tree.map(
            lambda lr, m, v: -jnp.asarray(lr, m.dtype) * (m / c1)
            / (jnp.sqrt(v / c2) + eps), lrs, mu, nu)
        return updates, AdamState(mu, nu, count)

    g_leaves, treedef = jax.tree.flatten(grads)
    mu_leaves = jax.tree.leaves(state.mu)
    nu_leaves = jax.tree.leaves(state.nu)
    lr_leaves = jax.tree.leaves(
        jax.tree.map(lambda lr, g: jnp.broadcast_to(
            jnp.asarray(lr, g.dtype), (g.size,)), lrs, grads))
    shapes = [g.shape for g in g_leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    fg = jnp.concatenate([g.reshape(-1) for g in g_leaves])
    fm = jnp.concatenate([m.reshape(-1) for m in mu_leaves])
    fv = jnp.concatenate([v.reshape(-1) for v in nu_leaves])
    fl = jnp.concatenate(lr_leaves)

    fm = b1 * fm + (1 - b1) * fg
    fv = b2 * fv + (1 - b2) * fg * fg
    fu = -fl * (fm / c1) / (jnp.sqrt(fv / c2) + eps)

    def unflat(flat):
        parts = []
        off = 0
        for sh, sz in zip(shapes, sizes):
            parts.append(flat[off:off + sz].reshape(sh))
            off += sz
        return jax.tree.unflatten(treedef, parts)

    return unflat(fu), AdamState(unflat(fm), unflat(fv), count)


def apply_updates(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


def adamw_update(grads, state: AdamState, params, lr, b1: float = 0.9,
                 b2: float = 0.999, eps: float = 1e-8, weight_decay: float = 0.01):
    """torch.optim.AdamW semantics (decoupled decay applied with the lr),
    used by the stage-2/3 strand optimizers
    (gaussian_model_latent_strands.py:518)."""
    count = state.count + 1
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    c1 = 1 - b1 ** count.astype(jnp.float32)
    c2 = 1 - b2 ** count.astype(jnp.float32)
    updates = jax.tree.map(
        lambda m, v, p: -lr * ((m / c1) / (jnp.sqrt(v / c2) + eps)
                               + weight_decay * p),
        mu, nu, params)
    return updates, AdamState(mu, nu, count)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: float = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Log-linear LR decay with optional sine delay ramp — same curve as the
    reference's Plenoxels-derived helper (general_utils.py:30-63)."""
    if (isinstance(lr_init, (int, float)) and isinstance(lr_final, (int, float))
            and lr_init == 0.0 and lr_final == 0.0):
        return jnp.zeros(())
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay * log_lerp)


def clip_by_global_norm(grads, max_norm: float):
    """Global-norm gradient clipping (torch.nn.utils.clip_grad_norm_
    semantics).  Returns (clipped_grads, global_norm).

    The reference's stage-2/3 optimizers run unclipped — but they optimize a
    PRETRAINED NeuralHaircut strand decoder (hair_strands_textured.yaml
    decoder_checkpoint_path, gaussian_model_latent_strands.py:99-104), whose
    latent->strand map is already smooth.  This framework trains the decoder
    from scratch, and measured at the reference operating point (L=100,
    10k strands, 512 px; runs/r4 metrics.jsonl) a single bad-view gradient
    spike at ~iter 940 — amplified by Adam's stale second moment — blew the
    hair mask loss up 0.11 -> 0.67 with a ~60% instance-count jump and no
    recovery for 600+ iters.  Clipping neutralizes exactly that event class;
    NaN-guard step skipping (grads_are_finite) is unchanged."""
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), gnorm


def global_norm(grads) -> jnp.ndarray:
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def cap_norm_relative(grads, ref_grads, ratio: float):
    """Scale `grads` so its global norm is at most ratio * ||ref_grads||.
    Returns (capped_grads, applied_scale).  Keeps a regularizer term from
    drowning the data terms in per-coordinate Adam (see
    OptimizationConfig.sds_grad_ratio)."""
    n_ref = global_norm(ref_grads)
    n_g = global_norm(grads)
    scale = jnp.minimum(1.0, ratio * n_ref / jnp.maximum(n_g, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), scale


def grads_are_finite(grads) -> jnp.ndarray:
    """True iff every gradient entry is finite — the NaN-guard that skips the
    whole step like train_gaussians.py:175-178."""
    leaves = jax.tree.leaves(jax.tree.map(
        lambda g: jnp.all(jnp.isfinite(g)), grads))
    return jnp.stack(leaves).all()
