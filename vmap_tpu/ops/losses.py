"""Masked multi-object training losses.

Parity with /root/reference/loss.py:5-62 + render_rays.py:67-96, generalised
to a fixed-capacity object bank with an ``active`` mask (inactive slots
contribute exactly zero loss and zero gradient).

Semantics reproduced exactly:
  * mask_obj = sem != 0 (this object + unknown), mask_sem = sem != 2
    (this + other objects) — loss.py:16-19.
  * depth: L1 on rendered depth, restricted to (valid depth & mask_obj),
    weighted by 1/(sqrt(var)+1e-4) where var is the (detached)
    termination-weighted depth variance — loss.py:27-39, render_rays.py:74-81.
  * colour: L1 summed over RGB, on mask_obj, x5 — loss.py:43-46,59.
  * opacity: L1 between sum of termination and the binary object mask, on
    mask_sem, x10 — loss.py:53-59.
  * per-object reduction: sum over rays / (mask count + 1e-10); if ANY active
    object has zero valid rays for a term, that term is zeroed for ALL
    objects (the reference's batch-wide early-out, render_rays.py:68-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmap_tpu.ops import render as rr


def reduce_batch_loss(loss_mat: jax.Array, mask: jax.Array, active: jax.Array,
                      var: jax.Array | None = None) -> jax.Array:
    """Per-object masked mean -> [n_obj].

    loss_mat, mask: [n_obj, n_rays]; active: [n_obj] bool.
    Mirrors render_rays.reduce_batch_loss(avg=True) including the
    "any empty batch -> all zero" behaviour, evaluated over active slots only.
    """
    if var is not None:
        information = 1.0 / (jnp.sqrt(var) + 1e-4)  # L1 branch, render_rays.py:79
        loss_mat = loss_mat * information
    cnt = mask.sum(axis=-1)
    per_obj = loss_mat.sum(axis=-1) / (cnt + 1e-10)
    any_empty = jnp.any(active & (cnt == 0))
    per_obj = jnp.where(any_empty, 0.0, per_obj)
    return jnp.where(active, per_obj, 0.0)


def step_batch_loss(
    alpha: jax.Array,        # [n_obj, n_rays, n_samples]
    color: jax.Array,        # [n_obj, n_rays, n_samples, 3]
    gt_depth: jax.Array,     # [n_obj, n_rays]
    gt_color: jax.Array,     # [n_obj, n_rays, 3] in [0, 1]
    sem_labels: jax.Array,   # [n_obj, n_rays] int: 0 other, 1 this, 2 unknown
    mask_depth: jax.Array,   # [n_obj, n_rays] bool, valid depth
    z_vals: jax.Array,       # [n_obj, n_rays, n_samples]
    active: jax.Array,       # [n_obj] bool
    color_scaling: float = 5.0,
    opacity_scaling: float = 10.0,
) -> tuple[jax.Array, jax.Array]:
    """Returns (scalar loss over active objects, per-object loss [n_obj])."""
    mask_obj = sem_labels != 0
    mask_sem = sem_labels != 2

    occupancy = rr.occupancy_activation(alpha)
    termination = rr.occupancy_to_termination(occupancy)

    render_depth = rr.render(termination, z_vals)
    diff_sq = (z_vals - render_depth[..., None]) ** 2
    var = jax.lax.stop_gradient(rr.render(termination, diff_sq))  # loss.py:29
    render_color = rr.render(termination[..., None], color, axis=-2)
    render_opacity = termination.sum(axis=-1)

    m_do = mask_depth & mask_obj
    loss_depth = rr.render_loss(render_depth, gt_depth) * m_do
    loss_depth = reduce_batch_loss(loss_depth, m_do, active, var=var)

    loss_col = rr.render_loss(render_color, gt_color).sum(-1) * mask_obj
    loss_col = reduce_batch_loss(loss_col, mask_obj, active)

    loss_opacity = rr.render_loss(render_opacity, mask_obj.astype(render_opacity.dtype)) * mask_sem
    loss_opacity = reduce_batch_loss(loss_opacity, mask_sem, active)

    l_batch = loss_depth + loss_col * color_scaling + loss_opacity * opacity_scaling
    return l_batch.sum(), l_batch
