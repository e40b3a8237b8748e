"""Volume-rendering ops for occupancy fields.

Parity with /root/reference/render_rays.py: sigmoid occupancy activation
(:4-8), shifted-cumprod termination probabilities (:26-45), weighted-sum
rendering (:47-51), and the 3D eval grid constructor (:98-122). Everything is
a pure jnp function over arbitrary leading batch axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def occupancy_activation(alpha: jax.Array) -> jax.Array:
    """UniSURF-style occupancy = sigmoid(raw alpha) (render_rays.py:4-8)."""
    return jax.nn.sigmoid(alpha)


def occupancy_to_termination(occ: jax.Array) -> jax.Array:
    """Termination probability along the sample axis (last axis).

    term_i = occ_i * prod_{j<i} (1 - occ_j + 1e-10)  (render_rays.py:26-45).
    """
    free = 1.0 - occ + 1e-10
    shifted = jnp.concatenate(
        [jnp.ones_like(free[..., :1]), free[..., :-1]], axis=-1)
    return occ * jnp.cumprod(shifted, axis=-1)


def render(termination: jax.Array, vals: jax.Array, axis: int = -1) -> jax.Array:
    """Weighted sum of per-sample values (render_rays.py:47-51)."""
    return (termination * vals).sum(axis=axis)


def render_loss(rendered: jax.Array, gt: jax.Array, loss: str = "L1",
                normalise: bool = False) -> jax.Array:
    """Per-element residual loss (render_rays.py:53-65)."""
    residual = rendered - gt
    if loss == "L2":
        mat = residual ** 2
    elif loss == "L1":
        mat = jnp.abs(residual)
    else:
        raise ValueError(f"loss type {loss} not implemented")
    if normalise:
        mat = mat / gt
    return mat


def make_3d_grid(occ_range=(-1.0, 1.0), dim: int = 256, transform=None,
                 scale=None, dtype=jnp.float32) -> jax.Array:
    """[dim, dim, dim, 3] grid of points in ``occ_range``, optionally scaled
    per-axis then rigidly transformed (render_rays.py:98-122). ``transform``
    is a [4, 4] pose, ``scale`` broadcastable to [3]."""
    t = jnp.linspace(occ_range[0], occ_range[1], dim, dtype=dtype)
    gx, gy, gz = jnp.meshgrid(t, t, t, indexing="ij")
    grid = jnp.stack([gx, gy, gz], axis=-1)
    if scale is not None:
        grid = grid * scale
    if transform is not None:
        grid = grid @ transform[:3, :3].T + transform[:3, 3]
    return grid
