"""Depth-guided ray sampling, branch-free for XLA.

Parity with /root/reference/vmap.py:45-87 (stratified / truncated-normal bin
samplers) and vmap.py:366-459 (the 3-way per-pixel-state sampling strategy),
re-expressed as masked ``jnp.where`` composition so the whole sampler traces
into a single fused program (the reference branches on data-dependent
nonzero counts, which cannot compile under jit).

Strategy per ray (sample_z):
  * invalid depth (d <= min_depth): all (n_cam2surface + n_bins) z stratified
    in [min_depth, max(batch depth)]   (vmap.py:395-404; note the far bound
    is the max over the *sampled batch*, vmap.py:397)
  * valid depth: first n_cam2surface z stratified in [min_depth, d - eps];
    last n_bins:
      - this-object pixels: d + clip(sorted N(0, (eps/3)^2), -eps, +eps)
      - other pixels:       stratified in [d - eps, d + stop_eps]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

# pixel states (vmap.py:153-156)
OTHER_OBJ = 0
THIS_OBJ = 1
UNKNOWN_OBJ = 2


def stratified_bins(key: jax.Array, min_depth: jax.Array, max_depth: jax.Array,
                    n_bins: int) -> jax.Array:
    """Stratified z samples, one per bin. min/max_depth broadcastable to the
    ray batch shape; returns [..., n_bins] (vmap.py:45-72)."""
    min_depth = jnp.asarray(min_depth, jnp.float32)
    max_depth = jnp.asarray(max_depth, jnp.float32)
    shape = jnp.broadcast_shapes(min_depth.shape, max_depth.shape)
    depth_range = max_depth - min_depth
    edges = jnp.linspace(0.0, 1.0, n_bins + 1, dtype=jnp.float32)[:-1]
    lower = depth_range[..., None] * edges + min_depth[..., None]
    bin_len = depth_range / n_bins
    u = jax.random.uniform(key, (*shape, n_bins), dtype=jnp.float32)
    return lower + u * bin_len[..., None]


def normal_bins_sampling(key: jax.Array, depth: jax.Array, n_bins: int,
                         delta: float) -> jax.Array:
    """Sorted, clipped normal samples around the surface depth.
    depth [...] -> [..., n_bins] (vmap.py:75-87).

    Sort-free: sorted uniforms are generated directly as normalised
    exponential spacings (U_(k) = cumsum(E)_k / sum(E), exact order
    statistics), then mapped through the normal inverse CDF — a monotone
    map, so the result is EXACTLY distributed as sorted N(0, (delta/3)^2)
    draws. jnp.sort over a tiny trailing axis is disproportionately slow on
    TPU; this formulation is pure elementwise + cumsum."""
    e = -jnp.log1p(-jax.random.uniform(
        key, (*depth.shape, n_bins + 1), dtype=jnp.float32))  # Exp(1)
    csum = jnp.cumsum(e, axis=-1)
    u_sorted = csum[..., :-1] / csum[..., -1:]
    # clamp away from {0,1} so ndtri stays finite; clipping below dominates
    u_sorted = jnp.clip(u_sorted, 1e-7, 1.0 - 1e-7)
    bins = ndtri(u_sorted) * (delta / 3.0)
    bins = jnp.clip(bins, -delta, delta)
    return depth[..., None] + bins


def sample_z(
    key: jax.Array,
    depth: jax.Array,        # [...] gt depth per ray (0 = invalid)
    state: jax.Array,        # [...] int pixel state
    min_depth: float,
    max_bound: jax.Array,    # scalar: max over the sampled depth batch
    n_cam2surface: int,
    n_bins: int,
    surface_eps: float,
    stop_eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (z [..., n_cam2surface + n_bins], valid_depth_mask [...])."""
    k_inv, k_front, k_this, k_other = jax.random.split(key, 4)
    valid = depth > min_depth
    total = n_cam2surface + n_bins

    z_invalid = stratified_bins(k_inv, jnp.full_like(depth, min_depth),
                                jnp.broadcast_to(max_bound, depth.shape), total)
    z_front = stratified_bins(k_front, jnp.full_like(depth, min_depth),
                              depth - surface_eps, n_cam2surface)
    z_this = normal_bins_sampling(k_this, depth, n_bins, surface_eps)
    z_other = stratified_bins(k_other, depth - surface_eps,
                              depth + stop_eps, n_bins)

    is_this = (state == THIS_OBJ)
    z_back = jnp.where(is_this[..., None], z_this, z_other)
    z_valid = jnp.concatenate([z_front, z_back], axis=-1)
    z = jnp.where(valid[..., None], z_valid, z_invalid)
    return z, valid


def rays_to_points(origins: jax.Array, dirs_w: jax.Array, z: jax.Array,
                   obj_center: jax.Array | float = 0.0) -> jax.Array:
    """[n_kf, 3] origins + [n_kf, n_px, 3] dirs x [n_kf, n_px, S] z
    -> [n_kf, n_px, S, 3] world points, shifted by obj_center
    (vmap.py:455-457)."""
    pts = origins[:, None, None, :] + dirs_w[:, :, None, :] * z[..., None]
    return pts - obj_center
