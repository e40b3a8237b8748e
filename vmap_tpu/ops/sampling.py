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


def _stratified_from_u(u: jax.Array, min_depth: jax.Array,
                       max_depth: jax.Array) -> jax.Array:
    """Bins-major stratified samples from given uniforms u [n_bins, ...]."""
    n_bins = u.shape[0]
    min_depth = jnp.asarray(min_depth, jnp.float32)
    max_depth = jnp.asarray(max_depth, jnp.float32)
    depth_range = max_depth - min_depth
    nd = u.ndim - 1
    edges = jnp.linspace(0.0, 1.0, n_bins + 1,
                         dtype=jnp.float32)[:-1].reshape((n_bins,) + (1,) * nd)
    lower = depth_range[None] * edges + min_depth[None]
    return lower + u * (depth_range / n_bins)[None]


def _normal_from_u(u: jax.Array, depth: jax.Array, delta: float) -> jax.Array:
    """Bins-major sorted clipped normals from uniforms u [n_bins + 1, ...]
    (see normal_bins_sampling_sm for the order-statistics construction)."""
    e = -jnp.log1p(-u)                       # Exp(1)
    csum = jnp.cumsum(e, axis=0)
    u_sorted = csum[:-1] / csum[-1:]
    u_sorted = jnp.clip(u_sorted, 1e-7, 1.0 - 1e-7)
    bins = ndtri(u_sorted) * (delta / 3.0)
    bins = jnp.clip(bins, -delta, delta)
    return depth[None] + bins


def stratified_bins_sm(key: jax.Array, min_depth: jax.Array,
                       max_depth: jax.Array, n_bins: int) -> jax.Array:
    """Bins-MAJOR stratified z samples: returns [n_bins, *shape].

    TPU layout note: with the ray batch flattened into the trailing (lane)
    axis and the bin index leading (sublanes), every op in the chain runs
    at full vector-register density. The original bins-LAST layout put the
    10-wide bin axis in the lanes — every elementwise op paid a ~12x
    density tax (the round-2 xprof "10/128-lane-density" item)."""
    min_depth = jnp.asarray(min_depth, jnp.float32)
    max_depth = jnp.asarray(max_depth, jnp.float32)
    shape = jnp.broadcast_shapes(min_depth.shape, max_depth.shape)
    u = jax.random.uniform(key, (n_bins, *shape), dtype=jnp.float32)
    return _stratified_from_u(u, min_depth, max_depth)


def stratified_bins(key: jax.Array, min_depth: jax.Array, max_depth: jax.Array,
                    n_bins: int) -> jax.Array:
    """Stratified z samples, one per bin. min/max_depth broadcastable to the
    ray batch shape; returns [..., n_bins] (vmap.py:45-72)."""
    return jnp.moveaxis(stratified_bins_sm(key, min_depth, max_depth, n_bins),
                        0, -1)


def normal_bins_sampling_sm(key: jax.Array, depth: jax.Array, n_bins: int,
                            delta: float) -> jax.Array:
    """Bins-MAJOR sorted, clipped normal samples around the surface depth.
    depth [...] -> [n_bins, ...] (vmap.py:75-87).

    Sort-free: sorted uniforms are generated directly as normalised
    exponential spacings (U_(k) = cumsum(E)_k / sum(E), exact order
    statistics), then mapped through the normal inverse CDF — a monotone
    map, so the result is EXACTLY distributed as sorted N(0, (delta/3)^2)
    draws. jnp.sort over a tiny trailing axis is disproportionately slow on
    TPU; this formulation is pure elementwise + cumsum (over the leading
    bin axis — log-depth sublane shifts, full lane density)."""
    u = jax.random.uniform(key, (n_bins + 1, *depth.shape),
                           dtype=jnp.float32)
    return _normal_from_u(u, depth, delta)


def normal_bins_sampling(key: jax.Array, depth: jax.Array, n_bins: int,
                         delta: float) -> jax.Array:
    """Sorted, clipped normal samples around the surface depth.
    depth [...] -> [..., n_bins] (vmap.py:75-87)."""
    return jnp.moveaxis(normal_bins_sampling_sm(key, depth, n_bins, delta),
                        0, -1)


def sample_z_sm(
    key: jax.Array,
    depth: jax.Array,        # [...] gt depth per ray (0 = invalid)
    state: jax.Array,        # [...] int pixel state
    min_depth: float,
    max_bound: jax.Array,    # scalar: max over the sampled depth batch
    n_cam2surface: int,
    n_bins: int,
    surface_eps: float,
    stop_eps: float,
    reuse: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Bins-MAJOR sample_z: returns (z [n_cam2surface + n_bins, ...],
    valid_depth_mask [...]). The production sampler path — every op runs
    with the ray batch in the lane axis (full density); the fused kernel
    consumes the sample-major layout directly (its z operand is
    [rows, S*rt] with sample s at lane block s).

    ``reuse > 1`` (iteration-reuse sampling, core/step.py): depth/state
    cover ONE pixel block of n rays that the frame cycles ``reuse`` times;
    z draws stay fresh for every repetition — u is drawn with a leading
    reuse axis and depth/state broadcast across it, so the returned z is
    [total, reuse * n], bit-identical to calling with pre-tiled inputs
    (uniform bits depend only on the total draw count, and every branch
    below is elementwise). valid stays UNTILED ([n]; it is periodic)."""
    valid = depth > min_depth
    total = n_cam2surface + n_bins
    if reuse > 1:
        assert depth.ndim == 1, depth.shape
        nu = max(n_cam2surface + n_bins + 1, total)
        u = jax.random.uniform(key, (nu, reuse, depth.shape[0]),
                               dtype=jnp.float32)
        zero = jnp.zeros_like(depth)
        z_invalid = _stratified_from_u(
            u[:total], zero + min_depth,
            jnp.broadcast_to(max_bound, depth.shape))
        z_front = _stratified_from_u(u[:n_cam2surface], zero + min_depth,
                                     depth - surface_eps)
        z_this = _normal_from_u(u[n_cam2surface:n_cam2surface + n_bins + 1],
                                depth, surface_eps)
        z_other = _stratified_from_u(u[n_cam2surface:n_cam2surface + n_bins],
                                     depth - surface_eps, depth + stop_eps)
        is_this = (state == THIS_OBJ)
        z_back = jnp.where(is_this[None], z_this, z_other)
        z_valid = jnp.concatenate([z_front, z_back], axis=0)
        z = jnp.where(valid[None], z_valid, z_invalid)   # [total, reuse, n]
        return z.reshape(total, reuse * depth.shape[0]), valid

    # ONE uniform block feeds all four samplers. The four per-ray branch
    # outcomes (invalid | front+this | front+other) are MUTUALLY EXCLUSIVE
    # given (depth, state) — which are independent of these uniforms — so
    # sharing the underlying draws between branches is distributionally
    # EXACT per ray, and cuts the threefry bit generation ~2.6x (the
    # branch-free sampler previously drew 3n_bins + n_cam2surface + total
    # + 1 uniforms per ray; RNG was measured as the dominant sampler cost
    # once the layout tax was fixed — docs/round_notes.md round 3).
    # Row budget: front rows [0, n_b2s), back rows [n_b2s, n_b2s+n_bins+1)
    # (the "+1" is the exponential-spacing order-statistics tail draw);
    # the invalid branch reuses rows [0, total).
    nu = max(n_cam2surface + n_bins + 1, total)
    u = jax.random.uniform(key, (nu, *depth.shape), dtype=jnp.float32)

    zero = jnp.zeros_like(depth)
    z_invalid = _stratified_from_u(u[:total], zero + min_depth,
                                   jnp.broadcast_to(max_bound, depth.shape))
    z_front = _stratified_from_u(u[:n_cam2surface], zero + min_depth,
                                 depth - surface_eps)
    z_this = _normal_from_u(u[n_cam2surface:n_cam2surface + n_bins + 1],
                            depth, surface_eps)
    z_other = _stratified_from_u(u[n_cam2surface:n_cam2surface + n_bins],
                                 depth - surface_eps, depth + stop_eps)

    is_this = (state == THIS_OBJ)
    z_back = jnp.where(is_this[None], z_this, z_other)
    z_valid = jnp.concatenate([z_front, z_back], axis=0)
    z = jnp.where(valid[None], z_valid, z_invalid)
    return z, valid


def sample_z(
    key: jax.Array,
    depth: jax.Array,
    state: jax.Array,
    min_depth: float,
    max_bound: jax.Array,
    n_cam2surface: int,
    n_bins: int,
    surface_eps: float,
    stop_eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (z [..., n_cam2surface + n_bins], valid_depth_mask [...])."""
    z, valid = sample_z_sm(key, depth, state, min_depth, max_bound,
                           n_cam2surface, n_bins, surface_eps, stop_eps)
    return jnp.moveaxis(z, 0, -1), valid


def rays_to_points(origins: jax.Array, dirs_w: jax.Array, z: jax.Array,
                   obj_center: jax.Array | float = 0.0) -> jax.Array:
    """[n_kf, 3] origins + [n_kf, n_px, 3] dirs x [n_kf, n_px, S] z
    -> [n_kf, n_px, S, 3] world points, shifted by obj_center
    (vmap.py:455-457)."""
    pts = origins[:, None, None, :] + dirs_w[:, :, None, :] * z[..., None]
    return pts - obj_center
