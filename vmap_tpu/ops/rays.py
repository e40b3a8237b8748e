"""Camera ray geometry.

Parity with /root/reference/vmap.py:31-41 (origin_dirs_W) and
vmap.py:494-524 (cameraInfo ray-direction cache). The whole codebase keeps
the reference's transposed (W, H) image layout: axis 0 is the horizontal
pixel index u, axis 1 the vertical index v (dataset.py:87-91), and 2D bboxes
are [u_low, u_high, v_low, v_high].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_dirs_cache(width: int, height: int, fx: float, fy: float,
                   cx: float, cy: float) -> jax.Array:
    """[W, H, 3] per-pixel camera-frame ray directions with z-depth
    convention: [(u-cx)/fx, (v-cy)/fy, 1] (vmap.py:508-524)."""
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    dirs = jnp.ones((width, height, 3), dtype=jnp.float32)
    dirs = dirs.at[:, :, 0].set(((u - cx) / fx)[:, None])
    dirs = dirs.at[:, :, 1].set(((v - cy) / fy)[None, :])
    return dirs


def origin_dirs_w(t_wc: jax.Array, dirs_c: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Transform camera-frame ray dirs to world frame.

    t_wc: [n, 4, 4] camera-to-world poses; dirs_c: [n, m, 3].
    Returns (origins [n, 3], dirs_w [n, m, 3]) (vmap.py:31-41).
    """
    dirs_w = jnp.einsum("nij,nmj->nmi", t_wc[:, :3, :3], dirs_c)
    origins = t_wc[:, :3, 3]
    return origins, dirs_w
