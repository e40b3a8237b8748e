"""Pure-function compute ops (JAX): positional encoding, occupancy MLP,
volume rendering, depth-guided sampling, and masked losses."""

from vmap_tpu.ops import embedding, losses, mlp, render, rays, sampling  # noqa: F401
