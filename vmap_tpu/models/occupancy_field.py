"""High-level single-field API over the pure ops.

Convenience wrapper for users who want one neural field outside the
Mapper/bank machinery (e.g. offline fitting, field inspection, exporting):

    field = OccupancyField.create(jax.random.PRNGKey(0), hidden=32, scale=2.0)
    occ, color = field(points)                      # forward
    field = field.fit_step(batch, lr=1e-3)          # not provided — use Mapper
    mesh = field.extract_mesh(bound, grid_dim=128)

Architecture parity with the reference OccupancyMap + UniDirsEmbed
(model.py:16-85, embedding.py:43-91); see ops/mlp.py and ops/embedding.py.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from vmap_tpu.ops.embedding import embed, init_pe_params
from vmap_tpu.ops.mlp import init_mlp_params, mlp_apply
from vmap_tpu.ops.render import occupancy_activation


@flax.struct.dataclass
class OccupancyField:
    pe: dict
    mlp: dict
    scale: jax.Array
    hidden: int = flax.struct.field(pytree_node=False, default=32)
    max_deg: int = flax.struct.field(pytree_node=False, default=5)

    @classmethod
    def create(cls, key: jax.Array, hidden: int = 32, scale: float = 2.0,
               max_deg: int = 5) -> "OccupancyField":
        return cls(pe=init_pe_params(key),
                   mlp=init_mlp_params(key, hidden),
                   scale=jnp.float32(scale), hidden=hidden, max_deg=max_deg)

    def __call__(self, points: jax.Array) -> tuple[jax.Array, jax.Array]:
        """points [..., 3] -> (occupancy [...], color [..., 3])."""
        emb = embed(self.pe, points, self.scale, self.max_deg)
        alpha, color = mlp_apply(self.mlp, emb)
        return occupancy_activation(alpha[..., 0]), color

    def raw_alpha(self, points: jax.Array) -> jax.Array:
        emb = embed(self.pe, points, self.scale, self.max_deg)
        alpha, _ = mlp_apply(self.mlp, emb, do_color=False)
        return alpha[..., 0]

    def eval_points(self, points, chunk: int = 1 << 17, backend: str = "auto"):
        """Chunked host-side evaluation (numpy in/out), Pallas on TPU."""
        from vmap_tpu.core.meshing import eval_points
        return eval_points(self.pe, self.mlp, self.scale, points,
                           max_deg=self.max_deg, chunk=chunk, backend=backend)

    def extract_mesh(self, bound, grid_dim: int = 128,
                     bound_extent: float = 0.9):
        """Marching-cubes mesh of the field inside an OrientedBox."""
        import numpy as np
        from vmap_tpu.geometry.marching_cubes import marching_cubes
        from vmap_tpu.geometry.mesh import Mesh
        from vmap_tpu.ops.render import make_3d_grid

        scene_scale = bound.extent / (2.0 * bound_extent)
        transform = np.eye(4, dtype=np.float32)
        transform[:3, :3] = bound.R
        transform[:3, 3] = bound.center
        grid = make_3d_grid((-1.0, 1.0), grid_dim,
                            transform=jnp.asarray(transform),
                            scale=jnp.asarray(scene_scale, jnp.float32))
        occ, _ = self.eval_points(np.asarray(grid).reshape(-1, 3))
        verts, faces = marching_cubes(occ.reshape(grid_dim, grid_dim, grid_dim))
        if verts is None:
            return None
        mesh = Mesh(verts, faces)
        mesh.apply_scale(1.0 / (grid_dim - 1))
        mesh.apply_translation([-0.5, -0.5, -0.5])
        mesh.apply_scale(2.0)
        mesh.apply_scale(scene_scale)
        mesh.apply_transform(transform)
        _, colors = self.eval_points(mesh.vertices.astype(np.float32))
        mesh.vertex_colors = np.clip(colors * 255, 0, 255).astype(np.uint8)
        return mesh
