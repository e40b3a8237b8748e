"""Object meshing: oriented-bounds estimation and field -> mesh extraction.

Parity targets:
  * ``object_bound`` — per-object OBB from the union of masked depth
    back-projections over all stored keyframes (vmap.py:270-315), with the
    reference's 10 cm extent floor and Qhull-failure -> None behaviour;
  * ``eval_points`` — chunked no-grad field queries (trainer.py:77-95),
    here a jitted fixed-chunk scan instead of a Python chunk loop;
  * ``mesh_object`` — oriented [-1,1]^3 grid (scaled by extent/0.9 or
    /0.995 for the background, trainer.py:21-24,35-46), occupancy ->
    marching cubes at level 0.5, rescale into scene frame, then vertex
    colours by re-querying the field at the vertices (trainer.py:53-73).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.geometry.marching_cubes import marching_cubes
from vmap_tpu.geometry.mesh import Mesh
from vmap_tpu.geometry.obb import OrientedBox, obb_from_points
from vmap_tpu.ops.embedding import embed
from vmap_tpu.ops.mlp import mlp_apply
from vmap_tpu.ops.render import make_3d_grid, occupancy_activation

EVAL_CHUNK = 1 << 17  # 131072 points per jitted chunk


@partial(jax.jit, static_argnames=("max_deg",))
def _eval_chunk(pe, mlp_p, scale, pts, max_deg=5):
    emb = embed(pe, pts, scale, max_deg)
    alpha, color = mlp_apply(mlp_p, emb)
    return occupancy_activation(alpha[..., 0]), color


def eval_points(pe, mlp_p, scale, points: np.ndarray, max_deg: int = 5,
                chunk: int = EVAL_CHUNK, backend: str = "auto"):
    """(occupancy [N], color [N, 3]) for arbitrary many points; pads the
    last chunk so the jitted kernel compiles once.

    ``backend``: "auto" uses the fused Pallas field kernel on TPU (1.8x the
    XLA path at meshing scale, see kernels/ensemble.py) when the PE has the
    standard 5-band layout; "xla" / "pallas" force a path.
    """
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(pts)
    use_pallas = backend == "pallas" or (
        backend == "auto" and max_deg == 5
        and jax.default_backend() == "tpu")
    hidden = int(np.asarray(mlp_p["w_mid1"]).shape[-1])
    occs, cols = [], []
    for s in range(0, n, chunk):
        block = pts[s:s + chunk]
        pad = chunk - len(block)
        if pad:
            block = np.concatenate([block, np.zeros((pad, 3), np.float32)])
        if use_pallas:
            from vmap_tpu.kernels.ensemble import fused_eval_single
            o, c = fused_eval_single(pe, mlp_p, jnp.float32(scale),
                                     jnp.asarray(block), hidden=hidden)
        else:
            o, c = _eval_chunk(pe, mlp_p, jnp.float32(scale),
                               jnp.asarray(block), max_deg)
        occs.append(np.asarray(o)[:chunk - pad if pad else chunk])
        cols.append(np.asarray(c)[:chunk - pad if pad else chunk])
    return np.concatenate(occs), np.concatenate(cols)


def object_points(mapper, obj_id: int, stride: int = 4) -> np.ndarray:
    """World points from masked depth over every stored keyframe of an
    object (subsampled by ``stride`` for speed). Counterpart of the
    per-keyframe Open3D unprojection union in get_bound (vmap.py:270-283)."""
    from vmap_tpu.geometry.pointcloud import unproject_depth
    cfg = mapper.cfg
    rec = mapper.registry[obj_id]
    table = mapper.bg_table if rec.is_bg else mapper.obj_table
    t = table.objects[rec.slot]
    twc_pool = np.asarray(mapper.pool.twc)
    pts = []
    for _local, pool_slot in t.all_slots():
        depth = mapper.pool.slot_depth_m(pool_slot)
        mask = mapper.pool.slot_inst(pool_slot) == obj_id
        if not mask.any():
            continue
        d = depth[::stride, ::stride]
        m = mask[::stride, ::stride]
        p = unproject_depth(d, cfg.fx / stride, cfg.fy / stride,
                            cfg.cx / stride, cfg.cy / stride,
                            t_wc=twc_pool[pool_slot], mask=m)
        pts.append(p)
    if not pts:
        return np.zeros((0, 3))
    return np.concatenate(pts)


def object_bound(mapper, obj_id: int, stride: int = 4) -> OrientedBox | None:
    """Minimal OBB over the object's observed surface points; None when
    degenerate (reference returns None on QhullError, vmap.py:291-296).
    Extents floored at 10 cm (vmap.py:298-299, 306-307)."""
    pts = object_points(mapper, obj_id, stride=stride)
    if len(pts) < 10:
        return None
    box = obb_from_points(pts, min_extent=0.10)
    return box


def mesh_object(mapper, obj_id: int, bound: OrientedBox,
                grid_dim: int = 256) -> Mesh | None:
    """Extract a coloured mesh of one object field inside ``bound``."""
    pe, mlp_p, scale = mapper.object_params(obj_id)
    rec = mapper.registry[obj_id]
    # bound_extent: 0.995 for the scene/background field, 0.9 for objects
    # (trainer.py:21-24)
    bound_extent = 0.995 if rec.obj_id == 0 else 0.9
    occ_range = (-1.0, 1.0)
    scene_scale = bound.extent / ((occ_range[1] - occ_range[0]) * bound_extent)

    transform = np.eye(4, dtype=np.float32)
    transform[:3, :3] = bound.R
    transform[:3, 3] = bound.center
    grid = make_3d_grid(occ_range, grid_dim,
                        transform=jnp.asarray(transform),
                        scale=jnp.asarray(scene_scale, jnp.float32))
    grid_np = np.asarray(grid).reshape(-1, 3)

    occ, _ = eval_points(pe, mlp_p, scale, grid_np, max_deg=mapper.cfg.n_unidir_funcs)
    if occ.max() == 0:  # "no occ" (trainer.py:92-94)
        return None
    vol = occ.reshape(grid_dim, grid_dim, grid_dim)
    verts, faces = marching_cubes(vol, level=0.5)
    if verts is None:
        return None

    mesh = Mesh(verts, faces)
    # index coords -> [0,1] -> [-1,1] -> scene frame (trainer.py:53-64 chain)
    mesh.apply_scale(1.0 / (grid_dim - 1))
    mesh.apply_translation([-0.5, -0.5, -0.5])
    mesh.apply_scale(2.0)
    mesh.apply_scale(scene_scale)
    mesh.apply_transform(transform)

    _, colors = eval_points(pe, mlp_p, scale,
                            mesh.vertices.astype(np.float32),
                            max_deg=mapper.cfg.n_unidir_funcs)
    mesh.vertex_colors = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
    mesh.compute_vertex_normals()
    return mesh


def adaptive_grid_dim(bound: OrientedBox, voxel_size: float,
                      max_dim: int = 256) -> int:
    """Grid resolution from physical extent (train.py:351)."""
    return int(min(np.max(bound.extent) // voxel_size + 1, max_dim))
