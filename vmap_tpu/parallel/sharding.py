"""Sharding layouts for the train step over a jax.sharding.Mesh.

Axes:
  * ``obj``  — partitions the object bank (params, Adam moments, keyframe
    tables, sampled batches) along the leading capacity axis. Objects are
    independent, so the only cross-device traffic is the scalar loss
    reduction. This is the expert-parallel axis.
  * ``data`` — partitions the background/iMAP field's ray batch. The bg
    parameters are replicated; XLA inserts a psum over ``data`` for the bg
    gradient all-reduce (data-parallel).

Usage: ``place_state(...)`` device_puts the Mapper's arrays with these
shardings; the jitted frame step then compiles SPMD automatically from its
input shardings (no shard_map needed — collectives come from the
partitioner).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_axis: bool = True) -> Mesh:
    """1D ("obj",) or 2D ("obj", "data") mesh over the first n devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    if data_axis and n >= 4 and n % 2 == 0:
        shape = (n // 2, 2)
        return Mesh(np.array(devs).reshape(shape), ("obj", "data"))
    return Mesh(np.array(devs).reshape(n, 1), ("obj", "data"))


def mesh_from_axes(axes: dict) -> Mesh | None:
    """Build the ("obj", "data") mesh described by the config's
    ``tpu.mesh_axes`` (e.g. ``{"obj": 4, "data": 2}``). Returns None for an
    empty/trivial spec (single-device execution)."""
    n_obj = int(axes.get("obj", 1))
    n_data = int(axes.get("data", 1))
    if n_obj * n_data <= 1:
        return None
    devs = jax.devices()
    if len(devs) < n_obj * n_data:
        raise ValueError(
            f"tpu.mesh_axes asks for obj={n_obj} x data={n_data} = "
            f"{n_obj * n_data} devices but only {len(devs)} are visible")
    arr = np.array(devs[: n_obj * n_data]).reshape(n_obj, n_data)
    return Mesh(arr, ("obj", "data"))


def _shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def put_sharded(a, mesh: Mesh, *spec):
    """device_put onto the mesh, multi-process safe: when the mesh spans
    processes, a committed single-device source array cannot be resharded
    directly — pull it to the (process-identical) host first. Single
    process keeps the zero-copy device_put."""
    sh = _shard(mesh, *spec)
    if jax.process_count() > 1 and isinstance(a, jax.Array):
        if a.sharding == sh:
            return a
        if a.is_fully_addressable or a.is_fully_replicated:
            a = np.asarray(a)
        # else: already a global array — let device_put reshard it
    return jax.device_put(a, sh)


def place_bank(mesh: Mesh, bank, axis: str | None = "obj"):
    """Shard every bank leaf along its leading (capacity) axis; pass
    axis=None to replicate (used for the 1-slot background bank)."""
    return jax.tree.map(lambda a: put_sharded(a, mesh, axis), bank)


def place_replicated(mesh: Mesh, tree):
    return jax.tree.map(lambda a: put_sharded(a, mesh), tree)


def place_tables(mesh: Mesh, tab: tuple, axis: str = "obj") -> tuple:
    return tuple(put_sharded(a, mesh, axis) for a in tab)


def place_state(mesh: Mesh, bank_obj, bank_bg, pool_arrays, obj_tab, obj_ids,
                bg_tab):
    """Shard a Mapper's device state for SPMD execution of the frame step."""
    bank_obj = place_bank(mesh, bank_obj, "obj")
    bank_bg = None if bank_bg is None else place_bank(mesh, bank_bg, None)
    pool_arrays = place_replicated(mesh, pool_arrays)
    obj_tab = place_tables(mesh, obj_tab, "obj")
    obj_ids = put_sharded(obj_ids, mesh, "obj")
    bg_tab = place_tables(mesh, bg_tab, None) if bg_tab is not None else None
    return bank_obj, bank_bg, pool_arrays, obj_tab, obj_ids, bg_tab
