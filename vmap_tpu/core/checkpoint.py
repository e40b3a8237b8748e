"""Checkpointing.

Two layers:

  * **Per-object artifacts** (reference-parity surface): one ``.npz`` per
    object holding epoch, MLP + PE parameters, obj id, 3D bound and scale —
    the same payload the reference pickles per object
    (vmap.py:461-491), in a portable format.
  * **Full-state checkpoint** (new capability): the complete mapper state —
    both banks including Adam moments and step counts, the frame pool,
    keyframe tables, and the object registry — enabling exact training
    resume, which the reference cannot do (it never saves optimiser state
    or keyframes; SURVEY.md §5 "no resume path exists").
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np

from vmap_tpu.core.bank import BankState


# ---------------- per-object artifacts (reference surface) -------------- #
def save_object_checkpoint(mapper, obj_id: int, path: str, epoch: int) -> str:
    """``<path>/obj_<id>_frame_<epoch>.npz`` (naming parity with
    vmap.py:463)."""
    os.makedirs(path, exist_ok=True)
    pe, mlp_p, scale = mapper.object_params(obj_id)
    bound = mapper.get_bound(obj_id)
    out = {f"mlp/{k}": np.asarray(v) for k, v in mlp_p.items()}
    out |= {f"pe/{k}": np.asarray(v) for k, v in pe.items()}
    out["epoch"] = np.int64(epoch)
    out["obj_id"] = np.int64(obj_id)
    out["obj_scale"] = np.float64(scale)
    if bound is not None:
        out["bound_center"] = bound.center
        out["bound_R"] = bound.R
        out["bound_extent"] = bound.extent
    file = os.path.join(path, f"obj_{obj_id}_frame_{epoch}.npz")
    np.savez_compressed(file, **out)
    return file


def load_object_checkpoint(file: str) -> dict:
    """-> {"mlp": params, "pe": params, "obj_id", "epoch", "obj_scale",
    "bound": OrientedBox | None}."""
    from vmap_tpu.geometry.obb import OrientedBox
    z = np.load(file)
    mlp_p = {k[4:]: z[k] for k in z.files if k.startswith("mlp/")}
    pe = {k[3:]: z[k] for k in z.files if k.startswith("pe/")}
    bound = None
    if "bound_center" in z.files:
        bound = OrientedBox(z["bound_center"], z["bound_R"], z["bound_extent"])
    return {
        "mlp": mlp_p, "pe": pe,
        "obj_id": int(z["obj_id"]), "epoch": int(z["epoch"]),
        "obj_scale": float(z["obj_scale"]), "bound": bound,
    }


def restore_object_into_mapper(mapper, ckpt: dict) -> None:
    """Write a loaded per-object checkpoint into the mapper's bank slot
    (counterpart of load_checkpoints, vmap.py:478-491)."""
    from vmap_tpu.core.bank import set_slot_params
    obj_id = ckpt["obj_id"]
    rec = mapper.registry[obj_id]
    bank = mapper.bank_bg if rec.is_bg else mapper.bank_obj
    new_bank = set_slot_params(bank, rec.slot, ckpt["pe"], ckpt["mlp"])
    new_bank = new_bank.replace(
        scale=new_bank.scale.at[rec.slot].set(ckpt["obj_scale"]))
    if rec.is_bg:
        mapper.bank_bg = new_bank
    else:
        mapper.bank_obj = new_bank


# ---------------- full-state resume checkpoint -------------------------- #
def _bank_to_numpy(bank: BankState | None):
    if bank is None:
        return None
    return jax.tree.map(np.asarray, bank)


def save_full_checkpoint(mapper, path: str, frame_id: int) -> str:
    os.makedirs(path, exist_ok=True)
    state = {
        "frame_id": frame_id,
        "bank_obj": _bank_to_numpy(mapper.bank_obj),
        "bank_bg": _bank_to_numpy(mapper.bank_bg),
        "pool": {
            "packed": np.asarray(mapper.pool.packed),
            "twc": np.asarray(mapper.pool.twc),
            "refcount": mapper.pool.refcount,
            "frame_id": mapper.pool.frame_id,
            "write_seq": mapper.pool.write_seq,
            "seq": mapper.pool._seq,
        },
        "obj_table": mapper.obj_table,
        "bg_table": mapper.bg_table,
        "registry": mapper.registry,
        "slot_objid": mapper._slot_objid,
        "next_slot": mapper._next_slot,
        "frames_ingested": mapper.frames_ingested,
        "key": np.asarray(mapper.key),
    }
    file = os.path.join(path, f"state_frame_{frame_id}.pkl")
    with open(file, "wb") as f:
        pickle.dump(state, f)
    meta = {"frame_id": frame_id, "n_objects": mapper.n_objects}
    with open(os.path.join(path, "latest.json"), "w") as f:
        json.dump(meta | {"file": file}, f)
    return file


def save_full_checkpoint_orbax(mapper, path: str, frame_id: int) -> str:
    """Orbax-backed variant of the full-state checkpoint: device arrays go
    through orbax's StandardSave (async-capable, atomic-rename layout) while
    host bookkeeping (tables, registry, pool accounting) rides alongside as
    a pickle. Interchangeable with the pickle backend via
    ``load_full_checkpoint`` dispatch."""
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.abspath(os.path.join(path, f"orbax_frame_{frame_id}"))
    arrays = {
        "bank_obj": dict(vars_of_bank(mapper.bank_obj)),
        "bank_bg": (None if mapper.bank_bg is None
                    else dict(vars_of_bank(mapper.bank_bg))),
        "pool_packed": mapper.pool.packed, "pool_twc": mapper.pool.twc,
        "key": mapper.key,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, arrays, force=True)
    host = {
        "frame_id": frame_id,
        "obj_table": mapper.obj_table, "bg_table": mapper.bg_table,
        "registry": mapper.registry, "slot_objid": mapper._slot_objid,
        "next_slot": mapper._next_slot,
        "frames_ingested": mapper.frames_ingested,
        "pool_refcount": mapper.pool.refcount,
        "pool_frame_id": mapper.pool.frame_id,
        "pool_write_seq": mapper.pool.write_seq, "pool_seq": mapper.pool._seq,
        "bank_obj_meta": bank_meta(mapper.bank_obj),
        "bank_bg_meta": bank_meta(mapper.bank_bg),
    }
    with open(os.path.join(ckpt_dir, "host_state.pkl"), "wb") as f:
        pickle.dump(host, f)
    with open(os.path.join(path, "latest.json"), "w") as f:
        json.dump({"frame_id": frame_id, "file": ckpt_dir,
                   "backend": "orbax"}, f)
    return ckpt_dir


def vars_of_bank(bank: BankState) -> dict:
    return {"flat": bank.flat, "m": bank.m, "v": bank.v,
            "step": bank.step, "active": bank.active, "scale": bank.scale}


def bank_meta(bank: BankState | None):
    return None if bank is None else bank.spec


def load_full_checkpoint_orbax(mapper, ckpt_dir: str) -> int:
    import orbax.checkpoint as ocp
    with open(os.path.join(ckpt_dir, "host_state.pkl"), "rb") as f:
        host = pickle.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.abspath(ckpt_dir))
    mapper.bank_obj = BankState(spec=host["bank_obj_meta"],
                                **arrays["bank_obj"])
    mapper.bank_bg = (None if arrays["bank_bg"] is None
                      else BankState(spec=host["bank_bg_meta"],
                                     **arrays["bank_bg"]))
    mapper.pool.packed = arrays["pool_packed"]
    mapper.pool.twc = arrays["pool_twc"]
    mapper.key = arrays["key"]
    mapper.pool.refcount = host["pool_refcount"]
    mapper.pool.frame_id = host["pool_frame_id"]
    mapper.pool.write_seq = host["pool_write_seq"]
    mapper.pool._seq = host["pool_seq"]
    mapper.obj_table = host["obj_table"]
    mapper.bg_table = host["bg_table"]
    mapper.obj_table.mark_dirty()
    mapper.bg_table.mark_dirty()
    mapper.registry = host["registry"]
    mapper._slot_objid = host["slot_objid"]
    mapper._next_slot = host["next_slot"]
    mapper.frames_ingested = host["frames_ingested"]
    return int(host["frame_id"])


def load_full_checkpoint(mapper, file: str) -> int:
    """Restore a full-state checkpoint into ``mapper``; returns the frame id
    at which to resume. Dispatches on backend: an orbax checkpoint
    directory or a pickle file."""
    import jax.numpy as jnp
    if os.path.isdir(file):
        return load_full_checkpoint_orbax(mapper, file)
    with open(file, "rb") as f:
        state = pickle.load(f)
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    mapper.bank_obj = to_dev(state["bank_obj"])
    mapper.bank_bg = (None if state["bank_bg"] is None
                      else to_dev(state["bank_bg"]))
    p = state["pool"]
    mapper.pool.packed = jnp.asarray(p["packed"])
    mapper.pool.twc = jnp.asarray(p["twc"])
    mapper.pool.refcount = p["refcount"]
    mapper.pool.frame_id = p["frame_id"]
    mapper.pool.write_seq = p["write_seq"]
    mapper.pool._seq = p["seq"]
    mapper.obj_table = state["obj_table"]
    mapper.bg_table = state["bg_table"]
    mapper.obj_table.mark_dirty()
    mapper.bg_table.mark_dirty()
    mapper.registry = state["registry"]
    mapper._slot_objid = state["slot_objid"]
    mapper._next_slot = state["next_slot"]
    mapper.frames_ingested = state["frames_ingested"]
    mapper.key = jnp.asarray(state["key"])
    return int(state["frame_id"])
