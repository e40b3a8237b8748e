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
            "rgb": np.asarray(mapper.pool.rgb),
            "depth": np.asarray(mapper.pool.depth),
            "inst": np.asarray(mapper.pool.inst),
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


def load_full_checkpoint(mapper, file: str) -> int:
    """Restore a full-state checkpoint into ``mapper``; returns the frame id
    at which to resume."""
    import jax.numpy as jnp
    with open(file, "rb") as f:
        state = pickle.load(f)
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    mapper.bank_obj = to_dev(state["bank_obj"])
    mapper.bank_bg = (None if state["bank_bg"] is None
                      else to_dev(state["bank_bg"]))
    p = state["pool"]
    mapper.pool.rgb = jnp.asarray(p["rgb"])
    mapper.pool.depth = jnp.asarray(p["depth"])
    mapper.pool.inst = jnp.asarray(p["inst"])
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
