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
    pe, mlp_p, scale = mapper.object_params(obj_id)
    bound = mapper.get_bound(obj_id)
    from vmap_tpu.parallel.distributed import is_primary
    if not is_primary():   # multi-process: primary writes, others just
        return ""          # participated in any collective host-views
    os.makedirs(path, exist_ok=True)
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
# Format: an orbax checkpoint directory (device arrays through
# StandardCheckpointer's atomic-rename layout) plus ``host_state.json`` —
# keyframe tables, registry and pool accounting serialised to plain
# JSON-able values. No pickled dataclasses anywhere: the payload survives
# refactors of ObjectKF/ObjectRecord/KeyframeTable. Legacy round-1 ``.pkl``
# files still load via the dispatch in ``load_full_checkpoint``.

def _kf_to_plain(t) -> dict:
    st = t.rng.getstate()
    return {
        "buffer_size": t.buffer_size, "keyframe_step": t.keyframe_step,
        "pool_slot": [int(x) for x in t.pool_slot],
        "bbox": [np.asarray(b, np.float32).tolist() for b in t.bbox],
        "order": [int(x) for x in t.order],
        "latest_q": [int(x) for x in t.latest_q],
        "n_kf": int(t.n_kf), "frame_cnt": int(t.frame_cnt),
        "kf_pointer": t.kf_pointer,
        "buffer_full": bool(t.buffer_full),
        "rng_state": [st[0], list(st[1]), st[2]],
    }


def _kf_from_plain(d: dict):
    import random
    from vmap_tpu.core.keyframe import ObjectKF
    t = ObjectKF(buffer_size=int(d["buffer_size"]),
                 keyframe_step=int(d["keyframe_step"]))
    t.pool_slot = [int(x) for x in d["pool_slot"]]
    t.bbox = [np.asarray(b, np.float32) for b in d["bbox"]]
    t.order = [int(x) for x in d["order"]]
    t.latest_q = [int(x) for x in d["latest_q"]]
    t.n_kf = int(d["n_kf"])
    t.frame_cnt = int(d["frame_cnt"])
    t.kf_pointer = None if d["kf_pointer"] is None else int(d["kf_pointer"])
    t.buffer_full = bool(d["buffer_full"])
    t.rng = random.Random()
    v, internal, gauss = d["rng_state"]
    t.rng.setstate((v, tuple(internal), gauss))
    return t


def _table_to_plain(table) -> dict:
    return {"capacity": table.capacity, "buffer_size": table.buffer_size,
            "objects": {str(slot): _kf_to_plain(t)
                        for slot, t in table.objects.items()}}


def _table_from_plain(d: dict):
    from vmap_tpu.core.keyframe import KeyframeTable
    table = KeyframeTable(int(d["capacity"]), int(d["buffer_size"]))
    table.objects = {int(s): _kf_from_plain(t)
                     for s, t in d["objects"].items()}
    table.mark_dirty()
    return table


def _registry_to_plain(registry: dict) -> dict:
    return {str(oid): {"obj_id": r.obj_id, "slot": r.slot, "is_bg": r.is_bg,
                       "first_seen": r.first_seen, "scale": r.scale}
            for oid, r in registry.items()}


def _registry_from_plain(d: dict) -> dict:
    from vmap_tpu.core.mapper import ObjectRecord
    return {int(oid): ObjectRecord(obj_id=int(r["obj_id"]),
                                   slot=int(r["slot"]), is_bg=bool(r["is_bg"]),
                                   first_seen=int(r["first_seen"]),
                                   scale=float(r["scale"]))
            for oid, r in d.items()}


def save_full_checkpoint(mapper, path: str, frame_id: int) -> str:
    """Default full-state checkpoint (orbax + JSON host state)."""
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.abspath(os.path.join(path, f"orbax_frame_{frame_id}"))
    # Fetch the banks ONCE, before any process can return: the getters are
    # collective in multi-process runs (all-gather of the sharded bank), so
    # every bank access must happen while all processes are still inside
    # this function.
    bank_obj = mapper.bank_obj
    bank_bg = mapper.bank_bg
    arrays = {
        "bank_obj": dict(vars_of_bank(bank_obj)),
        "bank_bg": (None if bank_bg is None
                    else dict(vars_of_bank(bank_bg))),
        "pool_packed": mapper.pool.packed, "pool_twc": mapper.pool.twc,
        # as numpy: the RNG key lives on a single local device, which orbax
        # refuses to serialize in multi-host runs (host-local jax.Array);
        # the host value is process-identical, and orbax saves numpy fine
        "key": np.asarray(mapper.key),
        # the unconsumed tail of the pre-split key block (mapper._next_key
        # splits 1024 keys per device dispatch): saving it keeps resumed
        # training EXACTLY on the uninterrupted run's RNG stream
        "key_block": (np.asarray(mapper._key_block, np.uint32)
                      if mapper._key_block
                      else np.zeros((0, 2), np.uint32)),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, arrays, force=True)
    from vmap_tpu.parallel.distributed import is_primary
    if not is_primary():   # orbax save above is collective; the host-state
        return ckpt_dir    # JSON is written once by the primary
    host = {
        "frame_id": frame_id,
        "obj_table": _table_to_plain(mapper.obj_table),
        "bg_table": _table_to_plain(mapper.bg_table),
        "registry": _registry_to_plain(mapper.registry),
        "slot_objid": mapper._slot_objid.tolist(),
        "next_slot": mapper._next_slot,
        "frames_ingested": mapper.frames_ingested,
        "pool_refcount": mapper.pool.refcount.tolist(),
        "pool_frame_id": mapper.pool.frame_id.tolist(),
        "pool_write_seq": mapper.pool.write_seq.tolist(),
        "pool_seq": mapper.pool._seq,
        "bank_obj_hidden": bank_obj.spec.hidden,
        "bank_bg_hidden": (None if bank_bg is None
                           else bank_bg.spec.hidden),
    }
    with open(os.path.join(ckpt_dir, "host_state.json"), "w") as f:
        json.dump(host, f)
    with open(os.path.join(path, "latest.json"), "w") as f:
        json.dump({"frame_id": frame_id, "file": ckpt_dir,
                   "backend": "orbax", "n_objects": mapper.n_objects}, f)
    return ckpt_dir


# train.py and older tests used this name for the orbax backend explicitly
save_full_checkpoint_orbax = save_full_checkpoint


def vars_of_bank(bank: BankState) -> dict:
    return {"flat": bank.flat, "m": bank.m, "v": bank.v,
            "step": bank.step, "active": bank.active, "scale": bank.scale}


def load_full_checkpoint_orbax(mapper, ckpt_dir: str) -> int:
    import orbax.checkpoint as ocp
    from vmap_tpu.core.bank import BankSpec
    host_json = os.path.join(ckpt_dir, "host_state.json")
    if os.path.exists(host_json):
        with open(host_json) as f:
            host = json.load(f)
        host["obj_table"] = _table_from_plain(host["obj_table"])
        host["bg_table"] = _table_from_plain(host["bg_table"])
        host["registry"] = _registry_from_plain(host["registry"])
        host["slot_objid"] = np.asarray(host["slot_objid"], np.int32)
        host["pool_refcount"] = np.asarray(host["pool_refcount"], np.int64)
        host["pool_frame_id"] = np.asarray(host["pool_frame_id"], np.int64)
        host["pool_write_seq"] = np.asarray(host["pool_write_seq"], np.int64)
        spec_obj = BankSpec.create(int(host["bank_obj_hidden"]))
        spec_bg = (None if host["bank_bg_hidden"] is None
                   else BankSpec.create(int(host["bank_bg_hidden"])))
    else:  # legacy round-1 layout: pickled host state with embedded specs
        with open(os.path.join(ckpt_dir, "host_state.pkl"), "rb") as f:
            host = pickle.load(f)
        spec_obj = host["bank_obj_meta"]
        spec_bg = host["bank_bg_meta"]
    # Restore to HOST numpy explicitly: StandardCheckpointer's default
    # restores onto the devices recorded at save time, which fails when the
    # checkpoint moves platforms (trained on TPU, re-meshed/analysed on a
    # CPU box, or vice versa). The tree is re-placed on the current default
    # device by the jnp.asarray below.
    with ocp.PyTreeCheckpointer() as ckptr:
        item = ckptr.metadata(os.path.abspath(ckpt_dir)).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item.tree)
        arrays = ckptr.restore(
            os.path.abspath(ckpt_dir),
            args=ocp.args.PyTreeRestore(restore_args=restore_args))
    import jax.numpy as jnp
    arrays = jax.tree.map(jnp.asarray, arrays)  # host np -> device buffers
    mapper.bank_obj = BankState(spec=spec_obj, **arrays["bank_obj"])
    mapper.bank_bg = (None if arrays["bank_bg"] is None
                      else BankState(spec=spec_bg, **arrays["bank_bg"]))
    mapper.pool.packed = arrays["pool_packed"]
    mapper.pool.twc = arrays["pool_twc"]
    mapper.key = arrays["key"]
    kb = arrays.get("key_block")   # absent in pre-round-3 checkpoints
    mapper._key_block = ([] if kb is None
                         else list(np.asarray(kb, np.uint32)))
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
        # train.py --save_ckpt writes <logdir>/ckpt/state/orbax_frame_<N>/
        # plus a state/latest.json pointer; accept the parent dir too.
        latest = os.path.join(file, "latest.json")
        if (not os.path.exists(os.path.join(file, "host_state.json"))
                and not os.path.exists(os.path.join(file, "host_state.pkl"))
                and os.path.exists(latest)):
            with open(latest) as f:
                stored = json.load(f)["file"]
            # the pointer stores an absolute path recorded at save time;
            # resolve it relative to the parent dir first so a checkpoint
            # tree copied to another machine/path (the TPU-train -> CPU-
            # remesh workflow) still loads, falling back to the stored path
            local = os.path.join(file, os.path.basename(stored.rstrip("/")))
            file = local if os.path.exists(local) else stored
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
    # legacy checkpoints predate the pre-split key block; restart the block
    # from the restored key (stream differs from an uninterrupted legacy
    # run, as this loader's format always did across versions)
    mapper._key_block = list(np.asarray(state["key_block"], np.uint32)) \
        if "key_block" in state else []
    return int(state["frame_id"])
