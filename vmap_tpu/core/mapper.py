"""The Mapper: orchestrates frame ingest, object instantiation, and the
jitted per-frame training step.

This is the TPU-native counterpart of the reference's main loop
(train.py:95-338) plus the object table (train.py:59-61,123-176): a host-side
registry maps dataset instance ids to bank slots, frames land once in the
device-resident FramePool, keyframe bookkeeping is tiny host integers, and
one jitted call per frame trains every object simultaneously.

Differences from the reference, by design:
  * no functorch stack/write-back — the bank IS the parameter storage;
  * Adam moments survive new-object events;
  * the "models full" cap (train.py:143-145) is the bank capacity.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.config import Config
from vmap_tpu.core import bank as bank_lib
from vmap_tpu.core.keyframe import KeyframeTable
from vmap_tpu.core.pool import FramePool
from vmap_tpu.core.step import StepStatics, make_frame_step

_UNPREPARE_JIT = None


@dataclass
class FrameSample:
    """One ingested frame in the reference's (W, H) layout."""
    image: np.ndarray        # [W, H, 3] uint8
    depth: np.ndarray        # [W, H] float32 metres (already scaled+filtered)
    inst: np.ndarray         # [W, H] int (-1 = unknown, 0 = background)
    bbox_dict: dict          # obj_id -> [u_low, u_high, v_low, v_high]
    t_wc: np.ndarray         # [4, 4]
    frame_id: int


class _LazyMetric:
    """Float-able handle for a burst-queued frame's metric.

    With tpu.dispatch_burst > 1 a frame's loss only materialises when its
    burst flushes; ``float()`` forces a flush if the frame is still queued
    (train.py floats losses at its logging cadence, so in steady state the
    read lands after the flush and costs nothing extra)."""
    __slots__ = ("_mapper", "_seq", "_name")

    def __init__(self, mapper, seq, name):
        self._mapper = mapper
        self._seq = seq
        self._name = name

    def __float__(self):
        m = self._mapper
        r = m._burst_results.get(self._seq)
        if r is None:
            old = m._resolved_metrics.get(self._seq)
            if old is not None:          # evicted from the device-ref dict
                return old[self._name]   # but resolved to a float first
            m._flush_burst()
            r = m._burst_results[self._seq]
        v, i = r[self._name]
        return float(v if i is None else v[i])


@dataclass
class ObjectRecord:
    obj_id: int
    slot: int
    is_bg: bool
    first_seen: int
    scale: float


class Mapper:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.capacity = cfg.max_n_models
        self.hidden = cfg.hidden_feature_size
        self.hidden_bg = cfg.hidden_feature_size_bg
        # physical bank SLOTS round up to the fused kernel's render-merge
        # granule (8 slots when 128/h object groups merge sublane-dense
        # per-ray rows); slots beyond `capacity` stay permanently inactive —
        # the reference's "models full" cap (train.py:143-145) applies to
        # `capacity`, and masked pad slots only add ~4% kernel work.
        self.slots = self.capacity
        if cfg.fused_enabled() and self.hidden <= 64:
            self.slots = -(-self.capacity // 8) * 8

        # multi-device: tpu.mesh_axes (e.g. {"obj": 4, "data": 2}) builds an
        # ("obj", "data") mesh; banks/keyframe tables shard along the object
        # axis (expert-parallel — objects are independent), the pool and bg
        # bank replicate, and the bg ray batch shards along "data" (XLA
        # psums the bg grads). SURVEY §2.2.
        self.mesh = None
        self._host_view_cache = {}
        if cfg.mesh_axes:
            from vmap_tpu.parallel.sharding import mesh_from_axes
            self.mesh = mesh_from_axes(cfg.mesh_axes)
        if self.mesh is not None and self.slots % self.mesh.shape["obj"]:
            raise ValueError(
                f"max_n_models={self.capacity} must divide evenly over the "
                f"obj mesh axis ({self.mesh.shape['obj']})")

        key = jax.random.PRNGKey(cfg.seed)
        key, k_obj, k_bg = jax.random.split(key, 3)
        self.key = key
        self._key_block: list = []   # host-side pre-split key cache
        self._bank_obj = bank_lib.init_bank(k_obj, self.slots, self.hidden,
                                            default_scale=cfg.obj_scale)
        self._bank_bg = (bank_lib.init_bank(k_bg, 1, self.hidden_bg,
                                            default_scale=cfg.bg_scale)
                         if cfg.do_bg else None)

        # fused mode: banks live on-device in the kernel's prepared block
        # layout across frames (kernels/train_step.py PreparedBank); the
        # flat BankState views used by meshing/eval/checkpointing are
        # materialised lazily and cached until the next training step.
        # On a multi-device mesh the fused kernel runs under shard_map with
        # the group axis sharded over "obj" (step.make_fused_step_sharded)
        # when the capacity divides across devices and groups; otherwise
        # the sharded XLA step runs instead.
        from vmap_tpu.core.step import pick_group
        self.use_fused = cfg.fused_enabled()
        self._fused_sharded = False
        if self.use_fused and self.mesh is not None:
            G = pick_group(self.slots, self.hidden)
            ng = self.slots // G
            d_obj = self.mesh.shape["obj"]
            if ng % d_obj:
                print(f"WARNING: fused kernel needs group count {ng} "
                      f"divisible by the obj mesh axis ({d_obj}); using "
                      "the sharded XLA step instead")
                self.use_fused = False
            else:
                self._fused_sharded = True
        self._pb_obj = self._pb_bg = None
        if self.use_fused:
            from vmap_tpu.kernels.train_step import prepare_bank
            self._pb_obj = prepare_bank(
                self._bank_obj, pick_group(self.slots, self.hidden))
            self._bank_obj = None
            if cfg.do_bg:
                self._pb_bg = prepare_bank(
                    self._bank_bg, pick_group(1, self.hidden_bg))
                self._bank_bg = None
            if self._fused_sharded:
                from vmap_tpu.core.step import place_prepared
                self._pb_obj = place_prepared(self.mesh, self._pb_obj, "obj")
                if self._pb_bg is not None:
                    self._pb_bg = place_prepared(self.mesh, self._pb_bg,
                                                 None)

        self.pool = FramePool(cfg.frame_pool_size, cfg.W, cfg.H)
        self.obj_table = KeyframeTable(self.slots, cfg.keyframe_buffer_size)
        self.bg_table = KeyframeTable(1, cfg.keyframe_buffer_size)

        if self.mesh is not None:
            from vmap_tpu.parallel.sharding import place_bank, place_replicated
            self._bank_obj = place_bank(self.mesh, self._bank_obj, "obj")
            if self._bank_bg is not None:
                self._bank_bg = place_bank(self.mesh, self._bank_bg, None)
            # pool arrays replicate; the donated _write_frame calls keep the
            # replicated sharding across frame ingests
            self.pool.packed, self.pool.twc = place_replicated(
                self.mesh, (self.pool.packed, self.pool.twc))

        self.registry: dict[int, ObjectRecord] = {}   # obj_id -> record
        self._slot_objid = np.full(self.slots, -(10 ** 6), np.int32)
        self._next_slot = 0
        self.frames_ingested = 0
        self.models_full_events = 0

        px_block = cfg.px_block
        if px_block > 1 and (cfg.H % px_block
                             or cfg.n_samples_per_frame % px_block):
            print(f"WARNING: tpu.px_block={px_block} incompatible with "
                  f"H={cfg.H} / object ray budget; falling back to 1")
            px_block = 1
        px_block_bg = cfg.px_block_bg
        if px_block_bg > 1 and (cfg.H % px_block_bg
                                or cfg.n_samples_per_frame_bg % px_block_bg):
            print(f"WARNING: tpu.px_block_bg={px_block_bg} incompatible "
                  f"with H={cfg.H} / bg ray budget; falling back to 1")
            px_block_bg = 1
        sample_reuse = getattr(cfg, "sample_reuse", 1)
        if sample_reuse > 1 and cfg.n_iter_per_frame % sample_reuse:
            print(f"WARNING: tpu.sample_reuse={sample_reuse} does not "
                  f"divide iters_per_frame={cfg.n_iter_per_frame}; "
                  f"falling back to 1")
            sample_reuse = 1
        self.statics = StepStatics(
            n_iter=cfg.n_iter_per_frame,
            win=cfg.win_size, n_px=cfg.n_samples_per_frame,
            n_b2s=cfg.n_bins_cam2surface, n_bins=cfg.n_bins,
            do_bg=cfg.do_bg, win_bg=cfg.win_size_bg,
            n_px_bg=cfg.n_samples_per_frame_bg, n_b2s_bg=cfg.n_bins_cam2surface_bg,
            min_depth=cfg.min_depth, surface_eps=cfg.surface_eps,
            stop_eps=cfg.stop_eps, depth_scale=cfg.depth_scale,
            fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
            lr=cfg.learning_rate, wd=cfg.weight_decay,
            color_scaling=cfg.color_scaling, opacity_scaling=cfg.opacity_scaling,
            max_deg=cfg.n_unidir_funcs, compute_dtype=cfg.compute_dtype,
            use_fused_frame=self.use_fused,
            shard_data_axis=(self.mesh is not None
                             and self.mesh.shape["data"] > 1),
            px_block=px_block, px_block_bg=px_block_bg,
            sample_reuse=sample_reuse,
        )
        # burst dispatch (fused single-host only): K frames per device
        # dispatch amortise the tunnel's flat ~0.5-1.4 ms non-overlapped
        # per-dispatch cost (scripts/microbench_dispatch.py). Semantically
        # exact: each queued frame carries its own keyframe-table snapshot
        # and key; the queue flushes before any bank mutation (object
        # activation, checkpoint restore), any bank read (meshing/eval/
        # checkpoint via the bank_obj/bank_bg getters), and before the pool
        # reuses a slot a queued snapshot still references.
        self.burst = 1
        if self.use_fused and not self._fused_sharded:
            self.burst = max(1, int(getattr(cfg, "dispatch_burst", 1)))
        self._burst_queue: list = []       # (seq, obj_tab, bg_tab, key)
        self._burst_results: dict = {}     # seq -> {"loss": lazy scalar, ...}
        self._resolved_metrics: dict = {}  # evicted seq -> {"loss": float}
        self._burst_seq = 0
        self._burst_ref_slots: set = set()
        if self.burst > 1:
            self.statics = dataclasses.replace(self.statics,
                                               dispatch_burst=self.burst)
            self._step_fn_single = make_frame_step(
                dataclasses.replace(self.statics, dispatch_burst=1))
        if self._fused_sharded:
            from vmap_tpu.core.step import make_fused_step_sharded
            self._step_fn = make_fused_step_sharded(self.statics, self.mesh)
        else:
            self._step_fn = make_frame_step(self.statics)
        self._forloop_step_fn = None  # built lazily (ablation baseline)
        self._activate_obj = jax.jit(
            lambda b, slot, k, s: bank_lib.activate_slot(b, slot, k, s, self.hidden),
            donate_argnums=(0,))
        self._activate_bg = (jax.jit(
            lambda b, slot, k, s: bank_lib.activate_slot(b, slot, k, s, self.hidden_bg),
            donate_argnums=(0,)) if cfg.do_bg else None)

    # ------------------------------------------------------------------ #
    # Flat-bank views. In fused mode the prepared form is the truth; the
    # flat view is unprepared on demand (meshing/eval/ckpt cadence) and any
    # write-back re-prepares.
    @staticmethod
    def _unprepare_jit():
        global _UNPREPARE_JIT
        if _UNPREPARE_JIT is None:
            from vmap_tpu.kernels.train_step import unprepare_bank
            _UNPREPARE_JIT = jax.jit(unprepare_bank)
        return _UNPREPARE_JIT

    def _host_view(self, bank):
        """Multi-process runs shard the object bank across hosts; host-side
        consumers of this getter (meshing, eval, checkpoint) need the full
        arrays, so all-gather to replicated. COLLECTIVE: every process
        reaches these getters at the same cadence (same deterministic
        stream), so the gather lines up. Cached per underlying bank."""
        if bank is None or self.mesh is None or jax.process_count() == 1:
            return bank
        if self._host_view_cache.get("key") is not bank:
            from vmap_tpu.parallel.distributed import replicate_tree
            self._host_view_cache = {
                "key": bank, "val": replicate_tree(bank, self.mesh)}
        return self._host_view_cache["val"]

    @property
    def bank_obj(self):
        if not self.use_fused:
            return self._host_view(self._bank_obj)
        self._flush_burst()   # readers must see every queued frame trained
        if self._bank_obj is None:
            self._bank_obj = self._unprepare_jit()(self._pb_obj)
        return self._host_view(self._bank_obj)

    @bank_obj.setter
    def bank_obj(self, bank):
        self._flush_burst()   # queued frames observed the pre-write state
        if self.use_fused and bank is not None:
            from vmap_tpu.kernels.train_step import prepare_bank
            self._pb_obj = prepare_bank(bank, self._pb_obj.G)
        if self.mesh is not None and bank is not None:
            from vmap_tpu.parallel.sharding import place_bank
            bank = place_bank(self.mesh, bank, "obj")
        self._bank_obj = bank

    @property
    def bank_bg(self):
        if not (self.use_fused and self.cfg.do_bg):
            return self._bank_bg
        self._flush_burst()
        if self._bank_bg is None:
            self._bank_bg = self._unprepare_jit()(self._pb_bg)
        return self._bank_bg

    @bank_bg.setter
    def bank_bg(self, bank):
        self._flush_burst()
        if self.use_fused and bank is not None:
            from vmap_tpu.kernels.train_step import prepare_bank
            self._pb_bg = prepare_bank(bank, self._pb_bg.G)
        if self.mesh is not None and bank is not None:
            from vmap_tpu.parallel.sharding import place_bank
            bank = place_bank(self.mesh, bank, None)
        self._bank_bg = bank

    def _invalidate_flat_cache(self):
        # also drop the replicated host-view copy so stale full-bank
        # allocations are freed between meshing/checkpoint cadences
        self._host_view_cache = {}
        if self.use_fused:
            self._bank_obj = None
            if self.cfg.do_bg:
                self._bank_bg = None

    def _next_key(self):
        """Next per-frame PRNG key, as a HOST (numpy) uint32[2] array.

        ``jax.random.split`` per frame is a separate device dispatch — on
        the tunneled backend that is ~0.8 ms/frame of pure latency in the
        hot loop. Splitting 1024 keys at a time and handing out host
        copies keeps the per-frame cost to an 8-byte transfer inside the
        train dispatch itself (numpy uint32[2] is a valid threefry key).

        NOTE: this block-split stream (split(key, 1025), handed out from
        the end of each block) is a DIFFERENT split-tree than the
        pre-round-3 sequential ``split(key)`` chain — seeded runs are
        reproducible against this build, not against older ones. The
        unconsumed block tail is checkpointed so resume stays on the
        uninterrupted stream.
        """
        if not self._key_block:
            keys = jax.random.split(self.key, 1025)
            self.key = keys[0]
            import numpy as np
            self._key_block = list(np.asarray(keys[1:]))
        return self._key_block.pop()

    def _register_object(self, obj_id: int, frame_id: int) -> ObjectRecord | None:
        # activation mutates the prepared bank in place: queued burst
        # frames must train on the PRE-activation state they observed
        self._flush_burst()
        is_bg = self.cfg.do_bg and obj_id == 0
        if is_bg:
            rec = ObjectRecord(obj_id=0, slot=0, is_bg=True,
                               first_seen=frame_id, scale=self.cfg.bg_scale)
            if self.use_fused:
                from vmap_tpu.kernels.train_step import activate_slot_prepared
                self._pb_bg = activate_slot_prepared(
                    self._pb_bg, 0, self._next_key(), self.cfg.bg_scale)
                self._bank_bg = None
            else:
                self._bank_bg = self._activate_bg(
                    self._bank_bg, jnp.int32(0), self._next_key(),
                    jnp.float32(self.cfg.bg_scale))
        else:
            if self._next_slot >= self.capacity:  # models full (train.py:143-145)
                self.models_full_events += 1
                return None
            slot = self._next_slot
            self._next_slot += 1
            rec = ObjectRecord(obj_id=obj_id, slot=slot, is_bg=False,
                               first_seen=frame_id, scale=self.cfg.obj_scale)
            if self.use_fused:
                from vmap_tpu.kernels.train_step import activate_slot_prepared
                self._pb_obj = activate_slot_prepared(
                    self._pb_obj, slot, self._next_key(), self.cfg.obj_scale)
                self._bank_obj = None
            else:
                self._bank_obj = self._activate_obj(
                    self._bank_obj, jnp.int32(slot), self._next_key(),
                    jnp.float32(self.cfg.obj_scale))
            self._slot_objid[slot] = obj_id
        self.registry[obj_id] = rec
        return rec

    def _force_release_pool_slot(self) -> bool:
        """Pool pressure valve: drop the oldest-written referenced frame by
        re-pointing every keyframe that uses it at its object's newest frame
        (graceful degradation instead of aborting a long run). Returns
        whether a slot was freed."""
        ref = np.nonzero(self.pool.refcount > 0)[0]
        if ref.size == 0:
            return False
        victim = int(ref[np.argmin(self.pool.write_seq[ref])])
        released = 0
        for table in (self.obj_table, self.bg_table):
            for t in table.objects.values():
                newest = t.newest_pool_slot()
                for local, ps in list(enumerate(t.pool_slot)):
                    if ps == victim and newest != victim:
                        t.replace_ref(local, newest)
                        self.pool.incref(newest)
                        self.pool.decref(victim)
                        released += 1
            table.mark_dirty()
        if self.pool.refcount[victim] > 0:
            return False  # victim was every holder's newest frame
        self.pool_force_released = getattr(self, "pool_force_released", 0) + 1
        return True

    def ingest_frame(self, sample: FrameSample) -> None:
        cfg = self.cfg
        depth_mm = np.clip(np.round(sample.depth * 1000.0), 0, 65535).astype(np.uint16)
        inst = np.asarray(sample.inst).astype(np.int16)

        try:
            pool_slot = self.pool.allocate(sample.frame_id)
        except RuntimeError:
            self._flush_burst()   # force-release re-points queued refs
            if not self._force_release_pool_slot():
                raise
            print("WARNING: frame pool full — forced release of the oldest "
                  "referenced frame (raise tpu.frame_pool_size to avoid)")
            pool_slot = self.pool.allocate(sample.frame_id)
        if self._burst_queue and pool_slot in self._burst_ref_slots:
            # the slot being (re)written is still referenced by a queued
            # table snapshot: train those frames before overwriting it
            self._flush_burst()
        self.pool.write(pool_slot, sample.image, depth_mm, inst, sample.t_wc)

        for obj_id, bbox in sample.bbox_dict.items():
            obj_id = int(obj_id)
            if obj_id == -1:  # unsure area (train.py:124-125)
                continue
            rec = self.registry.get(obj_id)
            if rec is None:
                rec = self._register_object(obj_id, sample.frame_id)
                if rec is None:
                    continue
                table = (self.bg_table if rec.is_bg else self.obj_table)
                kf_step = cfg.keyframe_step_bg if rec.is_bg else cfg.keyframe_step
                t = table.get_or_create(rec.slot, kf_step, seed=cfg.seed)
                t.first_frame(pool_slot, np.asarray(bbox, np.float32))
                self.pool.incref(pool_slot)
                table.mark_dirty()
            else:
                table = (self.bg_table if rec.is_bg else self.obj_table)
                t = table.objects[rec.slot]
                _, evicted = t.append(pool_slot, np.asarray(bbox, np.float32))
                self.pool.incref(pool_slot)
                if evicted is not None:
                    self.pool.decref(evicted)
                table.mark_dirty()
        self.frames_ingested += 1

    # ------------------------------------------------------------------ #
    def _mesh_ctx(self):
        """Ambient-mesh context for tracing sharded steps (needed by the
        bare-PartitionSpec sharding constraint in core/step.py)."""
        if self.mesh is None:
            from contextlib import nullcontext
            return nullcontext()
        set_mesh = (getattr(jax.sharding, "use_mesh", None)
                    or jax.sharding.set_mesh)
        return set_mesh(self.mesh)

    def _device_tables(self):
        obj_tab = tuple(jnp.asarray(a) for a in self.obj_table.as_arrays())
        if self.cfg.do_bg:
            bg_tab = tuple(jnp.asarray(a) for a in self.bg_table.as_arrays())
        else:
            bg_tab = obj_tab  # ignored by the step when do_bg=False
        if self.mesh is not None:
            from vmap_tpu.parallel.sharding import place_tables
            obj_tab = place_tables(self.mesh, obj_tab, "obj")
            bg_tab = place_tables(self.mesh, bg_tab, None)
        return obj_tab, bg_tab

    def train_frame(self) -> dict:
        """Run one full per-frame optimisation (n_iter_per_frame iterations
        over all active objects + background). ``training_strategy ==
        "vmap"``: one device dispatch for the whole bank; ``"forloop"``: one
        dispatch per object — the reference's ablation baseline
        (train.py:278-290), kept for like-for-like speedup measurement."""
        if not self.registry:
            return {}
        if self.cfg.training_strategy == "forloop":
            return self._train_frame_forloop()
        if self.use_fused and self.burst > 1:
            return self._train_frame_burst()
        obj_tab, bg_tab = self._device_tables()
        obj_ids = jnp.asarray(self._slot_objid)
        if self.mesh is not None:
            from vmap_tpu.parallel.sharding import put_sharded
            obj_ids = put_sharded(obj_ids, self.mesh, "obj")
        t0 = time.perf_counter()
        if self.use_fused:
            self._pb_obj, self._pb_bg, metrics = self._step_fn(
                self._pb_obj, self._pb_bg, *self.pool.arrays(),
                obj_tab, obj_ids, bg_tab, self._next_key())
            self._invalidate_flat_cache()
        else:
            with self._mesh_ctx():
                self._bank_obj, self._bank_bg, metrics = self._step_fn(
                    self._bank_obj, self._bank_bg, *self.pool.arrays(),
                    obj_tab, obj_ids, bg_tab, self._next_key())
            self._invalidate_flat_cache()   # drops the stale host view
        metrics = {k: v for k, v in metrics.items()}
        metrics["step_time_s"] = time.perf_counter() - t0
        return metrics

    def _train_frame_burst(self) -> dict:
        """Queue this frame's (table snapshot, key); dispatch K queued
        frames as ONE device call (lax.scan in core/step.py). Losses come
        back stacked and are handed out as lazy per-frame handles."""
        t0 = time.perf_counter()
        seq = self._burst_seq
        self._burst_seq += 1
        snap_o = self.obj_table.as_arrays()   # fresh numpy per rebuild —
        snap_b = (self.bg_table.as_arrays()   # safe to hold by reference
                  if self.cfg.do_bg else snap_o)
        self._burst_queue.append((seq, snap_o, snap_b, self._next_key()))
        # pool slots any queued snapshot references (over-inclusive: the
        # unused table rows hold slot 0) — ingest flushes before reusing one
        self._burst_ref_slots.update(np.unique(snap_o[0]).tolist())
        self._burst_ref_slots.update(np.unique(snap_b[0]).tolist())
        if len(self._burst_queue) >= self.burst:
            self._flush_burst()
        return {"loss": _LazyMetric(self, seq, "loss"),
                "loss_mean": _LazyMetric(self, seq, "loss_mean"),
                "step_time_s": time.perf_counter() - t0}

    def _flush_burst(self) -> None:
        """Dispatch all queued frames: one K-frame scan dispatch when the
        queue is full, otherwise (activation / pool-conflict / read-forced
        partial flushes) single-frame dispatches through the burst=1 step."""
        if not self._burst_queue:
            return
        q, self._burst_queue = self._burst_queue, []
        self._burst_ref_slots = set()
        obj_ids = jnp.asarray(self._slot_objid)
        pool = self.pool.arrays()
        if len(q) == self.burst:
            obj_tabs = tuple(jnp.asarray(np.stack([s[1][i] for s in q]))
                             for i in range(4))
            bg_tabs = tuple(jnp.asarray(np.stack([s[2][i] for s in q]))
                            for i in range(4))
            keys = np.stack([s[3] for s in q])
            self._pb_obj, self._pb_bg, ms = self._step_fn(
                self._pb_obj, self._pb_bg, *pool, obj_tabs, obj_ids,
                bg_tabs, keys)
            for i, (seq, *_r) in enumerate(q):
                self._burst_results[seq] = {k: (v, i) for k, v in ms.items()}
        else:
            for seq, so, sb, key in q:
                self._pb_obj, self._pb_bg, ms = self._step_fn_single(
                    self._pb_obj, self._pb_bg, *pool,
                    tuple(jnp.asarray(a) for a in so), obj_ids,
                    tuple(jnp.asarray(a) for a in sb), key)
                self._burst_results[seq] = {k: (v, None)
                                            for k, v in ms.items()}
        self._invalidate_flat_cache()
        if len(self._burst_results) > 4096:   # bound the device-ref dict
            # resolve evicted entries to plain floats (already-computed
            # device scalars) so a caller holding a loss handle for >3072
            # frames still gets a value instead of a KeyError
            for s in sorted(self._burst_results)[:-1024]:
                r = self._burst_results.pop(s)
                self._resolved_metrics[s] = {
                    k: float(v if i is None else v[i])
                    for k, (v, i) in r.items()}

    def _train_frame_forloop(self) -> dict:
        """Sequential per-object training (ablation). Each active slot runs
        the same jitted step on a capacity-1 view of the bank; the
        background (if any) trains in the first call. Losses are additive
        and parameters disjoint, so per-iteration updates match the
        vectorised path up to RNG draws and the cross-object empty-batch
        quirk."""
        from vmap_tpu.core.step import StepStatics, make_frame_step
        if self._forloop_step_fn is None:
            st1 = StepStatics(**{**self.statics.__dict__, "do_bg": False})
            self._forloop_step_fn = make_frame_step(st1)
        t0 = time.perf_counter()
        obj_tab, bg_tab = self._device_tables()
        obj_ids = np.asarray(self._slot_objid)
        take = lambda t, s: jax.tree.map(lambda a: a[s:s + 1], t)  # noqa: E731
        put = lambda t, one, s: jax.tree.map(  # noqa: E731
            lambda a, b: a.at[s].set(b[0]), t, one)
        total_loss = 0.0
        active = np.asarray(self.bank_obj.active)
        for slot in np.nonzero(active)[0]:
            one = take(self.bank_obj, int(slot))
            tab1 = tuple(a[int(slot):int(slot) + 1] for a in obj_tab)
            ids1 = jnp.asarray(obj_ids[int(slot):int(slot) + 1])
            one, _, metrics = self._forloop_step_fn(
                one, None, *self.pool.arrays(), tab1, ids1, tab1,
                self._next_key())
            self.bank_obj = put(self.bank_obj, one, int(slot))
            total_loss += float(metrics["loss"])
        if self.cfg.do_bg and self.bank_bg is not None and bool(self.bank_bg.active[0]):
            bg_ids = jnp.zeros((1,), jnp.int32)
            bg, _, metrics = self._forloop_step_fn(
                self.bank_bg, None, *self.pool.arrays(), bg_tab, bg_ids,
                bg_tab, self._next_key())
            self.bank_bg = bg
            total_loss += float(metrics["loss"])
        return {"loss": total_loss,
                "step_time_s": time.perf_counter() - t0}

    def process_frame(self, sample: FrameSample) -> dict:
        self.ingest_frame(sample)
        return self.train_frame()

    # ------------------------------------------------------------------ #
    @property
    def n_objects(self) -> int:
        return sum(1 for r in self.registry.values() if not r.is_bg)

    def record_for(self, obj_id: int) -> ObjectRecord:
        return self.registry[obj_id]

    def object_params(self, obj_id: int) -> tuple[dict, dict, float]:
        """(pe_params, mlp_params, scale) for one object — host-side view
        used by meshing/checkpointing."""
        rec = self.registry[obj_id]
        b = self.bank_bg if rec.is_bg else self.bank_obj
        pe, mlp_p = b.params_for(rec.slot)
        return pe, mlp_p, float(b.scale[rec.slot])

    # ---- meshing / bounds (trainer.meshing + get_bound counterparts) --- #
    def get_bound(self, obj_id: int, stride: int = 4):
        from vmap_tpu.core import meshing
        return meshing.object_bound(self, obj_id, stride=stride)

    def mesh_object(self, obj_id: int, bound=None, grid_dim: int | None = None):
        """Extract a coloured mesh for one object; None if bounds or the
        level set are degenerate (train.py:347-355 skips those)."""
        from vmap_tpu.core import meshing
        if bound is None:
            bound = self.get_bound(obj_id)
        if bound is None:
            return None
        if grid_dim is None:
            grid_dim = meshing.adaptive_grid_dim(
                bound, self.cfg.live_voxel_size, self.cfg.grid_dim)
        return meshing.mesh_object(self, obj_id, bound, grid_dim=grid_dim)

    def export_meshes(self, out_dir: str, frame_id: int) -> list[str]:
        """Export every object's mesh as
        ``<out_dir>/frame_<f>_obj<id>.obj`` (train.py:357-360).

        Objects mesh through the bank-vectorised path (one [O, chunk]
        program per grid chunk for ALL objects, core/meshing.py
        mesh_all_objects); the background (different bank/width) meshes
        separately."""
        import os
        from vmap_tpu.core import meshing
        from vmap_tpu.parallel.distributed import is_primary
        meshes = meshing.mesh_all_objects(self)
        for obj_id in sorted(self.registry):
            if self.registry[obj_id].is_bg:
                meshes[obj_id] = self.mesh_object(obj_id)
        if not is_primary():
            # multi-process: every process runs the (collective) mesh
            # evaluation, only the primary writes artifacts
            return []
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for obj_id in sorted(meshes):
            mesh = meshes[obj_id]
            if mesh is None:
                continue
            p = os.path.join(out_dir, f"frame_{frame_id}_obj{obj_id}.obj")
            mesh.export(p)
            paths.append(p)
        if self.cfg.html_viewer and paths:
            from vmap_tpu.utils.viewer import write_snapshot
            write_snapshot(out_dir, meshes, frame_id)
        return paths
