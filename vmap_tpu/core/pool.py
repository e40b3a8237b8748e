"""Deduplicated device-resident frame pool.

The reference keeps a full RGB-D+state keyframe buffer *per object*
(vmap.py:129-176: [20, W, H, 4] uint8 + depth f32 + poses for every object),
duplicating each stored frame once per visible object — ~13 GB at Replica
resolution with 100 objects. Here every distinct frame is stored once in a
global pool (rgb uint8, depth uint16 millimetres, instance id int16, pose
f32) and objects reference pool slots through small index tables; per-object
pixel state (this/other/unknown, vmap.py:153-156) is derived on the fly from
the instance map during sampling, which is exactly how the reference
constructs it at append time (train.py:128-137).

Depth is stored as uint16 in units of ``depth_scale`` metres (1 mm for
Replica/ScanNet, whose source PNGs are uint16 mm anyway — no precision loss,
half the bytes of f32).

Writes are donated jit calls (dynamic_update_slice executes in place on
device). Slot allocation/refcounting is host-side (tiny integer state).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _write_frame(rgb_pool, depth_pool, inst_pool, twc_pool, slot,
                 rgb, depth, inst, twc):
    return (
        rgb_pool.at[slot].set(rgb),
        depth_pool.at[slot].set(depth),
        inst_pool.at[slot].set(inst),
        twc_pool.at[slot].set(twc),
    )


class FramePool:
    """Fixed-capacity global frame store with host-side refcounts."""

    def __init__(self, capacity: int, width: int, height: int,
                 device=None):
        self.capacity = capacity
        self.width = width
        self.height = height
        kw = {"device": device} if device is not None else {}
        self.rgb = jnp.zeros((capacity, width, height, 3), jnp.uint8, **kw)
        self.depth = jnp.zeros((capacity, width, height), jnp.uint16, **kw)
        self.inst = jnp.zeros((capacity, width, height), jnp.int16, **kw)
        self.twc = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (capacity, 1, 1))
        self.refcount = np.zeros(capacity, np.int64)
        self.frame_id = np.full(capacity, -1, np.int64)  # which frame occupies the slot
        self.write_seq = np.zeros(capacity, np.int64)    # allocation recency
        self._seq = 0

    # ---- host-side slot accounting -------------------------------------
    def allocate(self, frame_id: int) -> int:
        """Slot for ``frame_id`` (existing or a free one). Raises if full."""
        hit = np.nonzero(self.frame_id == frame_id)[0]
        if hit.size:
            return int(hit[0])
        free = np.nonzero(self.refcount == 0)[0]
        if free.size == 0:
            raise RuntimeError(
                f"frame pool exhausted ({self.capacity} slots all referenced); "
                "raise tpu.frame_pool_size in the config")
        # prefer the least recently written free slot
        slot = int(free[np.argmin(self.write_seq[free])])
        self.frame_id[slot] = frame_id
        self._seq += 1
        self.write_seq[slot] = self._seq
        return slot

    def incref(self, slot: int) -> None:
        self.refcount[slot] += 1

    def decref(self, slot: int) -> None:
        assert self.refcount[slot] > 0, f"decref on free slot {slot}"
        self.refcount[slot] -= 1
        if self.refcount[slot] == 0:
            self.frame_id[slot] = -1

    @property
    def n_used(self) -> int:
        return int((self.refcount > 0).sum())

    # ---- device write ---------------------------------------------------
    def write(self, slot: int, rgb_u8: np.ndarray, depth_u16: np.ndarray,
              inst_i16: np.ndarray, twc: np.ndarray) -> None:
        """Store a frame (host arrays, reference (W, H) layout) at ``slot``."""
        self.rgb, self.depth, self.inst, self.twc = _write_frame(
            self.rgb, self.depth, self.inst, self.twc,
            jnp.int32(slot),
            jnp.asarray(rgb_u8, jnp.uint8),
            jnp.asarray(depth_u16, jnp.uint16),
            jnp.asarray(inst_i16, jnp.int16),
            jnp.asarray(twc, jnp.float32),
        )

    def arrays(self) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        return self.rgb, self.depth, self.inst, self.twc
