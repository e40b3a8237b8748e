"""Deduplicated device-resident frame pool (packed storage).

The reference keeps a full RGB-D+state keyframe buffer *per object*
(vmap.py:129-176: [20, W, H, 4] uint8 + depth f32 + poses for every object),
duplicating each stored frame once per visible object — ~13 GB at Replica
resolution with 100 objects. Here every distinct frame is stored once in a
global pool and objects reference pool slots through small index tables;
per-object pixel state (this/other/unknown, vmap.py:153-156) is derived on
the fly from the instance channel during sampling, which is exactly how the
reference constructs it at append time (train.py:128-137).

Storage layout is two uint32 words per pixel, [capacity, W, H, 2]:

    word0 = r | g<<8 | b<<16
    word1 = depth_mm | (instance_id + 1) << 16     (so -1 "unknown" -> 0)

Rationale: the training sampler's random pixel gathers are the single
hottest HBM pattern, and TPU gathers of sub-word dtypes (uint8/uint16) are
~7-14x slower than word-aligned ones (measured: five u8/u16 gathers 13.7 ms
vs one 2xu32 gather 7.3 ms for the same rays). Packing also halves
checkpoint size. Depth quantisation is 1 mm — the native precision of
Replica/ScanNet depth PNGs.

Writes are donated jit calls (in-place dynamic_update_slice on device).
Slot allocation/refcounting is host-side (tiny integer state).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INST_BIAS = 1  # stored instance = id + 1; 0 means "unknown" (-1)


@partial(jax.jit, donate_argnums=(0, 1))
def _write_frame(packed, twc_pool, slot, rgb, depth_mm, inst, twc):
    r = rgb[..., 0].astype(jnp.uint32)
    g = rgb[..., 1].astype(jnp.uint32)
    b = rgb[..., 2].astype(jnp.uint32)
    w0 = r | (g << 8) | (b << 16)
    inst_b = (inst.astype(jnp.int32) + INST_BIAS).astype(jnp.uint32) & 0xFFFF
    w1 = depth_mm.astype(jnp.uint32) | (inst_b << 16)
    frame = jnp.stack([w0, w1], axis=-1)
    return packed.at[slot].set(frame), twc_pool.at[slot].set(twc)


@jax.jit
def _unpack_slot(frame):
    """[W, H, 2] u32 -> (rgb u8 [W,H,3], depth_mm u16, inst i32)."""
    w0 = frame[..., 0]
    w1 = frame[..., 1]
    rgb = jnp.stack([w0 & 255, (w0 >> 8) & 255, (w0 >> 16) & 255],
                    axis=-1).astype(jnp.uint8)
    depth = (w1 & 0xFFFF).astype(jnp.uint16)
    inst = ((w1 >> 16) & 0xFFFF).astype(jnp.int32) - INST_BIAS
    return rgb, depth, inst


class FramePool:
    """Fixed-capacity global frame store with host-side refcounts."""

    def __init__(self, capacity: int, width: int, height: int, device=None):
        self.capacity = capacity
        self.width = width
        self.height = height
        kw = {"device": device} if device is not None else {}
        self.packed = jnp.zeros((capacity, width, height, 2), jnp.uint32, **kw)
        self.twc = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (capacity, 1, 1))
        self.refcount = np.zeros(capacity, np.int64)
        self.frame_id = np.full(capacity, -1, np.int64)  # frame occupying the slot
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
        self.packed, self.twc = _write_frame(
            self.packed, self.twc, jnp.int32(slot),
            jnp.asarray(rgb_u8, jnp.uint8),
            jnp.asarray(depth_u16, jnp.uint16),
            jnp.asarray(inst_i16, jnp.int16),
            jnp.asarray(twc, jnp.float32))

    def arrays(self) -> tuple[jax.Array, jax.Array]:
        return self.packed, self.twc

    # ---- unpacked per-slot views (meshing / debugging) ------------------
    def slot_rgb(self, slot: int) -> jax.Array:
        return _unpack_slot(self.packed[slot])[0]

    def slot_depth_m(self, slot: int) -> np.ndarray:
        return np.asarray(_unpack_slot(self.packed[slot])[1]).astype(np.float32) * 1e-3

    def slot_inst(self, slot: int) -> np.ndarray:
        return np.asarray(_unpack_slot(self.packed[slot])[2])
