import numpy as np
import pytest

from vmap_tpu.core.keyframe import KeyframeTable, ObjectKF
from vmap_tpu.core.pool import FramePool


def _bb(i=0):
    return np.array([0, 10, 0, 10], np.float32) + i


def test_first_frame_and_rolling_overwrite():
    t = ObjectKF(buffer_size=5, keyframe_step=3)
    t.first_frame(100, _bb())
    assert t.n_keyframes == 1
    # first append: frame_cnt=0 -> is_kf -> cement into slot 1
    local, ev = t.append(101, _bb(1))
    assert (local, ev) == (1, None) and t.n_keyframes == 2
    # next appends are not kf ticks -> overwrite rolling slot 1
    local, ev = t.append(102, _bb(2))
    assert (local, ev) == (1, 101)
    local, ev = t.append(103, _bb(3))
    assert (local, ev) == (1, 102)
    # frame_cnt=3 -> kf tick -> cement into slot 2
    local, ev = t.append(104, _bb(4))
    assert (local, ev) == (2, None) and t.n_keyframes == 3


def test_latest_two_tracking():
    t = ObjectKF(buffer_size=6, keyframe_step=2)
    t.first_frame(0, _bb())
    for f in range(1, 8):
        t.append(f, _bb(f))
    l2 = t.latest2()
    assert len(l2) == 2
    assert all(0 <= s < t.n_physical for s in l2)


def test_full_buffer_freezes_counter_and_prunes():
    t = ObjectKF(buffer_size=4, keyframe_step=1)  # every append cements
    t.first_frame(0, _bb())
    t.append(1, _bb(1))  # slot 1, n_kf=2
    t.append(2, _bb(2))  # slot 2, n_kf=3 == size-1 -> next appends roll
    assert t.n_kf == 3
    evicted = []
    for f in range(3, 12):
        _, ev = t.append(f, _bb(f))
        if ev is not None:
            evicted.append(ev)
    assert t.n_kf == 3              # frozen at buffer_size - 1
    assert t.n_physical <= 4
    assert t.buffer_full
    # pruned/overwritten frames were released
    assert len(evicted) > 0


def test_prune_never_picks_two_most_recent():
    t = ObjectKF(buffer_size=4, keyframe_step=1)
    t.first_frame(0, _bb())
    t.append(1, _bb(1))
    t.append(2, _bb(2))
    for f in range(3, 30):
        t.append(f, _bb(f))
        recent = t.order[-2:]
        if t.kf_pointer is not None:
            assert t.kf_pointer not in recent or len(t.order) <= 2


def test_table_arrays_shapes():
    tab = KeyframeTable(capacity=3, buffer_size=4)
    t = tab.get_or_create(1, keyframe_step=2)
    t.first_frame(7, _bb())
    t.append(8, _bb(1))
    tab.mark_dirty()
    pool_slot, bbox, n_kf, latest2 = tab.as_arrays()
    assert pool_slot.shape == (3, 4) and bbox.shape == (3, 4, 4)
    assert n_kf[1] == 2 and n_kf[0] == 0
    assert pool_slot[1, 0] == 7 and pool_slot[1, 1] == 8
    assert latest2.shape == (3, 2)


def test_pool_refcounting():
    p = FramePool(capacity=4, width=8, height=6)
    s0 = p.allocate(frame_id=0)
    p.incref(s0)
    s0b = p.allocate(frame_id=0)
    assert s0b == s0  # same frame -> same slot
    p.incref(s0)
    s1 = p.allocate(frame_id=1)
    assert s1 != s0
    p.incref(s1)
    p.decref(s0)
    p.decref(s0)
    assert p.n_used == 1
    # slot s0 is reusable now
    s2 = p.allocate(frame_id=2)
    p.incref(s2)
    s3 = p.allocate(frame_id=3)
    p.incref(s3)
    s4 = p.allocate(frame_id=4)  # reuses the freed slot
    assert s4 == s0


def test_pool_exhaustion_raises():
    p = FramePool(capacity=2, width=4, height=4)
    for f in range(2):
        p.incref(p.allocate(f))
    with pytest.raises(RuntimeError, match="frame pool exhausted"):
        p.allocate(99)


def test_pool_write_and_read():
    p = FramePool(capacity=2, width=4, height=3)
    rgb = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    depth = np.full((4, 3), 1234, np.uint16)
    inst = np.full((4, 3), -1, np.int16)
    twc = np.eye(4, dtype=np.float32)
    twc[0, 3] = 5.0
    s = p.allocate(0)
    p.write(s, rgb, depth, inst, twc)
    # packed storage roundtrips through the per-slot unpack views
    np.testing.assert_array_equal(np.asarray(p.slot_rgb(s)), rgb)
    np.testing.assert_allclose(p.slot_depth_m(s), 1.234, atol=1e-6)
    np.testing.assert_array_equal(p.slot_inst(s), inst.astype(np.int32))
    np.testing.assert_allclose(np.asarray(p.twc[s]), twc)


def test_keyframe_cementing_rate():
    """Over many appends, the number of cemented keyframes matches the
    every-keyframe_step schedule (vmap.py:218-219)."""
    t = ObjectKF(buffer_size=30, keyframe_step=5)
    t.first_frame(0, _bb())
    for f in range(1, 26):
        t.append(f, _bb(f))
    # 25 appends -> frame_cnt 0..24 -> kf ticks at 0, 5, 10, 15, 20
    assert t.n_kf == 1 + 5
