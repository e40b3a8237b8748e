"""Continual (live) mapping mode."""

import threading
import time

import numpy as np
import pytest

from vmap_tpu.config import Config
from vmap_tpu.core.live import FrameQueue, run_live
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene

pytestmark = pytest.mark.slow


def _cfg():
    return Config(
        max_n_models=4, do_bg=True, hidden_feature_size=8,
        hidden_feature_size_bg=8, n_iter_per_frame=2,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=8, keyframe_buffer_size=5, keyframe_step=2,
        keyframe_step_bg=2, W=80, H=60, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        frame_pool_size=16, seed=0,
        # keep idle-time mesh exports cheap (defaults would eval a 200^3
        # grid on the test CPU)
        grid_dim=16, live_voxel_size=0.1)


def _fs(scene, fid):
    s = scene.frame_sample(fid, n_frames=8)
    return FrameSample(s["image"], s["depth"], s["obj"], s["bbox_dict"],
                       s["T"], fid)


def test_frame_queue_latest_wins():
    q = FrameQueue(maxsize=2)
    scene = SyntheticScene(width=80, height=60)
    for fid in range(5):
        q.push(_fs(scene, fid))
    got = q.poll()
    assert got.frame_id == 4       # drained to the newest
    assert q.poll() is None


def test_frame_queue_close():
    q = FrameQueue()
    assert not q.closed
    q.close()
    assert q.closed
    scene = SyntheticScene(width=80, height=60)


def test_run_live_trains_while_idle(tmp_path):
    """A stalled stream must keep optimising from the keyframe buffers
    (reference semantics: training runs every tick, train.py:186 onward is
    outside the new-frame branch)."""
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg())
    # warm the jit so tick timing is not compile-dominated
    m.process_frame(_fs(scene, 0))
    steps_before = int(m.bank_obj.step.max())

    q = FrameQueue()
    q.push(_fs(scene, 1))  # one new frame, then the stream stalls (no close)
    stats = run_live(m, q, keep_alive=1e9, max_ticks=20)
    assert stats.frames_ingested == 1
    assert stats.ticks == 20
    assert stats.idle_ticks == 19            # stalled stream
    # every tick trained: 20 ticks x n_iter(2) steps on top of the warmup
    assert int(m.bank_obj.step.max()) == steps_before + 20 * 2


def test_run_live_meshes_on_idle(tmp_path):
    import os
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg())
    q = FrameQueue()
    for fid in range(3):
        q.push(_fs(scene, fid))
    q.close()
    stats = run_live(m, q, keep_alive=0.0, mesh_dir=str(tmp_path),
                     max_ticks=50)
    # queue closed after drain; idle export triggered at most once per idle
    assert stats.frames_ingested == 1  # latest-wins drained 3 pushes to 1
    files = os.listdir(tmp_path)
    assert stats.meshes_exported <= 1
