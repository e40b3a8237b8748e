"""Burst dispatch (tpu.dispatch_burst > 1) is semantically identical to
per-frame dispatch.

K frames per device call scan over per-frame keyframe-table snapshots and
keys (core/step.py burst_step); the Mapper flushes early on object
activation, pool-slot reuse, and bank reads. Same seed therefore consumes
the SAME key stream in the same order, and the trained banks must match
the burst=1 run exactly (up to scan-vs-sequential XLA scheduling
rounding — observed <=1e-6 absolute on single elements).
"""

import numpy as np
import pytest

from tests.test_fused_mapper import synth_frame, tiny_cfg
from vmap_tpu.core.mapper import Mapper

pytestmark = pytest.mark.slow


def run(burst, n_frames=6, small_pool=False):
    cfg = tiny_cfg(True)
    cfg.dispatch_burst = burst
    if small_pool:
        # force pool-slot reuse mid-run so the conflict flush fires
        cfg.frame_pool_size = 4
        cfg.keyframe_buffer_size = 3
    m = Mapper(cfg)
    rng = np.random.default_rng(7)
    losses = []
    for fid in range(n_frames):
        metrics = m.process_frame(synth_frame(fid, 64, 48, rng))
        losses.append(metrics["loss"])
    # floats force the final (possibly partial) flush
    return m, [float(l) for l in losses]


def test_burst_matches_per_frame():
    m1, loss1 = run(1)
    m3, loss3 = run(3)
    assert m3.burst == 3
    np.testing.assert_allclose(loss3, loss1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m3.bank_obj.flat),
                               np.asarray(m1.bank_obj.flat),
                               rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(m3.bank_bg.flat),
                               np.asarray(m1.bank_bg.flat),
                               rtol=1e-4, atol=2e-6)
    assert np.array_equal(np.asarray(m3.bank_obj.step),
                          np.asarray(m1.bank_obj.step))


def test_burst_partial_flush_on_read():
    """Reading the bank mid-queue flushes the partial burst through the
    single-frame step; the result still matches burst=1."""
    cfg = tiny_cfg(True)
    cfg.dispatch_burst = 4
    m = Mapper(cfg)
    rng = np.random.default_rng(7)
    m.process_frame(synth_frame(0, 64, 48, rng))
    m.process_frame(synth_frame(1, 64, 48, rng))   # queue holds < 4
    flat = np.asarray(m.bank_obj.flat)              # forces partial flush
    assert m._burst_queue == []

    m1, _ = run(1, n_frames=2)
    np.testing.assert_allclose(flat, np.asarray(m1.bank_obj.flat),
                               rtol=1e-4, atol=2e-6)


def test_burst_under_pool_reuse():
    """With a tiny pool forcing slot reuse, the conflict flush keeps the
    trained state identical to per-frame dispatch."""
    m1, loss1 = run(1, n_frames=8, small_pool=True)
    m4, loss4 = run(4, n_frames=8, small_pool=True)
    np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m4.bank_obj.flat),
                               np.asarray(m1.bank_obj.flat),
                               rtol=1e-4, atol=2e-6)
