"""Multi-chip fused path: the Pallas train-frame kernel under shard_map.

The prepared object bank shards over the "obj" mesh axis; per-slot sampling
keys are split globally, so per-frame losses must match single-device fused
execution (up to psum ordering)."""

import numpy as np
import pytest

from vmap_tpu.config import Config
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene

pytestmark = pytest.mark.slow


def _cfg(mesh_axes):
    return Config(
        max_n_models=8, do_bg=True, hidden_feature_size=32,
        hidden_feature_size_bg=16, n_iter_per_frame=2,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=8, keyframe_buffer_size=5, keyframe_step=2,
        keyframe_step_bg=2, W=64, H=48, fx=50.0, fy=50.0, cx=31.5, cy=23.5,
        frame_pool_size=8, seed=0, fused_train_step=True,
        mesh_axes=mesh_axes)


def _run(mesh_axes, n=4):
    scene = SyntheticScene(width=64, height=48)
    m = Mapper(_cfg(mesh_axes))
    losses = []
    for fid in range(n):
        s = scene.frame_sample(fid, n_frames=n)
        out = m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                          s["bbox_dict"], s["T"], fid))
        losses.append(float(out["loss"]))
    return m, np.array(losses)


def test_fused_sharded_selected_and_matches_single_device():
    m_sharded, losses_s = _run({"obj": 2, "data": 2})
    assert m_sharded._fused_sharded and m_sharded.use_fused
    m_single, losses_1 = _run({})
    assert not m_single._fused_sharded and m_single.use_fused
    assert np.isfinite(losses_s).all()
    np.testing.assert_allclose(losses_s, losses_1, rtol=2e-3, atol=1e-4)
    # trained params agree too (objects are device-disjoint; bg replicated)
    np.testing.assert_allclose(
        np.asarray(m_sharded.bank_obj.flat), np.asarray(m_single.bank_obj.flat),
        rtol=2e-3, atol=2e-5)


def test_fused_sharded_falls_back_when_indivisible():
    # capacity 8, hidden 32 -> G=4, ng=2; obj axis 4 does not divide ng=2
    cfg = _cfg({"obj": 4, "data": 2})
    m = Mapper(cfg)
    assert not m._fused_sharded
    assert not m.use_fused  # sharded XLA step takes over
