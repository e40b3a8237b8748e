"""Long-run robustness: a deliberately tiny frame pool must degrade
gracefully (forced release of stale keyframe references), never crash."""

import numpy as np

from vmap_tpu.config import Config
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene
import pytest

pytestmark = pytest.mark.slow


def _cfg(pool):
    return Config(
        max_n_models=4, do_bg=True, hidden_feature_size=8,
        hidden_feature_size_bg=8, n_iter_per_frame=1,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=8,
        # cementing every 2 frames with a big buffer maximises distinct refs
        keyframe_buffer_size=12, keyframe_step=2, keyframe_step_bg=2,
        W=80, H=60, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        frame_pool_size=pool, seed=0)


def test_forced_release_under_pool_pressure():
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg(pool=6))
    for fid in range(40):  # would need ~20 distinct refs without release
        s = scene.frame_sample(fid, n_frames=40)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
    assert getattr(m, "pool_force_released", 0) > 0
    assert m.pool.n_used <= 6
    # accounting stays consistent: total refcount == total table references
    total_refs = sum(len(t.pool_slot) for tbl in (m.obj_table, m.bg_table)
                     for t in tbl.objects.values())
    assert int(m.pool.refcount.sum()) == total_refs
    # still trains fine afterwards
    s = scene.frame_sample(41, n_frames=40)
    out = m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                      s["bbox_dict"], s["T"], 41))
    assert np.isfinite(float(out["loss"]))


def test_adequate_pool_never_forces():
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg(pool=64))
    for fid in range(30):
        s = scene.frame_sample(fid, n_frames=30)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
    assert getattr(m, "pool_force_released", 0) == 0
