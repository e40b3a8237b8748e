"""Orbax-backed full-state checkpoint backend."""

import numpy as np
import pytest

ocp = pytest.importorskip("orbax.checkpoint")

from vmap_tpu.config import Config
from vmap_tpu.core import checkpoint as C
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene


def _cfg():
    return Config(
        max_n_models=4, do_bg=True, hidden_feature_size=8,
        hidden_feature_size_bg=8, n_iter_per_frame=2,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=8, keyframe_buffer_size=5, keyframe_step=2,
        keyframe_step_bg=2, W=80, H=60, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        frame_pool_size=16, seed=0)


def test_orbax_roundtrip(tmp_path):
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg())
    for fid in range(4):
        s = scene.frame_sample(fid, n_frames=8)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
    d = C.save_full_checkpoint_orbax(m, str(tmp_path), frame_id=3)

    m2 = Mapper(_cfg())
    resume = C.load_full_checkpoint(m2, d)  # dispatches on the directory
    assert resume == 3
    assert m2.n_objects == m.n_objects
    np.testing.assert_allclose(np.asarray(m2.bank_obj.flat),
                               np.asarray(m.bank_obj.flat))
    np.testing.assert_allclose(np.asarray(m2.bank_obj.m),
                               np.asarray(m.bank_obj.m))
    np.testing.assert_array_equal(np.asarray(m2.pool.packed),
                                  np.asarray(m.pool.packed))
    # resumed mapper trains on
    s = scene.frame_sample(4, n_frames=8)
    out = m2.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                       s["bbox_dict"], s["T"], 4))
    assert np.isfinite(float(out["loss"]))

    # the PARENT dir (train.py's <logdir>/ckpt/state layout) also loads,
    # via its latest.json pointer — what train.py --resume and
    # scripts/remesh.py receive
    m3 = Mapper(_cfg())
    assert C.load_full_checkpoint(m3, str(tmp_path)) == 3
    np.testing.assert_allclose(np.asarray(m3.bank_obj.flat),
                               np.asarray(m.bank_obj.flat))
