import numpy as np
import jax
import pytest

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


def _train(m, scene, fids):
    for fid in fids:
        s = scene.frame_sample(fid, n_frames=8)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))


@pytest.fixture(scope="module")
def trained():
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg())
    _train(m, scene, range(5))
    return scene, m


def test_object_checkpoint_roundtrip(trained, tmp_path):
    scene, m = trained
    f = C.save_object_checkpoint(m, scene.SPHERE_ID, str(tmp_path), epoch=4)
    assert f.endswith(f"obj_{scene.SPHERE_ID}_frame_4.npz")
    ck = C.load_object_checkpoint(f)
    assert ck["obj_id"] == scene.SPHERE_ID and ck["epoch"] == 4
    pe, mlp_p, scale = m.object_params(scene.SPHERE_ID)
    np.testing.assert_allclose(ck["mlp"]["w_in"], np.asarray(mlp_p["w_in"]))
    np.testing.assert_allclose(ck["pe"]["dirs"], np.asarray(pe["dirs"]))
    assert ck["obj_scale"] == scale
    assert ck["bound"] is not None


def test_restore_object_into_fresh_mapper(trained, tmp_path):
    scene, m = trained
    f = C.save_object_checkpoint(m, scene.SPHERE_ID, str(tmp_path), epoch=4)
    m2 = Mapper(_cfg())
    _train(m2, scene, range(2))  # registers the objects
    before = np.asarray(m2.object_params(scene.SPHERE_ID)[1]["w_in"])
    C.restore_object_into_mapper(m2, C.load_object_checkpoint(f))
    after = np.asarray(m2.object_params(scene.SPHERE_ID)[1]["w_in"])
    trained_w = np.asarray(m.object_params(scene.SPHERE_ID)[1]["w_in"])
    assert np.abs(after - before).max() > 0
    np.testing.assert_allclose(after, trained_w)


def test_full_checkpoint_resume(trained, tmp_path):
    scene, m = trained
    f = C.save_full_checkpoint(m, str(tmp_path), frame_id=4)
    m2 = Mapper(_cfg())
    resume_frame = C.load_full_checkpoint(m2, f)
    assert resume_frame == 4
    assert m2.n_objects == m.n_objects
    np.testing.assert_array_equal(np.asarray(m2.bank_obj.step),
                                  np.asarray(m.bank_obj.step))
    np.testing.assert_allclose(np.asarray(m2.bank_obj.mlp["w_in"]),
                               np.asarray(m.bank_obj.mlp["w_in"]))
    # Adam moments restored (exact-resume capability)
    np.testing.assert_allclose(np.asarray(m2.bank_obj.m),
                               np.asarray(m.bank_obj.m))
    # pool content restored
    np.testing.assert_array_equal(np.asarray(m2.pool.packed),
                                  np.asarray(m.pool.packed))
    # resumed mapper can continue training
    _train(m2, scene, [5, 6])
    assert int(m2.bank_obj.step.max()) > int(m.bank_obj.step.max())


def test_resumed_training_matches_uninterrupted(tmp_path):
    """Training 3 frames, checkpointing, then 2 more must equal training 5
    straight frames (bitwise state resume — impossible in the reference)."""
    scene = SyntheticScene(width=80, height=60)
    mA = Mapper(_cfg())
    _train(mA, scene, range(5))

    mB = Mapper(_cfg())
    _train(mB, scene, range(3))
    f = C.save_full_checkpoint(mB, str(tmp_path), frame_id=2)
    mC = Mapper(_cfg())
    C.load_full_checkpoint(mC, f)
    _train(mC, scene, [3, 4])

    np.testing.assert_allclose(np.asarray(mC.bank_obj.mlp["w_in"]),
                               np.asarray(mA.bank_obj.mlp["w_in"]),
                               atol=1e-6)
