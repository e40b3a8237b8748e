"""Bank-vectorised meshing parity: mesh_all_objects == per-object meshing."""

import numpy as np

from vmap_tpu.config import Config
from vmap_tpu.core import meshing
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene


def _cfg():
    return Config(
        max_n_models=4, do_bg=True, hidden_feature_size=8,
        hidden_feature_size_bg=8, n_iter_per_frame=2,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=8, keyframe_buffer_size=5, keyframe_step=2,
        keyframe_step_bg=2, W=80, H=60, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        frame_pool_size=16, seed=0, grid_dim=24, live_voxel_size=0.05)


def _trained_mapper():
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg())
    for fid in range(5):
        s = scene.frame_sample(fid, n_frames=8)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
    return m


def test_mesh_all_objects_matches_serial(tmp_path):
    m = _trained_mapper()
    batched = meshing.mesh_all_objects(m, chunk=4096)
    obj_ids = [oid for oid in sorted(m.registry)
               if not m.registry[oid].is_bg]
    assert set(batched) == set(obj_ids)
    n_meshed = 0
    for oid in obj_ids:
        serial = m.mesh_object(oid)
        b = batched[oid]
        if serial is None:
            assert b is None
            continue
        n_meshed += 1
        np.testing.assert_allclose(b.vertices, serial.vertices,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(b.faces, serial.faces)
        # uint8 quantisation can flip by 1 where the f32 colour sits on a
        # rounding boundary (different summation order in the batched eval)
        np.testing.assert_allclose(
            b.vertex_colors.astype(np.int32),
            serial.vertex_colors.astype(np.int32), atol=1)
    assert n_meshed >= 1


def test_export_meshes_writes_objs(tmp_path):
    m = _trained_mapper()
    paths = m.export_meshes(str(tmp_path), frame_id=4)
    assert len(paths) >= 1
    assert all(p.endswith(".obj") for p in paths)
