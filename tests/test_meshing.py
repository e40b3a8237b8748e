"""Meshing pipeline on a hand-built field (no training needed): a bank slot
whose MLP is replaced by weights approximating a known sphere occupancy is
too fiddly; instead we mesh a real trained mapper (small budget) and check
the extracted geometry against the analytic scene."""

import numpy as np
import pytest

from vmap_tpu.config import Config
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.core.meshing import adaptive_grid_dim, eval_points
from vmap_tpu.data.synthetic import SyntheticScene
from vmap_tpu.geometry.obb import OrientedBox


@pytest.fixture(scope="module")
def trained():
    scene = SyntheticScene(width=80, height=60)
    cfg = Config(
        max_n_models=4, do_bg=True, hidden_feature_size=16,
        hidden_feature_size_bg=16, n_iter_per_frame=6,
        win_size=2, n_samples_per_frame=32,
        win_size_bg=2, n_samples_per_frame_bg=48,
        keyframe_buffer_size=6, keyframe_step=3, keyframe_step_bg=3,
        W=80, H=60, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        frame_pool_size=16, live_voxel_size=0.02, grid_dim=48, seed=0)
    m = Mapper(cfg)
    for fid in list(range(8)) * 3:
        s = scene.frame_sample(fid, n_frames=8)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
    return scene, m


def test_object_bound_covers_sphere(trained):
    scene, m = trained
    box = m.get_bound(scene.SPHERE_ID, stride=2)
    assert box is not None
    c, r = scene.sphere_center, scene.sphere_radius
    # bound center near the sphere, extents at least the diameter-ish
    assert np.linalg.norm(box.center - c) < 0.5 * r + 0.2
    assert box.extent.max() >= 2 * r * 0.7
    assert box.extent.max() < 6 * r  # not absurdly inflated


def test_adaptive_grid_dim(trained):
    scene, m = trained
    box = OrientedBox([0, 0, 0], np.eye(3), [1.0, 0.5, 0.5])
    # same floor-divide formula as train.py:351 (fp floor: 1.0//0.01 == 99)
    assert adaptive_grid_dim(box, 0.01, 256) == int(1.0 // 0.01 + 1)
    assert adaptive_grid_dim(box, 0.001, 256) == 256


def test_mesh_object_sphere(trained):
    scene, m = trained
    mesh = m.mesh_object(scene.SPHERE_ID, grid_dim=40)
    assert mesh is not None and len(mesh.faces) > 50
    # mesh vertices concentrate near the true sphere surface
    d = np.linalg.norm(mesh.vertices - scene.sphere_center, axis=1)
    err = np.abs(d - scene.sphere_radius)
    assert np.median(err) < 0.15, (np.median(err), d.mean())
    # vertex colours present and plausibly red-ish (albedo 0.85, 0.25, 0.2)
    assert mesh.vertex_colors is not None
    mean_col = mesh.vertex_colors.mean(axis=0)
    assert mean_col[0] > mean_col[2]


def test_export_meshes(trained, tmp_path):
    scene, m = trained
    paths = m.export_meshes(str(tmp_path), frame_id=23)
    assert len(paths) >= 1
    names = [p.split("/")[-1] for p in paths]
    assert all(n.startswith("frame_23_obj") and n.endswith(".obj") for n in names)
    from vmap_tpu.geometry.mesh import load_mesh
    mm = load_mesh(paths[0])
    assert len(mm.faces) > 0


def test_eval_points_chunking(trained):
    scene, m = trained
    pe, mlp_p, scale = m.object_params(scene.SPHERE_ID)
    pts = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    occ, col = eval_points(pe, mlp_p, scale, pts, chunk=256)  # forces 4 chunks
    occ2, col2 = eval_points(pe, mlp_p, scale, pts, chunk=2048)  # 1 chunk
    assert occ.shape == (1000,)
    np.testing.assert_allclose(occ, occ2, atol=1e-5)
    np.testing.assert_allclose(col, col2, atol=1e-5)
