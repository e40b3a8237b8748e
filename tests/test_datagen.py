"""Data generation: mesh raytracer + real-layout writers + loader round-trip.

The renderer is validated against the analytic scene (data/synthetic.py
renders the same primitives analytically); the writers are validated by
reading the output back through the REAL dataset loaders (Replica and
ScanNet layouts) — the loaders therefore get exercised on the exact
on-disk file layout of the real datasets (VERDICT #5 / missing #1).
"""

import json
import os

import numpy as np
import pytest

from vmap_tpu.data_generation import (MeshRenderer, RenderSettings,
                                      SceneObject, write_gt_submeshes,
                                      write_replica_sequence,
                                      write_scannet_sequence)
from vmap_tpu.data_generation.settings import orbit_trajectory
from vmap_tpu.geometry.primitives import box


W, H, FX = 48, 36, 30.0


def _box_scene():
    bmin, bmax = np.array([-0.5, -0.3, -0.4]), np.array([0.5, 0.7, 0.4])
    objects = [SceneObject(box(bmin, bmax), instance_id=1, class_id=20,
                           albedo=(0.8, 0.2, 0.2))]
    st = RenderSettings(width=W, height=H, fx=FX, fy=FX, tri_chunk=64)
    return (bmin, bmax), MeshRenderer(objects, st)


def _analytic_box_depth(bmin, bmax, t_wc):
    """Exact z-depth of an axis-aligned box (slab method, matching
    data/synthetic.py _ray_box)."""
    u = np.arange(W, dtype=np.float32)
    v = np.arange(H, dtype=np.float32)
    d = np.ones((W, H, 3), np.float32)
    d[:, :, 0] = ((u - (W - 1) / 2) / FX)[:, None]
    d[:, :, 1] = ((v - (H - 1) / 2) / FX)[None, :]
    dw = d @ t_wc[:3, :3].T
    o = t_wc[:3, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / dw
        t0 = (bmin - o) * inv
        t1 = (bmax - o) * inv
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax >= tmin) & (tmax > 0)
    t = np.where(tmin > 0, tmin, tmax)
    return np.where(hit & (t > 0), t, 0.0)


def test_raytracer_depth_matches_analytic_box():
    (bmin, bmax), renderer = _box_scene()
    t_wc = orbit_trajectory(8, radius=2.0, height=-0.3)[1]
    f = renderer.render(t_wc)
    gt = _analytic_box_depth(bmin, bmax, t_wc)
    assert (f["depth"] > 0).sum() > 50
    np.testing.assert_allclose(f["depth"], gt, rtol=1e-4, atol=1e-4)
    assert set(np.unique(f["inst"])) <= {0, 1}
    np.testing.assert_array_equal(f["inst"] > 0, gt > 0)
    assert set(np.unique(f["cls"])) <= {0, 20}


def _render_frames(n=3):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from generate_dataset import synthetic_scene_objects
    scene, objects = synthetic_scene_objects("Replica")
    st = RenderSettings(width=W, height=H, fx=FX, fy=FX, tri_chunk=128)
    renderer = MeshRenderer(objects, st)
    traj = orbit_trajectory(n, radius=scene.orbit_radius,
                            height=scene.orbit_height)
    return scene, objects, list(renderer.render_trajectory(traj)), traj


def test_replica_layout_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    scene, objects, frames, traj = _render_frames()
    root = str(tmp_path / "room_x")
    write_replica_sequence(root, frames, traj)
    write_gt_submeshes(os.path.join(root, "habitat"), objects)

    # exact real layout on disk
    assert os.path.exists(os.path.join(root, "traj_w_c.txt"))
    assert os.path.exists(os.path.join(root, "rgb", "rgb_0.png"))
    assert os.path.exists(os.path.join(root, "depth", "depth_2.png"))
    assert os.path.exists(os.path.join(
        root, "semantic_instance", "semantic_instance_1.png"))
    info = json.load(open(os.path.join(root, "habitat",
                                       "info_semantic.json")))
    assert {o["id"] for o in info["objects"]} == {1, 2, 3}

    # loads through the real loader
    from vmap_tpu.config import Config
    from vmap_tpu.data.replica import ReplicaDataset
    cfg = Config(dataset_dir=root, dataset_format="Replica", W=W, H=H,
                 fx=FX, fy=FX, cx=(W - 1) / 2, cy=(H - 1) / 2,
                 depth_scale=1e-3, max_depth=8.0, imap_mode=False)
    ds = ReplicaDataset(cfg)
    assert len(ds) == 3
    s = ds[1]
    assert s["image"].shape == (W, H, 3)
    np.testing.assert_allclose(s["depth"], frames[1]["depth"], atol=2e-3)
    np.testing.assert_allclose(s["T"], traj[1], atol=1e-6)
    # floor (class 40 in the Replica background list) folded to instance 0
    assert 3 not in np.unique(s["obj"])
    ids = set(np.unique(s["obj"]))
    assert ids <= {0, 1, 2} and len(ids) >= 2
    for oid in ids - {0}:
        assert oid in s["bbox_dict"]


def test_scannet_layout_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    scene, objects, frames, traj = _render_frames()
    # rebuild with ScanNet class ids (floor class 1 is ScanNet background)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from generate_dataset import synthetic_scene_objects
    _, objects = synthetic_scene_objects("ScanNet")
    st = RenderSettings(width=W, height=H, fx=FX, fy=FX, tri_chunk=128)
    frames = list(MeshRenderer(objects, st).render_trajectory(traj))
    root = str(tmp_path / "scene_x")
    write_scannet_sequence(root, frames, traj, invalid_pose_frames=(1,))

    assert os.path.exists(os.path.join(root, "color", "0.jpg"))
    assert os.path.exists(os.path.join(root, "pose", "2.txt"))

    from vmap_tpu.config import Config
    from vmap_tpu.data.scannet import ScanNetDataset
    cfg = Config(dataset_dir=root, dataset_format="ScanNet", W=W, H=H,
                 fx=FX, fy=FX, cx=(W - 1) / 2, cy=(H - 1) / 2,
                 depth_scale=1e-3, max_depth=8.0, imap_mode=False, mw=0)
    ds = ScanNetDataset(cfg)
    assert len(ds) == 3
    assert ds[1] is None          # invalid pose skipped, no recursion
    s = ds[2]
    assert s is not None and s["frame_id"] == 2
    np.testing.assert_allclose(s["depth"], frames[2]["depth"], atol=2e-3)


def test_room_class_vocabulary_folds_in_both_loaders():
    """The room's shell must fold to background in WHICHEVER loader reads
    the written layout: Replica ids as-built, ScanNet ids after
    SCANNET_CLS_MAP (round-4 regression: an unmapped ScanNet room turned
    walls/floor/ceiling into room-sized foreground objects)."""
    from vmap_tpu.data.replica import BACKGROUND_CLASSES as REPLICA_BG
    from vmap_tpu.data.scannet import BACKGROUND_CLASSES as SCANNET_BG
    from vmap_tpu.data_generation.room import SCANNET_CLS_MAP, make_room_scene
    objs, shell, _ = make_room_scene(6, seed=0)
    for o in shell:
        assert o.class_id in REPLICA_BG, o.class_id
        assert SCANNET_CLS_MAP[o.class_id] in SCANNET_BG, o.class_id
    for o in objs:
        assert o.class_id not in REPLICA_BG, o.class_id
        mapped = SCANNET_CLS_MAP.get(o.class_id, o.class_id)
        assert mapped not in SCANNET_BG, (o.class_id, mapped)


def test_ply_furniture_room(tmp_path):
    """write_ply_library -> make_room_scene(ply_dir=...) loads complex
    mesh-file furniture (the reference renders real Replica assets,
    habitat_renderer.py:27-246; the library approximates their triangle
    counts through the PLY load path)."""
    import numpy as np
    from vmap_tpu.data_generation.room import (make_room_scene,
                                               write_ply_library)
    lib = tmp_path / "ply_lib"
    paths = write_ply_library(str(lib), seed=3)
    assert len(paths) == 9 and all(p.endswith(".ply") for p in paths)
    objs, shell, meta = make_room_scene(12, seed=0, ply_dir=str(lib))
    faces = [len(o.mesh.faces) for o in objs]
    assert max(faces) > 500, faces        # loaded pieces joined the pool
    for o in objs:
        v = o.mesh.vertices
        assert np.isfinite(v).all()
        assert v[:, 1].max() <= 1e-3      # footed at the floor (y down)
