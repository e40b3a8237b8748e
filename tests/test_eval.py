import numpy as np
import pytest

from vmap_tpu.eval.mesh_eval import (compose_scene_mesh, crop_to_gt_bound,
                                     eval_object, eval_scene,
                                     object_ids_in_dir)
from vmap_tpu.eval.metrics import (accuracy, all_metrics, chamfer, completion,
                                   completion_ratio)
from vmap_tpu.geometry.mesh import Mesh


def _icosphere(radius=1.0, center=(0, 0, 0), subdiv=3) -> Mesh:
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        vlist = list(verts)
        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                vlist.append((vlist[a] + vlist[b]) / 2)
                mid[key] = len(vlist) - 1
            return mid[key]
        for f in faces:
            a, b, c = f
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    return Mesh(verts + np.asarray(center, float), faces)


def test_metrics_identical_sets():
    pts = np.random.default_rng(0).random((500, 3))
    assert accuracy(pts, pts) == 0.0
    assert completion(pts, pts) == 0.0
    assert completion_ratio(pts, pts, 0.01) == 1.0
    assert chamfer(pts, pts) == 0.0


def test_metrics_known_offset():
    gt = np.zeros((100, 3))
    rec = gt + [0.02, 0, 0]
    assert abs(accuracy(gt, rec) - 0.02) < 1e-9
    assert abs(completion(gt, rec) - 0.02) < 1e-9
    assert completion_ratio(gt, rec, 0.01) == 0.0
    assert completion_ratio(gt, rec, 0.05) == 1.0


def test_metrics_asymmetry():
    """Accuracy penalises spurious reconstruction; completion penalises
    missing GT coverage."""
    gt = np.random.default_rng(1).random((1000, 3))
    rec_partial = gt[:100]                    # accurate but incomplete
    assert accuracy(gt, rec_partial) < 0.01
    assert completion(gt, rec_partial) > 0.05


def test_eval_scene_self():
    sphere = _icosphere(1.0)
    # identical surfaces: the only residual is finite-sample NN spacing,
    # ~sqrt(area/n) = sqrt(4*pi/5000) ~ 0.05
    m = eval_scene(sphere, sphere, n=5000)
    assert m["accuracy"] < 0.05 and m["completion"] < 0.05
    assert m["completion_ratio_5cm"] > 0.9


def test_eval_object_crop_removes_outside_geometry():
    gt = _icosphere(0.5, center=(0, 0, 0))
    rec = Mesh.concatenate([
        _icosphere(0.5, center=(0, 0, 0)),
        _icosphere(0.5, center=(5, 0, 0)),   # junk far away
    ])
    m = eval_object(rec, gt, n=4000)
    assert m is not None
    # junk outside the GT bound is cropped away -> accuracy stays tight
    assert m["accuracy"] < 0.03, m
    cropped = crop_to_gt_bound(rec, gt)
    assert cropped.vertices[:, 0].max() < 1.0


def test_eval_object_empty_after_crop():
    gt = _icosphere(0.5, center=(0, 0, 0))
    rec = _icosphere(0.5, center=(50, 0, 0))
    assert eval_object(rec, gt) is None


def test_compose_scene_and_ids(tmp_path):
    a = _icosphere(0.5, subdiv=1)
    b = _icosphere(0.3, center=(2, 0, 0), subdiv=1)
    a.export(str(tmp_path / "frame_99_obj1.obj"))
    b.export(str(tmp_path / "frame_99_obj2.obj"))
    assert object_ids_in_dir(str(tmp_path)) == [1, 2]
    scene = compose_scene_mesh(str(tmp_path))
    assert len(scene.faces) == len(a.faces) + len(b.faces)


def test_observed_points_mask_frustum_depth_and_occlusion():
    from vmap_tpu.eval.mesh_eval import observed_points_mask
    # one camera at origin looking down +z, 64x48, fx=fy=40
    W, H, f = 64, 48, 40.0
    T = np.eye(4)
    # depth map: constant 2m wall, except a 1m patch in the left half
    dmap = np.full((W, H), 2.0, np.float32)
    dmap[:20, :] = 1.0
    pts = np.array([
        [0.0, 0.0, 2.0],     # on the wall, centre pixel -> observed
        [0.0, 0.0, 3.0],     # behind the wall (occluded, |z-d|>tol)
        [0.0, 0.0, -1.0],    # behind the camera
        [10.0, 0.0, 2.0],    # projects outside the image
        [-0.7, 0.0, 1.0],    # u = -0.7/1*40+31.5 = 3.5 -> patch, depth 1
    ])
    m = observed_points_mask(pts, T[None], dmap[None], f, f,
                             (W - 1) / 2, (H - 1) / 2, tol=0.05)
    assert m.tolist() == [True, False, False, False, True]


def test_eval_object_gt_filter_restricts_completion():
    gt = _icosphere(0.5)
    full = eval_object(gt, gt, n=2000)
    half = eval_object(gt, gt, n=2000,
                       gt_filter=lambda p: p[:, 0] > 0)
    assert full is not None and half is not None
    # filtering GT points can only shrink (or keep) the completion set
    assert half["completion"] <= full["completion"] + 1e-6
    # filter that kills everything -> None
    assert eval_object(gt, gt, n=500, gt_filter=lambda p: p[:, 0] > 99) is None


def test_crop_to_gt_bound_planar_gt_min_extent():
    # planar GT: OBB thickness ~0 -> multiplicative enlarge alone would
    # crop a volumetric reconstruction to an infinitesimal slab
    quad_v = np.array([[-1.0, 1.0, -1], [1.0, 1.0, -1],
                       [1.0, 1.0, 1], [-1.0, 1.0, 1]])
    quad_f = np.array([[0, 1, 2], [0, 2, 3]])
    gt = Mesh(quad_v, quad_f)
    # reconstruction: same plane but bumpy within +-3cm
    rng = np.random.default_rng(0)
    rec_v = quad_v.copy()
    grid = np.stack(np.meshgrid(np.linspace(-1, 1, 9),
                                np.linspace(-1, 1, 9)), -1).reshape(-1, 2)
    rec_v = np.column_stack([grid[:, 0],
                             1.0 + rng.uniform(-0.03, 0.03, len(grid)),
                             grid[:, 1]])
    faces = []
    for i in range(8):
        for j in range(8):
            a = i * 9 + j
            faces += [[a, a + 1, a + 10], [a, a + 10, a + 9]]
    rec = Mesh(rec_v, np.array(faces))
    cropped = crop_to_gt_bound(rec, gt)
    assert len(cropped.faces) > 0
    m = eval_object(rec, gt, n=2000)
    assert m is not None and m["completion"] < 0.1, m


def test_synthetic_depth_respects_max_depth():
    from vmap_tpu.data.synthetic import SyntheticScene
    scene = SyntheticScene(width=64, height=48, fx=40.0, fy=40.0)
    for fid in (0, 5, 11):
        _, depth, _, _ = scene.render(fid, n_frames=12)
        assert depth.max() <= scene.max_depth + 1e-5
    # the clamp must not wipe out the scene: most pixels still valid
    _, depth, _, _ = scene.render(0, n_frames=12)
    assert (depth > 0).mean() > 0.4


def test_object_eval_scannet_id_offset_and_bg_vocab(tmp_path):
    """ScanNet-format object eval maps recon id N -> GT submesh N-1 (the
    loader's +1 instance shift, scannet.py / reference dataset.py:247) and
    builds the bg mesh from the SCANNET background-class vocabulary.
    Regression: the first scored ScanNet room run compared every object
    against the wrong GT (and the bg against Replica-vocab classes that
    collide with ScanNet furniture ids), scoring 32 cm mean accuracy on
    1.8 cm fields (docs/room_study.md run 4)."""
    import json
    from vmap_tpu.eval.eval_3d import main as eval_main

    mesh_dir = tmp_path / "mesh"
    gt_dir = tmp_path / "gt"
    mesh_dir.mkdir(); gt_dir.mkdir()
    a = _icosphere(0.5, subdiv=1)
    b = _icosphere(0.3, center=(4, 0, 0), subdiv=1)
    wall = _icosphere(1.0, center=(-6, 0, 0), subdiv=1)
    # GT ids 1, 2 (+ wall 3); recon ids are shifted +1 -> obj2, obj3
    a.export(str(gt_dir / "mesh_semantic.ply_1.ply"))
    b.export(str(gt_dir / "mesh_semantic.ply_2.ply"))
    wall.export(str(gt_dir / "mesh_semantic.ply_3.ply"))
    # class 5 is ScanNet furniture but REPLICA background -> the old
    # Replica-vocab bg concat wrongly swallowed it; class 1 = ScanNet wall
    info = {"objects": [{"id": 1, "class_id": 5}, {"id": 2, "class_id": 20},
                        {"id": 3, "class_id": 1}]}
    (gt_dir / "info_semantic.json").write_text(json.dumps(info))
    a.export(str(mesh_dir / "frame_9_obj2.obj"))
    b.export(str(mesh_dir / "frame_9_obj3.obj"))
    wall.export(str(mesh_dir / "frame_9_obj0.obj"))

    res = eval_main(["object", "--mesh_dir", str(mesh_dir),
                     "--gt_dir", str(gt_dir), "--format", "ScanNet",
                     "--frame", "9", "--n_points", "2000"])
    # identical meshes under the CORRECT mapping -> point-sampling noise
    # only (~1 cm at n_points=2000 on a subdiv-1 icosphere)
    assert res["mean"]["accuracy"] < 0.03
    assert res["per_object"][2]["completion"] < 0.03
    assert res["per_object"][0]["accuracy"] < 0.03  # bg vs ScanNet wall
    # Replica mode mis-pairs every id (obj2 vs GT2 etc.) -> large error
    res_rep = eval_main(["object", "--mesh_dir", str(mesh_dir),
                         "--gt_dir", str(gt_dir),
                         "--frame", "9", "--n_points", "2000"])
    # mis-paired GT empties the crop (NaN mean) or scores metres of error
    assert not (res_rep["mean"]["accuracy"] < 0.5)
