"""Shipped configs parse; eval CLI runs end-to-end on generated meshes."""

import json
import os

import numpy as np
import pytest

from vmap_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name", [
    "configs/synthetic_vmap.json",
    "configs/synthetic_imap.json",
    "configs/Replica/room0_vmap.json",
    "configs/Replica/room0_imap.json",
])
def test_shipped_configs_parse(name):
    c = Config.from_json(os.path.join(REPO, name))
    assert c.n_iter_per_frame > 0
    assert c.n_samples_per_frame == c.n_per_optim // c.win_size
    if "imap" in name:
        assert c.imap_mode and not c.do_bg and c.max_n_models == 1
    else:
        assert not c.imap_mode and c.do_bg


def test_replica_config_matches_reference_workload():
    c = Config.from_json(os.path.join(REPO, "configs/Replica/room0_vmap.json"))
    # the headline workload shape (BASELINE.md)
    assert c.max_n_models == 100
    assert c.hidden_feature_size == 32 and c.hidden_feature_size_bg == 128
    assert c.n_per_optim == 120 and c.n_per_optim_bg == 1200
    assert c.n_iter_per_frame == 20
    assert (c.W, c.H) == (1200, 680)


def test_eval_cli_scene_and_object(tmp_path):
    from vmap_tpu.eval.eval_3d import main as eval_main
    from vmap_tpu.geometry.primitives import icosphere

    mesh_dir = tmp_path / "scene_mesh"
    mesh_dir.mkdir()
    gt_dir = tmp_path / "habitat"
    gt_dir.mkdir()

    sphere = icosphere(0.5, (0, 0, 0), subdivisions=2)
    sphere.export(str(mesh_dir / "frame_9_obj3.obj"))
    gt = icosphere(0.5, (0, 0, 0), subdivisions=3)
    gt.export(str(tmp_path / "gt_scene.ply"))
    gt.export(str(gt_dir / "mesh_semantic.ply_3.ply"))
    (gt_dir / "info_semantic.json").write_text(json.dumps({"objects": []}))

    out = tmp_path / "scene.json"
    res = eval_main(["scene", "--mesh_dir", str(mesh_dir),
                     "--gt_mesh", str(tmp_path / "gt_scene.ply"),
                     "--n_points", "3000", "--out", str(out)])
    assert res["accuracy"] < 0.1
    assert out.exists()

    res = eval_main(["object", "--mesh_dir", str(mesh_dir),
                     "--gt_dir", str(gt_dir), "--frame", "9",
                     "--n_points", "2000"])
    assert 3 in res["per_object"]
    assert res["mean"]["accuracy"] < 0.1


def test_extract_objects_cli(tmp_path):
    from vmap_tpu.eval.extract_objects import main as extract_main
    ply = tmp_path / "mesh_semantic.ply"
    ply.write_text("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
property int object_id
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2 12
""")
    written = extract_main([str(ply)])
    assert len(written) == 1 and written[0].endswith("mesh_semantic.ply_12.ply")
