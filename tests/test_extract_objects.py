import os

import numpy as np

from vmap_tpu.eval.extract_objects import split_by_object_id
from vmap_tpu.geometry.mesh import load_mesh, load_ply_with_face_props


SEMANTIC_PLY = """ply
format ascii 1.0
element vertex 6
property float x
property float y
property float z
element face 3
property list uchar int vertex_indices
property int object_id
end_header
0 0 0
1 0 0
0 1 0
5 5 5
6 5 5
5 6 5
3 0 1 2 7
3 3 4 5 9
3 3 5 4 9
"""


def _write(tmp_path):
    p = tmp_path / "mesh_semantic.ply"
    p.write_text(SEMANTIC_PLY)
    return str(p)


def test_face_props_loaded(tmp_path):
    p = _write(tmp_path)
    mesh, props = load_ply_with_face_props(p)
    assert len(mesh.faces) == 3
    np.testing.assert_array_equal(props["object_id"], [7, 9, 9])


def test_split_by_object_id(tmp_path):
    p = _write(tmp_path)
    written = split_by_object_id(p)
    names = sorted(os.path.basename(w) for w in written)
    assert names == ["mesh_semantic.ply_7.ply", "mesh_semantic.ply_9.ply"]
    m7 = load_mesh(written[0] if "7" in written[0] else written[1])
    m9 = load_mesh(written[1] if "9" in written[1] else written[0])
    assert len(m7.faces) == 1 and len(m7.vertices) == 3
    assert len(m9.faces) == 2 and len(m9.vertices) == 3
    # vertices correctly remapped to the object's own set
    assert m9.vertices.min() >= 5.0


def test_split_quad_faces_replicate_ids(tmp_path):
    txt = SEMANTIC_PLY.replace("element face 3", "element face 2").replace(
        "3 0 1 2 7\n3 3 4 5 9\n3 3 5 4 9\n",
        "3 0 1 2 7\n4 3 4 5 0 9\n")
    p = tmp_path / "quads.ply"
    p.write_text(txt)
    mesh, props = load_ply_with_face_props(str(p))
    # quad fan-triangulated into 2 faces, id replicated
    assert len(mesh.faces) == 3
    np.testing.assert_array_equal(props["object_id"], [7, 9, 9])
