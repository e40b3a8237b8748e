import numpy as np
import pytest

from vmap_tpu.geometry.mesh import Mesh, load_mesh
from vmap_tpu.geometry.obb import OrientedBox


def _unit_cube() -> Mesh:
    verts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                     float)
    faces = []
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return Mesh(verts, np.array(faces))


def test_area_and_normals():
    cube = _unit_cube()
    assert abs(cube.area - 6.0) < 1e-9
    fn = cube.face_normals()
    assert np.allclose(np.linalg.norm(fn, axis=1), 1.0)


def test_sample_surface_uniform():
    cube = _unit_cube()
    pts = cube.sample_surface(20000, seed=0)
    assert pts.shape == (20000, 3)
    assert pts.min() >= -1e-9 and pts.max() <= 1 + 1e-9
    # each face carries ~1/6 of the samples; check one: z == 0 face
    on_z0 = (np.abs(pts[:, 2]) < 1e-9).mean()
    assert abs(on_z0 - 1 / 6) < 0.02


def test_transforms():
    cube = _unit_cube().apply_translation([1, 2, 3]).apply_scale(2.0)
    assert np.allclose(cube.vertices.min(0), [2, 4, 6])
    T = np.eye(4)
    T[:3, 3] = [-2, -4, -6]
    cube.apply_transform(T)
    assert np.allclose(cube.vertices.min(0), [0, 0, 0])


def test_concatenate():
    a = _unit_cube()
    b = _unit_cube().apply_translation([5, 0, 0])
    m = Mesh.concatenate([a, b])
    assert len(m.vertices) == 16 and len(m.faces) == 24
    assert abs(m.area - 12.0) < 1e-9


def test_obj_roundtrip(tmp_path):
    cube = _unit_cube()
    cube.vertex_colors = np.full((8, 3), 200, np.uint8)
    p = str(tmp_path / "cube.obj")
    cube.export(p)
    m = load_mesh(p)
    assert len(m.vertices) == 8 and len(m.faces) == 12
    np.testing.assert_allclose(np.sort(m.vertices, 0), np.sort(cube.vertices, 0))
    assert m.vertex_colors is not None


def test_ply_roundtrip_binary(tmp_path):
    cube = _unit_cube()
    cube.vertex_colors = np.arange(24, dtype=np.uint8).reshape(8, 3)
    p = str(tmp_path / "cube.ply")
    cube.export(p)
    m = load_mesh(p)
    assert len(m.vertices) == 8 and len(m.faces) == 12
    np.testing.assert_allclose(m.vertices, cube.vertices)
    np.testing.assert_array_equal(m.vertex_colors, cube.vertex_colors)


def test_ply_ascii_load(tmp_path):
    txt = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
"""
    p = tmp_path / "tri.ply"
    p.write_text(txt)
    m = load_mesh(str(p))
    assert len(m.vertices) == 3 and len(m.faces) == 1
    assert abs(m.area - 0.5) < 1e-9


def test_slice_halfspace():
    cube = _unit_cube()
    half = cube.slice_halfspace([0.5, 0, 0], [1, 0, 0])  # keep x >= 0.5
    assert half.vertices[:, 0].min() >= 0.5 - 1e-9
    # open box: 4 half side faces (4*0.5) + full x=1 face (1) + cut cap is
    # NOT added (slice keeps surface only) -> area 3.0
    assert abs(half.area - 3.0) < 1e-6


def test_slice_box_crop():
    cube = _unit_cube()
    box = OrientedBox(center=[0.5, 0.5, 0.5], R=np.eye(3), extent=[0.6, 2, 2])
    cropped = cube.slice_box(box)
    assert cropped.vertices[:, 0].min() >= 0.2 - 1e-9
    assert cropped.vertices[:, 0].max() <= 0.8 + 1e-9
    # sampling still works on the cropped mesh
    pts = cropped.sample_surface(100, seed=0)
    assert (pts[:, 0] >= 0.2 - 1e-9).all()


def test_slice_empty_result():
    cube = _unit_cube()
    gone = cube.slice_halfspace([5, 0, 0], [1, 0, 0])
    assert len(gone.faces) == 0


def test_sample_zero_area_raises():
    m = Mesh(np.zeros((3, 3)), np.array([[0, 1, 2]]))
    with pytest.raises(ValueError):
        m.sample_surface(10)
