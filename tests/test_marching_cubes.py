import numpy as np

from vmap_tpu.geometry.marching_cubes import marching_cubes
from vmap_tpu.geometry.mesh import Mesh


def _sphere_volume(dim=32, radius=10.0):
    c = (dim - 1) / 2.0
    idx = np.arange(dim)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    # occupancy-style field: 1 inside, 0 outside, smooth near boundary
    return 1.0 / (1.0 + np.exp((r - radius) * 2.0))


def test_empty_volume_returns_none():
    v, f = marching_cubes(np.zeros((8, 8, 8)))
    assert v is None and f is None
    v, f = marching_cubes(np.ones((8, 8, 8)))
    assert v is None and f is None


def test_sphere_radius_accuracy():
    dim, radius = 32, 10.0
    verts, faces = marching_cubes(_sphere_volume(dim, radius), level=0.5)
    assert verts is not None and len(faces) > 100
    c = (dim - 1) / 2.0
    r = np.linalg.norm(verts - c, axis=1)
    assert abs(r.mean() - radius) < 0.2      # sub-voxel accuracy
    assert r.std() < 0.2


def test_sphere_watertight_area():
    dim, radius = 32, 10.0
    verts, faces = marching_cubes(_sphere_volume(dim, radius), level=0.5)
    mesh = Mesh(verts, faces)
    area = mesh.area
    expected = 4 * np.pi * radius ** 2
    assert abs(area - expected) / expected < 0.05
    # every edge shared by exactly 2 faces (closed surface)
    edges = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                    faces[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_vertices_in_index_coords():
    dim = 16
    verts, _ = marching_cubes(_sphere_volume(dim, 5.0), level=0.5)
    assert verts.min() >= 0 and verts.max() <= dim - 1


def test_plane_isosurface():
    """A linear field crossing the level at x = 7.25 gives a flat surface."""
    dim = 16
    x = np.arange(dim, dtype=np.float32)
    vol = np.broadcast_to(x[:, None, None], (dim, dim, dim)).copy()
    verts, faces = marching_cubes(vol, level=7.25)
    assert verts is not None
    np.testing.assert_allclose(verts[:, 0], 7.25, atol=1e-4)
    # area of the plane patch ~ (dim-1)^2
    area = Mesh(verts, faces).area
    assert abs(area - (dim - 1) ** 2) / (dim - 1) ** 2 < 0.01


def test_orientation_consistency():
    """Face normals of a sphere point consistently (all out or all in)."""
    dim, radius = 24, 8.0
    verts, faces = marching_cubes(_sphere_volume(dim, radius), level=0.5)
    m = Mesh(verts, faces)
    c = (dim - 1) / 2.0
    centroids = m.triangles.mean(axis=1) - c
    fn = m.face_normals()
    dots = (centroids * fn).sum(axis=1)
    frac_out = (dots > 0).mean()
    assert frac_out > 0.99 or frac_out < 0.01
