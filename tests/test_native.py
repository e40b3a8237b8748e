"""Native C++ geometry core vs the numpy reference implementation."""

import numpy as np
import pytest

from vmap_tpu import native
from vmap_tpu.geometry.marching_cubes import marching_cubes, marching_cubes_numpy
from vmap_tpu.geometry.mesh import Mesh


def _sphere_volume(dim=32, radius=10.0):
    c = (dim - 1) / 2.0
    idx = np.arange(dim)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    return 1.0 / (1.0 + np.exp((r - radius) * 2.0))


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="g++ unavailable")


@needs_native
def test_native_builds_and_loads():
    assert native.get_lib() is not None


@needs_native
def test_native_matches_numpy_on_sphere():
    vol = _sphere_volume(24, 8.0)
    v_n, f_n = native.marching_cubes_native(vol, 0.5)
    v_p, f_p = marching_cubes_numpy(vol, 0.5)
    # same welded vertex set (orders differ)
    assert len(v_n) == len(v_p)
    assert len(f_n) == len(f_p)
    sn = np.sort(np.round(v_n * 1024).astype(np.int64).view("i8,i8,i8"), axis=0)
    sp = np.sort(np.round(v_p * 1024).astype(np.int64).view("i8,i8,i8"), axis=0)
    np.testing.assert_array_equal(sn, sp)
    # identical surface area
    a_n = Mesh(v_n, f_n).area
    a_p = Mesh(v_p, f_p).area
    np.testing.assert_allclose(a_n, a_p, rtol=1e-4)


@needs_native
def test_native_orientation():
    dim, radius = 24, 8.0
    v, f = native.marching_cubes_native(_sphere_volume(dim, radius), 0.5)
    m = Mesh(v, f)
    c = (dim - 1) / 2.0
    centroids = m.triangles.mean(axis=1) - c
    dots = (centroids * m.face_normals()).sum(axis=1)
    assert (dots > 0).mean() > 0.99


@needs_native
def test_native_empty():
    v, f = native.marching_cubes_native(np.zeros((8, 8, 8), np.float32), 0.5)
    assert v is None and f is None


@needs_native
def test_dispatch_prefers_native():
    vol = _sphere_volume(16, 5.0)
    v_auto, f_auto = marching_cubes(vol, backend="auto")
    v_nat, f_nat = marching_cubes(vol, backend="native")
    np.testing.assert_array_equal(v_auto, v_nat)


@needs_native
def test_native_speed_large_grid():
    """128^3 grid must extract in well under the numpy time budget."""
    import time
    vol = _sphere_volume(128, 50.0)
    t0 = time.perf_counter()
    v, f = native.marching_cubes_native(vol, 0.5)
    t_native = time.perf_counter() - t0
    assert len(f) > 10000
    t0 = time.perf_counter()
    marching_cubes_numpy(vol, 0.5)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
