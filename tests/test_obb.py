import numpy as np
import pytest

from vmap_tpu.geometry.obb import OrientedBox, obb_from_points, oriented_bounds
from vmap_tpu.geometry.pointcloud import unproject_depth, voxel_downsample


def _rot(axis, th):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def test_axis_aligned_box():
    rng = np.random.default_rng(0)
    pts = rng.random((500, 3)) * [2.0, 1.0, 0.5]
    to_origin, extents = oriented_bounds(pts)
    np.testing.assert_allclose(np.sort(extents)[::-1], [2.0, 1.0, 0.5], atol=0.05)
    centered = pts @ to_origin[:3, :3].T + to_origin[:3, 3]
    assert np.all(np.abs(centered) <= extents / 2 + 1e-6)


def test_rotated_box_recovered():
    rng = np.random.default_rng(1)
    pts = (rng.random((800, 3)) - 0.5) * [3.0, 1.0, 0.4]
    R = _rot([1, 2, 3], 0.7)
    t = np.array([5.0, -2.0, 1.0])
    world = pts @ R.T + t
    to_origin, extents = oriented_bounds(world)
    np.testing.assert_allclose(np.sort(extents)[::-1], [3.0, 1.0, 0.4], atol=0.06)
    vol = np.prod(extents)
    assert vol < 3.0 * 1.0 * 0.4 * 1.1  # within 10% of optimum


def test_obb_contains():
    box = OrientedBox([1, 1, 1], _rot([0, 0, 1], 0.5), [2, 1, 1])
    inside = np.array([[1, 1, 1]])
    outside = np.array([[5, 5, 5]])
    assert box.contains(inside).all()
    assert not box.contains(outside).any()


def test_obb_corners_and_planes():
    box = OrientedBox([0, 0, 0], np.eye(3), [2, 4, 6])
    c = box.corners()
    assert c.shape == (8, 3)
    np.testing.assert_allclose(np.abs(c).max(0), [1, 2, 3])
    for o, n in box.face_planes():
        # inward normal: center is on the positive side
        assert (np.asarray([0, 0, 0]) - o) @ n > 0


def test_degenerate_points_joggle_fallback():
    # colinear points: joggled hull yields a valid hair-thin box
    line = np.stack([np.linspace(0, 1, 10)] * 3, axis=1)
    box = obb_from_points(line)
    assert box is not None
    assert box.extent.max() >= np.sqrt(3) * 0.9  # spans the segment
    # too few points is still a hard failure
    assert obb_from_points(np.zeros((2, 3))) is None


def test_coplanar_points_get_thin_box():
    rng = np.random.default_rng(5)
    pts = rng.random((200, 3))
    pts[:, 2] = 2.0  # exactly planar
    box = obb_from_points(pts, min_extent=0.05)
    assert box is not None
    assert box.extent.min() >= 0.05
    assert box.contains(np.array([[0.5, 0.5, 2.0]])).all()


def test_min_extent_floor():
    rng = np.random.default_rng(2)
    pts = rng.random((100, 3)) * [1.0, 1.0, 1e-4]  # nearly planar
    box = obb_from_points(pts, min_extent=0.05)
    assert box is not None
    assert box.extent.min() >= 0.05


def test_unproject_depth_roundtrip():
    w, h = 8, 6
    fx = fy = 10.0
    cx, cy = 3.5, 2.5
    depth = np.full((w, h), 2.0, np.float32)
    pts = unproject_depth(depth, fx, fy, cx, cy)
    assert pts.shape == (48, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # centre pixel ray passes through (0, 0, z): pixel (3.5, 2.5) not integral,
    # check a known one: u=v=0 -> x = (0-3.5)/10*2 = -0.7
    np.testing.assert_allclose(pts[0], [-0.7, -0.5, 2.0])


def test_unproject_mask_and_pose():
    depth = np.zeros((4, 4), np.float32)
    depth[1, 2] = 1.0
    depth[3, 3] = 1.0
    mask = np.zeros((4, 4), bool)
    mask[1, 2] = True
    T = np.eye(4)
    T[:3, 3] = [10, 0, 0]
    pts = unproject_depth(depth, 1, 1, 0, 0, t_wc=T, mask=mask)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [10 + 1, 2, 1])


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]])
    out = voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(sorted(out[:, 0]), [0.005, 1.0])
