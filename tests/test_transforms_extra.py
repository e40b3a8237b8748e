import numpy as np

from vmap_tpu.data.transforms import (bbox_from_mask, bbox_from_mask_batch,
                                      enlarge_bbox, order_overlapping_masks)
from vmap_tpu.geometry.frames import (T_GL_CV, opengl_to_opencv_pose,
                                      pose_from_quat_trans, quat_to_rotation,
                                      yup_world_to_zup)


def test_bbox_from_mask():
    m = np.zeros((20, 10), bool)
    m[3:7, 2:5] = True
    assert bbox_from_mask(m) == [3, 7, 2, 5]
    assert bbox_from_mask(np.zeros((4, 4), bool)) is None


def test_bbox_batch_matches_single():
    rng = np.random.default_rng(0)
    masks = rng.random((5, 30, 20)) > 0.8
    masks[2] = False
    masks[2, 10:12, 5:8] = True
    u0, u1, v0, v1 = bbox_from_mask_batch(masks)
    for i in range(5):
        single = bbox_from_mask(masks[i])
        assert [u0[i], u1[i], v0[i], v1[i]] == single


def test_enlarge_bbox():
    bb = enlarge_bbox([10, 20, 10, 20], 0.2, 100, 100)
    assert bb == [9, 21, 9, 21]
    assert enlarge_bbox([10, 11, 10, 20], 0.2, 100, 100) is None  # degenerate
    bb = enlarge_bbox([0, 90, 0, 90], 0.5, 100, 100)
    assert bb == [0, 99, 0, 99]  # clipped


def test_order_overlapping_masks_containment():
    depth = np.full((10, 10), 2.0)
    big = np.zeros((10, 10), bool)
    big[2:9, 2:9] = True
    small = np.zeros((10, 10), bool)
    small[4:6, 4:6] = True  # fully inside big -> in front
    out = order_overlapping_masks([big, small], depth, [1, 2])
    assert out[4, 4] == 2
    assert out[2, 2] == 1


def test_order_overlapping_masks_depth():
    depth = np.full((10, 10), 5.0)
    depth[:, :5] = 1.0   # left half closer
    a = np.zeros((10, 10), bool)
    a[2:8, 1:6] = True    # mostly in the close half
    b = np.zeros((10, 10), bool)
    b[2:8, 4:9] = True    # mostly far
    out = order_overlapping_masks([a, b], depth, [1, 2])
    # overlap columns 4:6 -> a is closer on average -> a keeps them
    assert (out[2:8, 4:6] == 1).all()


def test_gl_cv_involution():
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    back = opengl_to_opencv_pose(opengl_to_opencv_pose(T))
    np.testing.assert_allclose(back, T)


def test_gl_cv_flips_y_z():
    T = np.eye(4)
    cv = opengl_to_opencv_pose(T)
    np.testing.assert_allclose(cv[:3, :3] @ [0, 1, 0], [0, -1, 0])
    np.testing.assert_allclose(cv[:3, :3] @ [0, 0, 1], [0, 0, -1])


def test_yup_zup():
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]  # y-up world position
    z = yup_world_to_zup(T)
    # y-up (1,2,3) -> z-up (1,-3,2)
    np.testing.assert_allclose(z[:3, 3], [1, -3, 2])


def test_quat_identity_and_90deg():
    np.testing.assert_allclose(quat_to_rotation([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # 90 deg about z: w=cos(45), z=sin(45)
    s = np.sin(np.pi / 4)
    R = quat_to_rotation([np.cos(np.pi / 4), 0, 0, s])
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_pose_from_quat_trans():
    T = pose_from_quat_trans([1, 0, 0, 0], [4, 5, 6])
    np.testing.assert_allclose(T[:3, 3], [4, 5, 6])
    np.testing.assert_allclose(T[:3, :3], np.eye(3))
