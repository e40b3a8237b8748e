import jax.numpy as jnp
import numpy as np

from vmap_tpu.ops import rays as R


def test_ray_dirs_cache_center_pixel():
    dirs = np.asarray(R.ray_dirs_cache(8, 6, fx=2.0, fy=3.0, cx=4.0, cy=3.0))
    assert dirs.shape == (8, 6, 3)
    np.testing.assert_allclose(dirs[4, 3], [0, 0, 1])
    np.testing.assert_allclose(dirs[0, 0], [(0 - 4) / 2.0, (0 - 3) / 3.0, 1.0])
    np.testing.assert_allclose(dirs[7, 5], [(7 - 4) / 2.0, (5 - 3) / 3.0, 1.0])


def test_origin_dirs_w_identity():
    T = jnp.eye(4)[None]
    d = jnp.array([[[0.1, 0.2, 1.0]]])
    o, dw = R.origin_dirs_w(T, d)
    np.testing.assert_allclose(np.asarray(o), [[0, 0, 0]])
    np.testing.assert_allclose(np.asarray(dw), np.asarray(d))


def test_origin_dirs_w_rotation_translation():
    th = np.pi / 2
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    T[:3, 3] = [1, 2, 3]
    d = jnp.array([[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]])
    o, dw = R.origin_dirs_w(jnp.asarray(T)[None], d)
    np.testing.assert_allclose(np.asarray(o), [[1, 2, 3]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw[0, 0]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw[0, 1]), [0, 0, 1], atol=1e-6)


def test_batched_poses():
    T = jnp.stack([jnp.eye(4), jnp.eye(4).at[:3, 3].set(jnp.array([5.0, 0, 0]))])
    d = jnp.ones((2, 3, 3))
    o, dw = R.origin_dirs_w(T, d)
    assert o.shape == (2, 3) and dw.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(o[1]), [5, 0, 0])
