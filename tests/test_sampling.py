import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.ops import sampling as S


def test_stratified_bins_bounds_and_strata():
    key = jax.random.PRNGKey(0)
    mins = jnp.full((1000,), 1.0)
    maxs = jnp.full((1000,), 3.0)
    z = np.asarray(S.stratified_bins(key, mins, maxs, 4))
    assert z.shape == (1000, 4)
    # stratum k spans [1 + 0.5k, 1 + 0.5(k+1)]
    for k in range(4):
        assert z[:, k].min() >= 1.0 + 0.5 * k - 1e-6
        assert z[:, k].max() <= 1.0 + 0.5 * (k + 1) + 1e-6
    # strictly increasing along the ray
    assert np.all(np.diff(z, axis=1) > 0)


def test_stratified_bins_per_ray_range():
    key = jax.random.PRNGKey(1)
    mins = jnp.array([0.0, 2.0])
    maxs = jnp.array([1.0, 4.0])
    z = np.asarray(S.stratified_bins(key, mins, maxs, 8))
    assert (z[0] >= 0).all() and (z[0] <= 1).all()
    assert (z[1] >= 2).all() and (z[1] <= 4).all()


def test_normal_bins_sorted_clipped_centered():
    key = jax.random.PRNGKey(2)
    depth = jnp.full((5000,), 2.0)
    z = np.asarray(S.normal_bins_sampling(key, depth, 9, delta=0.1))
    assert z.shape == (5000, 9)
    assert z.min() >= 2.0 - 0.1 - 1e-6 and z.max() <= 2.0 + 0.1 + 1e-6
    assert np.all(np.diff(z, axis=1) >= 0)  # sorted
    # std of raw normal is delta/3; clipped std slightly below
    assert abs(z.mean() - 2.0) < 1e-3
    assert 0.02 < z.std() < 0.04


def test_sample_z_invalid_depth_covers_full_range():
    key = jax.random.PRNGKey(3)
    depth = jnp.zeros((200,))
    state = jnp.zeros((200,), jnp.int32)
    z, valid = S.sample_z(key, depth, state, min_depth=0.0, max_bound=jnp.asarray(5.0),
                          n_cam2surface=1, n_bins=9, surface_eps=0.1, stop_eps=0.05)
    assert z.shape == (200, 10)
    assert not bool(valid.any())
    zn = np.asarray(z)
    assert zn.min() >= 0 and zn.max() <= 5.0
    # stratified over [0, 5] in 10 bins: first bin < 0.5, last > 4.5
    assert zn[:, 0].max() <= 0.5 + 1e-6
    assert zn[:, -1].min() >= 4.5 - 1e-6


def test_sample_z_this_obj_concentrates_at_surface():
    key = jax.random.PRNGKey(4)
    d = 3.0
    depth = jnp.full((500,), d)
    state = jnp.full((500,), S.THIS_OBJ, jnp.int32)
    z, valid = S.sample_z(key, depth, state, min_depth=0.0, max_bound=jnp.asarray(4.0),
                          n_cam2surface=1, n_bins=9, surface_eps=0.1, stop_eps=0.05)
    assert bool(valid.all())
    zn = np.asarray(z)
    # first bin: stratified [0, d - eps]
    assert zn[:, 0].max() <= d - 0.1 + 1e-6 and zn[:, 0].min() >= 0
    # surface bins within +-eps of depth
    assert np.all(np.abs(zn[:, 1:] - d) <= 0.1 + 1e-6)


def test_sample_z_other_obj_extends_behind_surface():
    key = jax.random.PRNGKey(5)
    d = 3.0
    depth = jnp.full((500,), d)
    state = jnp.full((500,), S.OTHER_OBJ, jnp.int32)
    z, _ = S.sample_z(key, depth, state, min_depth=0.0, max_bound=jnp.asarray(4.0),
                      n_cam2surface=1, n_bins=9, surface_eps=0.1, stop_eps=0.05)
    zn = np.asarray(z)[:, 1:]
    # stratified [d - eps, d + stop_eps]
    assert zn.min() >= d - 0.1 - 1e-6
    assert zn.max() <= d + 0.05 + 1e-6
    assert zn.max() > d + 0.02  # actually reaches behind the surface


def test_rays_to_points():
    origins = jnp.array([[1.0, 0.0, 0.0]])
    dirs = jnp.array([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])  # [1 kf, 2 px, 3]
    z = jnp.array([[[2.0, 3.0], [1.0, 4.0]]])  # [1, 2, 2]
    pts = np.asarray(S.rays_to_points(origins, dirs, z))
    assert pts.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(pts[0, 0, 0], [1, 0, 2])
    np.testing.assert_allclose(pts[0, 0, 1], [1, 0, 3])
    np.testing.assert_allclose(pts[0, 1, 1], [1, 4, 0])


def test_sample_z_jit_compatible():
    f = jax.jit(lambda k, d, s: S.sample_z(
        k, d, s, 0.0, jnp.asarray(5.0), 1, 9, 0.1, 0.05))
    z, valid = f(jax.random.PRNGKey(0), jnp.ones((16,)), jnp.ones((16,), jnp.int32))
    assert z.shape == (16, 10)
