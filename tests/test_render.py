import jax.numpy as jnp
import numpy as np

from vmap_tpu.ops import render as rr


def test_occupancy_is_sigmoid():
    a = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(rr.occupancy_activation(a)),
        1.0 / (1.0 + np.exp(-np.asarray(a))), rtol=1e-6)


def test_termination_closed_form():
    occ = np.array([[0.5, 0.5, 0.5]])
    term = np.asarray(rr.occupancy_to_termination(jnp.asarray(occ)))
    # term_i = occ_i * prod_{j<i}(1-occ_j+1e-10)
    expected = np.array([[0.5, 0.5 * (0.5 + 1e-10), 0.5 * (0.5 + 1e-10) ** 2]])
    np.testing.assert_allclose(term, expected, rtol=1e-6)


def test_termination_opaque_first_sample():
    occ = jnp.array([[1.0, 0.7, 0.2]])
    term = np.asarray(rr.occupancy_to_termination(occ))
    # everything terminates at the first sample (up to the 1e-10 epsilon)
    np.testing.assert_allclose(term[0, 0], 1.0)
    np.testing.assert_allclose(term[0, 1:], 0.0, atol=1e-9)


def test_termination_batch_shape():
    occ = jnp.ones((4, 7, 10)) * 0.3
    term = rr.occupancy_to_termination(occ)
    assert term.shape == (4, 7, 10)
    # free-space prob decreases monotonically along the ray for constant occ
    t = np.asarray(term)
    assert np.all(np.diff(t, axis=-1) < 0)


def test_render_weighted_sum():
    term = jnp.array([[0.2, 0.3, 0.5]])
    z = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(rr.render(term, z)), [2.3], rtol=1e-6)


def test_render_color_axis():
    term = jnp.ones((2, 4, 3))  # [rays, samples, 1-broadcast]
    color = jnp.ones((2, 4, 3, 3)) * 0.5
    out = rr.render(term[..., None], color, axis=-2)
    assert out.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 0.5 * 3)


def test_render_loss_l1_l2():
    r = jnp.array([1.0, 2.0])
    gt = jnp.array([2.0, 0.0])
    np.testing.assert_allclose(np.asarray(rr.render_loss(r, gt, "L1")), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(rr.render_loss(r, gt, "L2")), [1.0, 4.0])


def test_make_3d_grid_identity():
    g = rr.make_3d_grid(dim=3)
    assert g.shape == (3, 3, 3, 3)
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), [-1, -1, -1])
    np.testing.assert_allclose(np.asarray(g[2, 2, 2]), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(g[1, 1, 1]), [0, 0, 0], atol=1e-7)


def test_make_3d_grid_scale_transform():
    scale = jnp.array([2.0, 3.0, 4.0])
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10, 20, 30]
    th = np.pi / 2
    T[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    g = rr.make_3d_grid(dim=2, scale=scale, transform=jnp.asarray(T))
    # corner (1,1,1)*scale = (2,3,4); rotated 90deg about z -> (-3,2,4); + t
    np.testing.assert_allclose(np.asarray(g[1, 1, 1]), [7, 22, 34], rtol=1e-5)
