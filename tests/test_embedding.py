import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.ops import embedding as E


def test_sizes():
    total, e1, e2 = E.embedding_sizes(5)
    assert (total, e1, e2) == (129, 87, 42)
    total3, e1_, e2_ = E.embedding_sizes(3)
    assert total3 == 21 * 4 + 3 and e1_ == 87


def test_embed_shape_and_prefix():
    p = E.init_pe_params()
    x = jnp.array([[0.3, -0.2, 1.5], [0.0, 0.0, 0.0]])
    emb = E.embed(p, x, scale=2.0)
    assert emb.shape == (2, 129)
    # first 3 dims are x/scale
    np.testing.assert_allclose(np.asarray(emb[:, :3]), np.asarray(x) / 2.0, rtol=1e-6)
    # origin maps to all zeros (sin(0) = 0)
    np.testing.assert_allclose(np.asarray(emb[1]), 0.0, atol=1e-7)


def test_embed_band_major_layout():
    """Band k, direction d lives at index 3 + k*21 + d (reference
    embedding.py:85-89 flattens [bands, dirs] band-major)."""
    p = E.init_pe_params()
    x = jnp.array([[0.1, 0.2, 0.3]])
    scale = 1.0
    emb = np.asarray(E.embed(p, x, scale))
    proj = (np.asarray(x) / scale) @ E.ICO_DIRS.T  # [1, 21]
    for k in range(6):
        expected = np.sin(proj * (2.0 ** k) * np.pi)
        got = emb[:, 3 + k * 21: 3 + (k + 1) * 21]
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_trunk_split_covers_first_four_bands():
    _, e1, _ = E.embedding_sizes(5)
    assert e1 == 3 + 4 * 21  # x + bands 2^0..2^3 go to the density trunk


def test_dirs_are_unit_norm():
    norms = np.linalg.norm(E.ICO_DIRS, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_embed_grad_flows_to_dirs():
    p = E.init_pe_params()
    x = jnp.ones((4, 3))

    def f(params):
        return E.embed(params, x, 2.0).sum()

    g = jax.grad(f)(p)
    assert np.abs(np.asarray(g["dirs"])).sum() > 0
