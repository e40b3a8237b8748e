import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.ops import embedding as E
from vmap_tpu.ops import mlp as M


def test_init_shapes():
    p = M.init_mlp_params(jax.random.PRNGKey(0), hidden=32)
    assert p["w_in"].shape == (32, 87)
    assert p["w_cat"].shape == (32, 32 + 87)
    assert p["w_alpha"].shape == (1, 32)
    assert p["w_col"].shape == (32, 32 + 42)
    assert p["w_col_out"].shape == (3, 32)


def test_param_count_matches_reference_architecture():
    # per-object trainable params (MLP only): computed from layer fan-ins of
    # model.py:16-49 with emb1=87, emb2=42, h=32
    expected = (87 * 32 + 32) + (32 * 32 + 32) + (119 * 32 + 32) + \
               (32 * 32 + 32) + (32 * 1 + 1) + (74 * 32 + 32) + (32 * 3 + 3)
    assert M.count_params(32) == expected
    p = M.init_mlp_params(jax.random.PRNGKey(0), hidden=32)
    assert sum(int(np.prod(a.shape)) for a in jax.tree.leaves(p)) == expected


def test_forward_shapes_and_ranges():
    p = M.init_mlp_params(jax.random.PRNGKey(1), hidden=32)
    pe = E.init_pe_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (10, 7, 3))
    emb = E.embed(pe, x, 2.0)
    alpha, color = M.mlp_apply(p, emb)
    assert alpha.shape == (10, 7, 1)
    assert color.shape == (10, 7, 3)
    c = np.asarray(color)
    assert (c >= 0).all() and (c <= 1).all()  # sigmoid output


def test_alpha_scale_10x():
    """alpha = raw_linear * 10 (model.py:77): scaling the last-layer weights
    by 1/10 and bias to 0 must give alpha == 10 * (h4 @ w.T)."""
    p = M.init_mlp_params(jax.random.PRNGKey(3), hidden=32)
    p = dict(p)
    p["b_alpha"] = jnp.zeros_like(p["b_alpha"])
    emb = jax.random.normal(jax.random.PRNGKey(4), (5, 129))
    alpha, _ = M.mlp_apply(p, emb)
    p2 = dict(p)
    p2["w_alpha"] = p["w_alpha"] * 0.5
    alpha2, _ = M.mlp_apply(p2, emb)
    np.testing.assert_allclose(np.asarray(alpha2), np.asarray(alpha) * 0.5, rtol=1e-5)


def test_vmapped_ensemble_forward():
    n_obj = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n_obj)
    stacked = jax.vmap(lambda k: M.init_mlp_params(k, hidden=32))(keys)
    assert stacked["w_in"].shape == (n_obj, 32, 87)
    emb = jax.random.normal(jax.random.PRNGKey(1), (n_obj, 6, 129))
    alpha, color = jax.vmap(M.mlp_apply)(stacked, emb)
    assert alpha.shape == (n_obj, 6, 1)
    # each object's output must differ (independent params)
    a = np.asarray(alpha)
    assert np.abs(a[0] - a[1]).max() > 1e-4


def test_bfloat16_compute_close_to_f32():
    p = M.init_mlp_params(jax.random.PRNGKey(5), hidden=32)
    emb = jax.random.normal(jax.random.PRNGKey(6), (128, 129))
    a32, c32 = M.mlp_apply(p, emb)
    abf, cbf = M.mlp_apply(p, emb, compute_dtype=jnp.bfloat16)
    assert abf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(abf), np.asarray(a32), atol=0.25)
    np.testing.assert_allclose(np.asarray(cbf), np.asarray(c32), atol=0.05)


def test_xavier_init_statistics():
    p = M.init_mlp_params(jax.random.PRNGKey(7), hidden=256)
    w = np.asarray(p["w_mid1"])
    expected_std = (2.0 / (256 + 256)) ** 0.5
    assert abs(w.std() - expected_std) / expected_std < 0.05
