"""Fused Pallas field-eval kernel vs the reference XLA ops path.

On CPU the kernel runs in Pallas interpret mode — same program, same
semantics, so numerical agreement here validates the kernel logic that runs
compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmap_tpu.kernels.ensemble import (fused_eval_single, fused_field_eval,
                                       prepare_params)
from vmap_tpu.ops.embedding import embed, init_pe_params
from vmap_tpu.ops.mlp import init_mlp_params, mlp_apply
from vmap_tpu.ops.render import occupancy_activation


def _reference(pe, mlp_p, scale, pts):
    emb = embed(pe, pts, scale)
    alpha, color = mlp_apply(mlp_p, emb)
    return alpha[..., 0], color


@pytest.mark.parametrize("hidden", [32, 128])
def test_fused_matches_reference_single(hidden):
    key = jax.random.PRNGKey(0)
    pe = init_pe_params()
    mlp_p = init_mlp_params(key, hidden)
    pts = jax.random.normal(jax.random.PRNGKey(1), (700, 3)) * 2.0
    a_ref, c_ref = _reference(pe, mlp_p, 2.0, pts)
    occ, color = fused_eval_single(pe, mlp_p, 2.0, pts, hidden=hidden,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(occ),
                               np.asarray(occupancy_activation(a_ref)),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(color), np.asarray(c_ref),
                               atol=2e-5)


def test_fused_matches_reference_bank():
    n_obj, hidden = 3, 32
    keys = jax.random.split(jax.random.PRNGKey(2), n_obj)
    pe = jax.vmap(lambda k: init_pe_params(k))(keys)
    mlp_p = jax.vmap(lambda k: init_mlp_params(k, hidden))(keys)
    scale = jnp.array([2.0, 5.0, 1.0])
    pts = jax.random.normal(jax.random.PRNGKey(3), (n_obj, 130, 3))

    a_ref, c_ref = jax.vmap(
        lambda p, m, s, x: _reference(p, m, s, x))(pe, mlp_p, scale, pts)

    prepared = prepare_params(pe, mlp_p, scale, hidden)
    alpha, color = fused_field_eval(prepared, pts, hidden, interpret=True)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(a_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(color), np.asarray(c_ref), atol=2e-5)


def test_fused_handles_tile_padding():
    """M not a multiple of the tile: padded internally, exact sizes out."""
    hidden = 32
    pe = init_pe_params()
    mlp_p = init_mlp_params(jax.random.PRNGKey(4), hidden)
    for m in (1, 127, 513):
        pts = jax.random.normal(jax.random.PRNGKey(m), (m, 3))
        occ, color = fused_eval_single(pe, mlp_p, 2.0, pts, hidden=hidden,
                                       interpret=True)
        assert occ.shape == (m,) and color.shape == (m, 3)
        a_ref, c_ref = _reference(pe, mlp_p, 2.0, pts)
        np.testing.assert_allclose(np.asarray(occ),
                                   np.asarray(occupancy_activation(a_ref)),
                                   atol=2e-5)


def test_train_vjp_matches_autodiff():
    """The hand-derived backward kernel must agree with jax autodiff of the
    reference path — every weight gradient, including the PE projection."""
    hidden, n_obj, m = 32, 2, 200
    keys = jax.random.split(jax.random.PRNGKey(7), n_obj)
    pe = jax.vmap(lambda k: init_pe_params(k))(keys)
    mlp_p = jax.vmap(lambda k: init_mlp_params(k, hidden))(keys)
    scale = jnp.array([2.0, 3.0])
    pts = jax.random.normal(jax.random.PRNGKey(8), (n_obj, m, 3))
    # an arbitrary smooth scalar readout over (alpha, color)
    w_a = jax.random.normal(jax.random.PRNGKey(9), (n_obj, m))
    w_c = jax.random.normal(jax.random.PRNGKey(10), (n_obj, m, 3))

    def loss_ref(pe, mlp_p):
        a, c = jax.vmap(lambda p, mm, s, x: _reference(p, mm, s, x))(
            pe, mlp_p, scale, pts)
        return (a * w_a).sum() + (c * w_c).sum()

    def loss_pallas(pe, mlp_p):
        from vmap_tpu.kernels.ensemble import fused_field_train
        prepared = prepare_params(pe, mlp_p, scale, hidden)
        a, c = fused_field_train(prepared, pts, hidden, True, 256)
        return (a * w_a).sum() + (c * w_c).sum()

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(pe, mlp_p)
    v_pal, g_pal = jax.value_and_grad(loss_pallas, argnums=(0, 1))(pe, mlp_p)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-4)
    for tree_ref, tree_pal in zip(g_ref, g_pal):
        for k in tree_ref:
            a = np.asarray(tree_ref[k])
            b = np.asarray(tree_pal[k])
            np.testing.assert_allclose(
                b, a, rtol=2e-3, atol=2e-3 * max(1.0, np.abs(a).max()),
                err_msg=f"grad mismatch for {k}")


def test_train_vjp_padding_safe():
    """m not a multiple of the tile: padded points/cotangents must not leak
    into the gradients."""
    hidden = 32
    pe = init_pe_params()
    mlp_p = init_mlp_params(jax.random.PRNGKey(11), hidden)
    pe_b = jax.tree.map(lambda a: a[None], pe)
    mlp_b = jax.tree.map(lambda a: a[None], mlp_p)
    scale = jnp.array([2.0])
    pts = jax.random.normal(jax.random.PRNGKey(12), (1, 77, 3))

    def loss(mlp_b, m_take):
        from vmap_tpu.kernels.ensemble import fused_field_train
        prepared = prepare_params(pe_b, mlp_b, scale, hidden)
        a, c = fused_field_train(prepared, pts, hidden, True, 256)
        return a[:, :m_take].sum() + c[:, :m_take].sum()

    g77 = jax.grad(loss)(mlp_b, 77)

    def loss_ref(mlp_b):
        a, c = _reference(pe, jax.tree.map(lambda x: x[0], mlp_b), 2.0, pts[0])
        return a.sum() + c.sum()

    g_ref = jax.grad(loss_ref)(mlp_b)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g77[k]), np.asarray(g_ref[k]),
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"grad mismatch for {k}")
