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
