import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.core import bank as B


def _bank(cap=4, hidden=8):
    return B.init_bank(jax.random.PRNGKey(0), cap, hidden, default_scale=2.0)


def test_init_bank_shapes_and_inactive():
    b = _bank()
    assert b.capacity == 4
    assert b.mlp["w_in"].shape == (4, 8, 87)      # dict view of flat storage
    assert b.pe["dirs"].shape == (4, 21, 3)
    assert b.flat.shape == (4, b.spec.n_params)
    assert not bool(b.active.any())
    assert np.all(np.asarray(b.scale) == 2.0)


def test_spec_roundtrip():
    b = _bank(cap=2, hidden=8)
    pe, mlp_p = b.params_for(1)
    flat = b.spec.flatten(pe, mlp_p)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(b.flat[1]))
    pe2, mlp2 = b.spec.unflatten(flat)
    for k in mlp_p:
        np.testing.assert_array_equal(np.asarray(mlp2[k]), np.asarray(mlp_p[k]))


def test_activate_slot():
    b = _bank()
    b2 = B.activate_slot(b, 1, jax.random.PRNGKey(5), 7.0)
    assert bool(b2.active[1]) and not bool(b2.active[0])
    assert float(b2.scale[1]) == 7.0
    # other slots untouched
    np.testing.assert_array_equal(np.asarray(b.flat[0]), np.asarray(b2.flat[0]))
    # activated slot re-initialised (different params than initial)
    assert np.abs(np.asarray(b2.flat[1]) - np.asarray(b.flat[1])).max() > 0


def test_adamw_only_updates_active():
    b = _bank()
    b = B.activate_slot(b, 0, jax.random.PRNGKey(1), 2.0)
    g = jnp.ones_like(b.flat)
    before = np.asarray(b.flat).copy()
    b2 = B.apply_adamw(b, g, lr=1e-2, wd=0.0)
    after = np.asarray(b2.flat)
    assert np.abs(after[0] - before[0]).max() > 1e-4       # active moved
    np.testing.assert_array_equal(after[1:], before[1:])    # inactive frozen
    assert int(b2.step[0]) == 1 and int(b2.step[1]) == 0


def test_adamw_matches_torch_semantics():
    """One AdamW step against the closed form torch uses:
    p <- p*(1 - lr*wd) - lr * mhat/(sqrt(vhat)+eps)."""
    b = _bank(cap=1, hidden=8)
    b = B.activate_slot(b, 0, jax.random.PRNGKey(2), 2.0)
    gval = 0.3
    g = jnp.full_like(b.flat, gval)
    p0 = np.asarray(b.flat)
    lr, wd, b1, b2_, eps = 1e-3, 0.013, 0.9, 0.999, 1e-8
    bnew = B.apply_adamw(b, g, lr=lr, wd=wd)
    mhat = (1 - b1) * gval / (1 - b1)
    vhat = (1 - b2_) * gval * gval / (1 - b2_)
    expected = p0 * (1 - lr * wd) - lr * mhat / (np.sqrt(vhat) + eps)
    np.testing.assert_allclose(np.asarray(bnew.flat), expected,
                               rtol=1e-3, atol=1e-7)


def test_adamw_zero_grad_still_decays():
    b = _bank(cap=1, hidden=8)
    b = B.activate_slot(b, 0, jax.random.PRNGKey(3), 2.0)
    p0 = np.asarray(b.flat)
    bnew = B.apply_adamw(b, jnp.zeros_like(b.flat), lr=1e-3, wd=0.013)
    np.testing.assert_allclose(np.asarray(bnew.flat), p0 * (1 - 1e-3 * 0.013),
                               rtol=1e-6)


def test_moments_preserved_when_other_slot_activates():
    """The headline fix over the reference: activating a new object must NOT
    reset existing slots' Adam moments (reference resets them in
    update_vmap, train.py:179-183)."""
    b = _bank()
    b = B.activate_slot(b, 0, jax.random.PRNGKey(1), 2.0)
    b = B.apply_adamw(b, jnp.ones_like(b.flat), lr=1e-3, wd=0.0)
    m_before = np.asarray(b.m[0]).copy()
    b = B.activate_slot(b, 1, jax.random.PRNGKey(9), 2.0)
    np.testing.assert_array_equal(np.asarray(b.m[0]), m_before)
    assert int(b.step[0]) == 1
    assert np.all(np.asarray(b.m[1]) == 0)  # fresh slot clean


def test_set_slot_params():
    b = _bank(cap=2, hidden=8)
    pe, mlp_p = b.params_for(0)
    pe = {k: np.asarray(v) * 0 + 3.0 for k, v in pe.items()}
    b2 = B.set_slot_params(b, 1, pe, mlp_p)
    pe2, _ = b2.params_for(1)
    np.testing.assert_allclose(np.asarray(pe2["dirs"]), 3.0)
    # slot 0 untouched
    np.testing.assert_array_equal(np.asarray(b2.flat[0]), np.asarray(b.flat[0]))


def test_bank_pytree_has_few_leaves():
    """The whole point of flat storage: a bank is 6 device buffers, so a
    donated train-step dispatch stays cheap (dispatch cost scales with the
    number of donated leaves on the TPU frontend)."""
    b = _bank()
    assert len(jax.tree.leaves(b)) == 6
