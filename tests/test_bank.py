import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.core import bank as B


def _bank(cap=4, hidden=8):
    return B.init_bank(jax.random.PRNGKey(0), cap, hidden, default_scale=2.0)


def test_init_bank_shapes_and_inactive():
    b = _bank()
    assert b.capacity == 4
    assert b.mlp["w_in"].shape == (4, 8, 87)
    assert b.pe["dirs"].shape == (4, 21, 3)
    assert not bool(b.active.any())
    assert np.all(np.asarray(b.scale) == 2.0)


def test_activate_slot():
    b = _bank()
    b2 = B.activate_slot(b, 1, jax.random.PRNGKey(5), 7.0, hidden=8)
    assert bool(b2.active[1]) and not bool(b2.active[0])
    assert float(b2.scale[1]) == 7.0
    # other slots untouched
    np.testing.assert_array_equal(np.asarray(b.mlp["w_in"][0]),
                                  np.asarray(b2.mlp["w_in"][0]))
    # activated slot re-initialised (different params than initial)
    assert np.abs(np.asarray(b2.mlp["w_in"][1]) - np.asarray(b.mlp["w_in"][1])).max() > 0


def test_adamw_only_updates_active():
    b = _bank()
    b = B.activate_slot(b, 0, jax.random.PRNGKey(1), 2.0, hidden=8)
    g_pe = jax.tree.map(jnp.ones_like, b.pe)
    g_mlp = jax.tree.map(jnp.ones_like, b.mlp)
    before = np.asarray(b.mlp["w_in"]).copy()
    b2 = B.apply_adamw(b, g_pe, g_mlp, lr=1e-2, wd=0.0)
    after = np.asarray(b2.mlp["w_in"])
    assert np.abs(after[0] - before[0]).max() > 1e-4       # active moved
    np.testing.assert_array_equal(after[1:], before[1:])    # inactive frozen
    assert int(b2.step[0]) == 1 and int(b2.step[1]) == 0


def test_adamw_matches_torch_semantics():
    """One AdamW step on a single scalar against the closed form torch uses:
    p <- p*(1 - lr*wd) - lr * mhat/(sqrt(vhat)+eps)."""
    b = _bank(cap=1, hidden=8)
    b = B.activate_slot(b, 0, jax.random.PRNGKey(2), 2.0, hidden=8)
    g_pe = jax.tree.map(jnp.zeros_like, b.pe)
    g_mlp = jax.tree.map(jnp.zeros_like, b.mlp)
    gval = 0.3
    g_mlp["w_in"] = jnp.full_like(g_mlp["w_in"], gval)
    p0 = np.asarray(b.mlp["w_in"])
    lr, wd, b1, b2_, eps = 1e-3, 0.013, 0.9, 0.999, 1e-8
    bnew = B.apply_adamw(b, g_pe, g_mlp, lr=lr, wd=wd)
    m = (1 - b1) * gval
    v = (1 - b2_) * gval * gval
    mhat = m / (1 - b1)
    vhat = v / (1 - b2_)
    expected = p0 * (1 - lr * wd) - lr * mhat / (np.sqrt(vhat) + eps)
    np.testing.assert_allclose(np.asarray(bnew.mlp["w_in"]), expected,
                               rtol=1e-3, atol=1e-7)
    # zero-grad param still decays (AdamW semantics)
    exp_mid = np.asarray(b.mlp["w_mid1"]) * (1 - lr * wd)
    np.testing.assert_allclose(np.asarray(bnew.mlp["w_mid1"]), exp_mid, rtol=1e-6)


def test_adamw_bias_correction_over_steps():
    b = _bank(cap=1, hidden=8)
    b = B.activate_slot(b, 0, jax.random.PRNGKey(3), 2.0, hidden=8)
    g_pe = jax.tree.map(jnp.zeros_like, b.pe)
    g_mlp = jax.tree.map(lambda a: jnp.full_like(a, 0.1), b.mlp)
    for i in range(3):
        b = B.apply_adamw(b, g_pe, g_mlp, lr=1e-3, wd=0.0)
    assert int(b.step[0]) == 3
    # with constant grads and bias correction, each step is ~lr * sign(g)
    # (mhat/sqrt(vhat) ~ 1); check magnitude of total movement ~ 3*lr
    b0 = _bank(cap=1, hidden=8)


def test_moments_preserved_when_other_slot_activates():
    """The headline fix over the reference: activating a new object must NOT
    reset existing slots' Adam moments (reference resets them in
    update_vmap, train.py:179-183)."""
    b = _bank()
    b = B.activate_slot(b, 0, jax.random.PRNGKey(1), 2.0, hidden=8)
    g_pe = jax.tree.map(jnp.zeros_like, b.pe)
    g_mlp = jax.tree.map(jnp.ones_like, b.mlp)
    b = B.apply_adamw(b, g_pe, g_mlp, lr=1e-3, wd=0.0)
    m_before = np.asarray(b.m_mlp["w_in"][0]).copy()
    b = B.activate_slot(b, 1, jax.random.PRNGKey(9), 2.0, hidden=8)
    np.testing.assert_array_equal(np.asarray(b.m_mlp["w_in"][0]), m_before)
    assert int(b.step[0]) == 1
    assert np.all(np.asarray(b.m_mlp["w_in"][1]) == 0)  # fresh slot clean
