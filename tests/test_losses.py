import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.ops import losses as L
from vmap_tpu.ops import render as rr


def _mk_batch(key, n_obj=3, n_rays=8, n_s=10):
    ks = jax.random.split(key, 5)
    alpha = jax.random.normal(ks[0], (n_obj, n_rays, n_s))
    color = jax.nn.sigmoid(jax.random.normal(ks[1], (n_obj, n_rays, n_s, 3)))
    z = jnp.sort(jax.random.uniform(ks[2], (n_obj, n_rays, n_s)) * 4 + 0.1, axis=-1)
    gt_depth = jax.random.uniform(ks[3], (n_obj, n_rays)) * 4 + 0.1
    gt_color = jax.nn.sigmoid(jax.random.normal(ks[4], (n_obj, n_rays, 3)))
    sem = jnp.ones((n_obj, n_rays), jnp.int32)
    mask_depth = jnp.ones((n_obj, n_rays), bool)
    return alpha, color, gt_depth, gt_color, sem, mask_depth, z


def test_reduce_batch_loss_masked_mean():
    loss_mat = jnp.array([[1.0, 2.0, 3.0], [4.0, 0.0, 0.0]])
    mask = jnp.array([[1, 1, 1], [1, 0, 0]], bool)
    active = jnp.array([True, True])
    out = np.asarray(L.reduce_batch_loss(loss_mat, mask, active))
    np.testing.assert_allclose(out, [2.0, 4.0], rtol=1e-6)


def test_reduce_batch_loss_any_empty_zeroes_all():
    """Reference quirk (render_rays.py:68-73): one empty batch zeroes the
    whole term for every object."""
    loss_mat = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    mask = jnp.array([[1, 1], [0, 0]], bool)
    active = jnp.array([True, True])
    out = np.asarray(L.reduce_batch_loss(loss_mat, mask, active))
    np.testing.assert_allclose(out, [0.0, 0.0])


def test_reduce_batch_loss_inactive_empty_is_ignored():
    loss_mat = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    mask = jnp.array([[1, 1], [0, 0]], bool)
    active = jnp.array([True, False])  # the empty one is inactive
    out = np.asarray(L.reduce_batch_loss(loss_mat, mask, active))
    np.testing.assert_allclose(out, [1.5, 0.0], rtol=1e-6)


def test_reduce_batch_loss_var_weighting():
    loss_mat = jnp.array([[2.0]])
    mask = jnp.array([[1]], bool)
    var = jnp.array([[0.04]])  # sqrt = 0.2 -> info = 1/(0.2 + 1e-4)
    out = np.asarray(L.reduce_batch_loss(loss_mat, mask, jnp.array([True]), var=var))
    np.testing.assert_allclose(out, [2.0 / (0.2 + 1e-4)], rtol=1e-5)


def test_step_batch_loss_perfect_prediction_low_depth_loss():
    """A field with a hard surface exactly at gt depth: depth loss ~ 0."""
    n_rays, n_s = 16, 10
    gt_depth = jnp.full((1, n_rays), 2.0)
    z = jnp.broadcast_to(jnp.linspace(0.5, 2.0, n_s), (1, n_rays, n_s))
    # huge alpha at the last sample (z == gt depth), very negative before
    alpha = jnp.full((1, n_rays, n_s), -50.0).at[..., -1].set(50.0)
    color = jnp.ones((1, n_rays, n_s, 3)) * 0.5
    gt_color = jnp.ones((1, n_rays, 3)) * 0.5
    sem = jnp.ones((1, n_rays), jnp.int32)
    active = jnp.array([True])
    loss, per_obj = L.step_batch_loss(
        alpha, color, gt_depth, gt_color, sem, jnp.ones((1, n_rays), bool), z, active)
    # depth residual 0, color residual 0, opacity = 1 vs mask 1 -> ~0
    assert float(loss) < 1e-3


def test_step_batch_loss_inactive_no_grad():
    key = jax.random.PRNGKey(0)
    alpha, color, gt_depth, gt_color, sem, mask_depth, z = _mk_batch(key)
    active = jnp.array([True, True, False])

    def f(a):
        loss, _ = L.step_batch_loss(a, color, gt_depth, gt_color, sem,
                                    mask_depth, z, active)
        return loss

    g = np.asarray(jax.grad(f)(alpha))
    assert np.abs(g[2]).max() == 0.0  # inactive slot gets exactly zero grad
    assert np.abs(g[0]).max() > 0.0


def test_step_batch_loss_scalings():
    """Total = depth + 5*color + 10*opacity (loss.py:59 with config
    color_scaling / opacity_scaling)."""
    key = jax.random.PRNGKey(1)
    batch = _mk_batch(key, n_obj=2)
    active = jnp.array([True, True])
    _, base = L.step_batch_loss(*batch, active, color_scaling=0.0, opacity_scaling=0.0)
    _, with_c = L.step_batch_loss(*batch, active, color_scaling=1.0, opacity_scaling=0.0)
    _, with_o = L.step_batch_loss(*batch, active, color_scaling=0.0, opacity_scaling=1.0)
    _, full = L.step_batch_loss(*batch, active, color_scaling=5.0, opacity_scaling=10.0)
    c_term = np.asarray(with_c) - np.asarray(base)
    o_term = np.asarray(with_o) - np.asarray(base)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(base) + 5 * c_term + 10 * o_term, rtol=1e-5)


def test_step_batch_loss_matches_manual_composition():
    """Recompute the three terms by hand from the published formulas."""
    key = jax.random.PRNGKey(2)
    alpha, color, gt_depth, gt_color, sem, mask_depth, z = _mk_batch(key, n_obj=1)
    sem = sem.at[0, :2].set(0).at[0, 2].set(2)  # mix of states
    active = jnp.array([True])
    loss, _ = L.step_batch_loss(alpha, color, gt_depth, gt_color, sem, mask_depth, z, active)

    occ = 1 / (1 + np.exp(-np.asarray(alpha)))
    free = 1 - occ + 1e-10
    shifted = np.concatenate([np.ones_like(free[..., :1]), free[..., :-1]], -1)
    term = occ * np.cumprod(shifted, -1)
    rd = (term * np.asarray(z)).sum(-1)
    var = (term * (np.asarray(z) - rd[..., None]) ** 2).sum(-1)
    rc = (term[..., None] * np.asarray(color)).sum(-2)
    ro = term.sum(-1)
    m_obj = np.asarray(sem) != 0
    m_sem = np.asarray(sem) != 2
    m_do = m_obj & np.asarray(mask_depth)
    ld = (np.abs(rd - np.asarray(gt_depth)) * m_do / (np.sqrt(var) + 1e-4)).sum(-1) / (m_do.sum(-1) + 1e-10)
    lc = (np.abs(rc - np.asarray(gt_color)).sum(-1) * m_obj).sum(-1) / (m_obj.sum(-1) + 1e-10)
    lo = (np.abs(ro - m_obj.astype(np.float32)) * m_sem).sum(-1) / (m_sem.sum(-1) + 1e-10)
    expected = (ld + 5 * lc + 10 * lo).sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_termination_used_not_occupancy():
    # sanity link between modules: rr.occupancy_to_termination consumed above
    occ = jnp.array([[0.3, 0.3]])
    t = rr.occupancy_to_termination(occ)
    assert float(t[0, 1]) < float(t[0, 0])
