"""Exactness tests for the merged object+background train-frame kernel.

The merged kernel (one pallas_call advancing the object bank's full frame
optimisation AND the background bank, one bg chunk per object iteration)
must reproduce the XLA reference step — embed -> mlp_apply ->
step_batch_loss -> jax.grad -> apply_adamw — for BOTH banks, including
bg-chunk padding (chunks-per-iteration padded to npair_obj) and gradient
accumulation across invocation boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train_kernel import LR, WD, make_batch, ref_frame
from vmap_tpu.core.bank import activate_slot, init_bank
from vmap_tpu.kernels.merged_step import fused_frame_merged, merge_applicable
from vmap_tpu.kernels.train_step import prepare_bank, unprepare_bank

pytestmark = pytest.mark.slow

CS, OSC = 5.0, 10.0


def _mk_bank(key, cap, h, n_active, seed0):
    bank = init_bank(key, cap, hidden=h)
    for s in range(n_active):
        bank = activate_slot(bank, s, jax.random.fold_in(key, seed0 + s),
                             2.0 + 0.5 * s, hidden=h)
    bank = bank.replace(
        flat=bank.flat * 0.3,
        m=jax.random.normal(jax.random.fold_in(key, seed0 + 90),
                            bank.m.shape) * 1e-4,
        v=jax.random.uniform(jax.random.fold_in(key, seed0 + 91),
                             bank.v.shape) * 1e-6,
        step=jnp.where(bank.active, 3, 0).astype(jnp.int32))
    return bank


def _check(new_bank, ref_bank, losses, ref_losses):
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_bank.flat),
                               np.asarray(ref_bank.flat),
                               rtol=2e-4, atol=2e-6)
    # moments: the merged program's different op surroundings shift XLA's
    # f32 reassociation slightly (measured: 0.01% of elements, <= 1e-6 abs)
    np.testing.assert_allclose(np.asarray(new_bank.m),
                               np.asarray(ref_bank.m), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(new_bank.v),
                               np.asarray(ref_bank.v), rtol=4e-4,
                               atol=1e-9)


@pytest.mark.parametrize("cap_o,n_per_b,n_iter", [
    (16, 200, 3),   # npair=2, bg 2 real chunks: boundary mid-invocation,
                    # accumulation crosses the invocation seam
    (16, 120, 3),   # npair=2, bg 1 real + 1 PAD chunk per iteration
    (8, 100, 2),    # npair=1: boundary every step (NCb=1)
])
def test_merged_matches_xla(cap_o, n_per_b, n_iter):
    G, h, n_per_o, S_o = 4, 32, 120, 10
    hb, S_b = 16, 5
    assert merge_applicable(cap_o, G, h, n_per_o, n_per_b, n_iter)
    key = jax.random.PRNGKey(0)
    bank_o = _mk_bank(key, cap_o, h, cap_o - 1, 0)
    bank_b = _mk_bank(jax.random.fold_in(key, 1), 1, hb, 1, 40)

    batch_o = make_batch(jax.random.fold_in(key, 7), cap_o,
                         n_iter * n_per_o, S_o)
    batch_b = make_batch(jax.random.fold_in(key, 8), 1,
                         n_iter * n_per_b, S_b)

    ref_o, ref_losses_o = ref_frame(bank_o, batch_o, n_iter, n_per_o)
    ref_b, ref_losses_b = ref_frame(bank_b, batch_b, n_iter, n_per_b)

    pb_o = prepare_bank(bank_o, G)
    pb_b = prepare_bank(bank_b, 1)
    pb_o, pb_b, losses_o, losses_b = fused_frame_merged(
        pb_o, batch_o, pb_b, batch_b, n_iter, n_per_o, n_per_b,
        lr=LR, wd=WD, color_scaling=CS, opacity_scaling=OSC,
        interpret=True)
    new_o = unprepare_bank(pb_o)
    new_b = unprepare_bank(pb_b)

    _check(new_o, ref_o, losses_o, ref_losses_o)
    _check(new_b, ref_b, losses_b, ref_losses_b)
    assert np.array_equal(np.asarray(new_o.step), np.asarray(ref_o.step))
    inact = ~np.asarray(bank_o.active)
    np.testing.assert_array_equal(np.asarray(new_o.flat)[inact],
                                  np.asarray(bank_o.flat)[inact])


def test_merge_applicable_gates():
    assert merge_applicable(104, 4, 32, 120, 1200, 20)      # product shape
    assert not merge_applicable(8, 4, 32, 120, 1200, 20)    # npair 1 < 10
    assert not merge_applicable(104, 4, 32, 200, 1200, 20)  # obj multichunk


def test_merged_integration_through_fused_step(monkeypatch):
    """ADVICE r2: the merged branch's integration (bg sampling, metrics
    wiring, step-count update through fused_step) — one Mapper frame with
    VMAP_MERGE_BG=1 must match the default two-kernel fused path."""
    from vmap_tpu.core.step import make_frame_step
    from tests.test_fused_mapper import tiny_cfg, synth_frame

    def run(merge):
        monkeypatch.setenv("VMAP_MERGE_BG", "1" if merge else "0")
        make_frame_step.cache_clear()   # env is read at trace time
        from vmap_tpu.core.mapper import Mapper
        m = Mapper(tiny_cfg(True))
        rng = np.random.default_rng(7)
        losses = [float(m.process_frame(synth_frame(fid, 64, 48, rng))["loss"])
                  for fid in range(2)]
        return m, losses

    try:
        m0, l0 = run(False)
        m1, l1 = run(True)
    finally:
        make_frame_step.cache_clear()   # don't leak the merged trace
    np.testing.assert_allclose(l1, l0, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(m1.bank_obj.flat),
                               np.asarray(m0.bank_obj.flat),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(m1.bank_bg.flat),
                               np.asarray(m0.bank_bg.flat),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(m1.bank_obj.step),
                                  np.asarray(m0.bank_obj.step))
    np.testing.assert_array_equal(np.asarray(m1.bank_bg.step),
                                  np.asarray(m0.bank_bg.step))
