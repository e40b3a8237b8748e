"""Exactness tests for the monolithic fused train-frame kernel.

The kernel (interpret mode on CPU) must reproduce the XLA reference step —
embed -> mlp_apply -> step_batch_loss -> jax.grad -> apply_adamw — on the
same batch, for both the grouped object configuration (G>1, single ray
chunk) and the chunked background configuration (G=1, multiple ray chunks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmap_tpu.core.bank import apply_adamw, init_bank, activate_slot
from vmap_tpu.kernels.train_step import fused_bank_frame
from vmap_tpu.ops import losses as L
from vmap_tpu.ops.embedding import embed
from vmap_tpu.ops.mlp import mlp_apply

pytestmark = pytest.mark.slow

LR, WD, CS, OSC = 1e-3, 0.013, 5.0, 10.0


def make_batch(key, cap, n_rays, S):
    ks = jax.random.split(key, 7)
    depth = jnp.where(
        jax.random.uniform(ks[0], (cap, n_rays)) < 0.15, 0.0,
        jax.random.uniform(ks[0], (cap, n_rays), minval=0.5, maxval=3.0))
    z = jnp.sort(jax.random.uniform(
        ks[1], (cap, n_rays, S), minval=0.1, maxval=3.5), axis=-1)
    dirs = jax.random.normal(ks[2], (cap, n_rays, 3)) * 0.3
    origins = jax.random.normal(ks[6], (cap, n_rays, 3)) * 0.1
    pts = origins[:, :, None, :] + z[..., None] * dirs[:, :, None, :]
    return {
        "rgb": jax.random.uniform(ks[3], (cap, n_rays, 3)),
        "depth": depth,
        "state": jax.random.randint(ks[4], (cap, n_rays), 0, 3),
        "valid": depth > 0,
        "z": z,
        "pts": pts,           # XLA reference path
        "origins": origins,   # fused kernel builds pts = o + z*d in-VMEM
        "dirs": dirs,
    }


def ref_frame(bank, batch, n_iter, n_per):
    """Reference: the XLA path of core/step.py distilled to one bank."""

    def slice_it(v, it):
        return jax.lax.dynamic_slice_in_dim(v, it * n_per, n_per, axis=1)

    def body(bank, it):
        sl = {k: slice_it(v, it) for k, v in batch.items()}

        def loss_fn(flat):
            pe, mlp_p = bank.spec.unflatten(flat)
            emb = jax.vmap(lambda p, x, s: embed(p, x, s))(
                pe, sl["pts"], bank.scale)
            alpha, color = jax.vmap(mlp_apply)(mlp_p, emb)
            total, per = L.step_batch_loss(
                alpha[..., 0], color, sl["depth"], sl["rgb"], sl["state"],
                sl["valid"], sl["z"], bank.active, CS, OSC)
            return total, per

        (_, per), g = jax.value_and_grad(loss_fn, has_aux=True)(bank.flat)
        bank = apply_adamw(bank, g, LR, WD)
        return bank, per

    bank, pers = jax.lax.scan(body, bank, jnp.arange(n_iter))
    return bank, pers.T


@pytest.mark.parametrize("G,h,cap,n_per,n_iter,S,n_active", [
    (4, 32, 8, 120, 3, 10, 7),    # object-bank shape (1 ray chunk)
    (1, 16, 2, 200, 2, 5, 2),     # background-like (2 ray chunks)
    (1, 256, 1, 96, 2, 4, 1),     # iMAP single-field shape (hidden 256)
    (1, 16, 1, 200, 2, 5, 1),     # wide ray tile (VMAP_RT=256, 1 chunk)
    (1, 16, 2, 512, 2, 5, 2),     # chunk-merge with NM>1 (NC=4, VMAP_CM=2
                                  # -> 2 merge groups per iteration)
])
def test_fused_matches_xla(G, h, cap, n_per, n_iter, S, n_active,
                           monkeypatch):
    if cap == 1 and h == 16:
        monkeypatch.setenv("VMAP_RT", "256")
    if n_per == 512:
        monkeypatch.setenv("VMAP_CM", "2")
    key = jax.random.PRNGKey(0)
    bank = init_bank(key, cap, hidden=h)
    for s in range(n_active):
        bank = activate_slot(bank, s, jax.random.fold_in(key, s),
                             2.0 + 0.5 * s, hidden=h)
    # non-trivial moments/steps so bias correction paths are exercised.
    # Scale weights down so occupancies stay unsaturated: at var ~ 0 the
    # 1/(sqrt(var)+1e-4) information weight amplifies f32 rounding-order
    # differences (scan vs non-scan XLA fusion shifts the loss by ~2% on
    # saturated data), which would make the comparison meaningless.
    bank = bank.replace(
        flat=bank.flat * 0.3,
        m=jax.random.normal(jax.random.fold_in(key, 90), bank.m.shape) * 1e-4,
        v=jax.random.uniform(jax.random.fold_in(key, 91), bank.v.shape) * 1e-6,
        step=jnp.where(bank.active, 3, 0).astype(jnp.int32),
    )
    batch = make_batch(jax.random.fold_in(key, 7), cap, n_iter * n_per, S)

    ref_bank, ref_losses = ref_frame(bank, batch, n_iter, n_per)
    new_bank, losses = fused_bank_frame(
        bank, batch, n_iter, n_per, G, lr=LR, wd=WD, color_scaling=CS,
        opacity_scaling=OSC, bf16=False, interpret=True)

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(ref_losses), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_bank.flat), np.asarray(ref_bank.flat),
        rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(new_bank.m), np.asarray(ref_bank.m), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(new_bank.v), np.asarray(ref_bank.v), rtol=2e-4, atol=1e-12)
    assert np.array_equal(np.asarray(new_bank.step), np.asarray(ref_bank.step))
    # inactive slots are bit-identical to their inputs
    inact = ~np.asarray(bank.active)
    np.testing.assert_array_equal(
        np.asarray(new_bank.flat)[inact], np.asarray(bank.flat)[inact])


def test_fast_math_kernels_accurate():
    """The polynomial sincos / exp2-bit sigmoid fast paths (VMAP_SINCOS=poly,
    VMAP_SIGMOID=fast) match the exact transcendentals to ~1e-6 abs — far
    below the kernel's own f32 tolerance vs the XLA reference."""
    from vmap_tpu.kernels.train_step import sigmoid_fast, sincos_pi_poly
    p = jnp.asarray(np.linspace(-7.5, 7.5, 200001), jnp.float32)
    s, c = sincos_pi_poly(p)
    np.testing.assert_allclose(np.asarray(s), np.sin(np.pi * np.asarray(p)),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.pi * np.asarray(p)),
                               atol=2e-6)
    x = jnp.asarray(np.linspace(-80.0, 80.0, 200001), jnp.float32)
    got = sigmoid_fast(x)
    ref = 1.0 / (1.0 + np.exp(-np.asarray(x, np.float64)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-7)


def test_fused_fast_math_matches_xla(monkeypatch):
    """Full-kernel exactness with the fast-math knobs ON (the TPU default
    when enabled): object-bank shape, poly sincos + fast sigmoid."""
    monkeypatch.setenv("VMAP_SINCOS", "poly")
    monkeypatch.setenv("VMAP_SIGMOID", "fast")
    test_fused_matches_xla(4, 32, 8, 120, 3, 10, 7, monkeypatch)


def test_fused_exact_sincos_matches_xla(monkeypatch):
    """The exact-transcendental ladder seed (VMAP_SINCOS=exact) stays
    covered now that the default is the polynomial pair."""
    monkeypatch.setenv("VMAP_SINCOS", "exact")
    test_fused_matches_xla(4, 32, 8, 120, 3, 10, 7, monkeypatch)


def test_fused_render_packed_matches_xla(monkeypatch):
    """Full-kernel exactness with the packed render path (VMAP_RENDER=
    packed): stacked sigmoid / lane_sum / loss row-reduce / bcast rows —
    elementwise-equal restacking, so results are bit-compatible."""
    monkeypatch.setenv("VMAP_RENDER", "packed")
    test_fused_matches_xla(4, 32, 8, 120, 3, 10, 7, monkeypatch)
    # chunk-merged background-bank shape too
    test_fused_matches_xla(1, 16, 2, 512, 2, 5, 2, monkeypatch)


def test_fused_adam_block_matches_xla(monkeypatch):
    """Full-kernel exactness with the whole-block AdamW path (VMAP_ADAM=
    block): one [RW, CW] update per subgroup instead of 10 per-tensor
    views; bias correction row-vectors sliced from the full-height dot."""
    monkeypatch.setenv("VMAP_ADAM", "block")
    test_fused_matches_xla(4, 32, 8, 120, 3, 10, 7, monkeypatch)
    # and on the chunk-merged background-bank shape (G=1, shared adam)
    test_fused_matches_xla(1, 16, 2, 512, 2, 5, 2, monkeypatch)
