"""Run the fused train kernel body as plain JAX (fake refs) to hunt NaNs."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import vmap_tpu.kernels.train_step as ts
from tests.test_train_kernel import make_batch, CS, OSC
from vmap_tpu.core.bank import init_bank, activate_slot


class FakeRef:
    def __init__(self, a):
        self.a = np.array(a)

    def __getitem__(self, idx):
        return jnp.asarray(self.a[idx])

    def __setitem__(self, idx, val):
        self.a[idx] = np.asarray(val)

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def __jax_array__(self):
        return jnp.asarray(self.a)


class FakePl:
    @staticmethod
    def program_id(d):
        return FakePl._ids[d]

    @staticmethod
    def when(cond):
        def deco(f):
            if bool(cond):
                f()
        return deco

    BlockSpec = None


def main():
    G, h, cap, n_per, n_iter, S = 1, 16, 2, 200, 1, 5
    key = jax.random.PRNGKey(0)
    bank = init_bank(key, cap, hidden=h)
    for s in range(2):
        bank = activate_slot(bank, s, jax.random.fold_in(key, s),
                             2.0 + 0.5 * s, hidden=h)
    bank = bank.replace(step=jnp.where(bank.active, 3, 0).astype(jnp.int32))
    batch = make_batch(jax.random.fold_in(key, 7), cap, n_iter * n_per, S)

    prep_p = ts.prepare_params(bank.flat, bank.spec, G, True)
    prep_m = ts.prepare_params(bank.m, bank.spec, G, False)
    prep_v = ts.prepare_params(bank.v, bank.spec, G, False)
    b = ts._prepare_batch(batch, bank.scale, bank.active, bank.step,
                          n_iter, n_per, G)
    NC = b["n_chunks"]
    ng = b["ng"]

    kernel = ts._make_kernel(G, h, S, n_iter, NC, 0.0, 0.0, CS, OSC, False)
    shapes = ts.group_layout(G, h)
    NPn = len(ts.P_NAMES)

    # intercept: wrap jnp in the module? simpler: monkeypatch pl
    real_pl = ts.pl
    ts.pl = FakePl

    f32 = jnp.float32
    pin = [FakeRef(prep_p[n]) for n in ts.P_NAMES]
    min_ = [FakeRef(prep_m[n]) for n in ts.P_NAMES]
    vin = [FakeRef(prep_v[n]) for n in ts.P_NAMES]
    pout = [FakeRef(np.zeros((1,) + shapes[n], np.float32)) for n in ts.P_NAMES]
    mout = [FakeRef(np.zeros((1,) + shapes[n], np.float32)) for n in ts.P_NAMES]
    vout = [FakeRef(np.zeros((1,) + shapes[n], np.float32)) for n in ts.P_NAMES]
    loss_ref = FakeRef(np.zeros((1, ts.OG, 128), np.float32))
    gscr = [FakeRef(np.zeros(shapes[n], np.float32)) for n in ts.P_NAMES]

    for o in range(ng):
        for it in range(n_iter):
            for c in range(NC):
                FakePl._ids = {0: jnp.int32(o), 1: jnp.int32(it),
                               2: jnp.int32(c)}
                blk = o * n_iter * NC + it * NC + c
                refs = (
                    [FakeRef(prep_p[n][o:o + 1]) for n in ts.P_NAMES]
                    + [FakeRef(prep_m[n][o:o + 1]) for n in ts.P_NAMES]
                    + [FakeRef(prep_v[n][o:o + 1]) for n in ts.P_NAMES]
                    + [FakeRef(b["xs"][blk:blk + 1]),
                       FakeRef(b["z"][blk:blk + 1]),
                       FakeRef(b["dep"][blk:blk + 1]),
                       FakeRef(b["gtc"][blk:blk + 1]),
                       FakeRef(b["mo"][blk:blk + 1]),
                       FakeRef(b["ms"][blk:blk + 1]),
                       FakeRef(b["md"][blk:blk + 1]),
                       FakeRef(b["wmul"][o * n_iter + it:
                                         o * n_iter + it + 1])]
                    + pout + mout + vout + [loss_ref] + gscr)
                kernel(*refs)
                for k, n in enumerate(ts.P_NAMES):
                    gv = gscr[k].a
                    if np.isnan(gv).any() or np.isinf(gv).any():
                        bad = np.argwhere(~np.isfinite(gv))
                        print(f"o={o} it={it} c={c} grad {n} NONFINITE at",
                              bad[:5], gv[tuple(bad[0])])
                for k, n in enumerate(ts.P_NAMES):
                    mv = mout[k].a
                    if np.isnan(mv).any():
                        print(f"o={o} it={it} c={c} mout {n} NaN")
    ts.pl = real_pl
    print("done")


if __name__ == "__main__":
    main()
