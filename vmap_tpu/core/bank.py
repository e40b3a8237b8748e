"""Fixed-capacity stacked object bank + masked AdamW (flat storage).

This replaces the reference's functorch ensemble dance: instead of
re-stacking per-object nn.Modules into fresh tensors every time an object
appears (``combine_state_for_ensemble`` + optimiser ``add_param_group`` +
post-step write-back, reference utils.py:30-34, train.py:179-183,331-338),
all object fields live from the start in ``[capacity, ...]`` arrays with an
``active`` mask. Creating an object = activating a slot; no recompilation,
and Adam moments persist (the reference silently resets moments for the
whole ensemble on every new object).

Storage is FLAT: every per-object parameter (PE projection + 7 MLP layers)
packs into one ``[capacity, n_params]`` buffer, with Adam moments as two
more. Rationale: per-dispatch host overhead on TPU scales with the number
of donated buffers (~1.45 ms for 200 donated leaves vs 0.16 ms undonated on
the measured v5e frontend), and a dict-of-leaves bank costs ~160 donated
arrays per training step. Flat banks cut that to 6 per bank. ``BankSpec``
holds the static layout and (un)flattens to the standard dict pytrees the
ops layer consumes — pure reshape/slice, free under jit.

AdamW follows torch.optim.AdamW semantics (decoupled decay ``p *= 1-lr*wd``
before the Adam step, betas (0.9, 0.999), eps 1e-8, per-slot bias-correction
step counts), matching the reference optimiser (train.py:67). Inactive
slots receive exactly zero update (no decay, no moment drift).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import flax.struct
import jax
import jax.numpy as jnp

from vmap_tpu.ops import embedding, mlp


@dataclass(frozen=True)
class BankSpec:
    """Static layout of one object's parameters inside the flat buffer."""
    hidden: int
    names: tuple  # ((group, name, shape, offset, size), ...)
    n_params: int

    @staticmethod
    @lru_cache(maxsize=8)
    def create(hidden: int) -> "BankSpec":
        pe = embedding.init_pe_params()
        mlp_p = mlp.init_mlp_params(jax.random.PRNGKey(0), hidden)
        entries = []
        off = 0
        for group, tree in (("pe", pe), ("mlp", mlp_p)):
            for name in sorted(tree):
                shape = tuple(tree[name].shape)
                size = 1
                for s in shape:
                    size *= s
                entries.append((group, name, shape, off, size))
                off += size
        return BankSpec(hidden=hidden, names=tuple(entries), n_params=off)

    def flatten(self, pe: dict, mlp_p: dict) -> jax.Array:
        """Single object's (pe, mlp) dicts -> [n_params] vector."""
        groups = {"pe": pe, "mlp": mlp_p}
        parts = [groups[g][n].reshape(-1) for g, n, _, _, _ in self.names]
        return jnp.concatenate(parts)

    def unflatten(self, flat: jax.Array) -> tuple[dict, dict]:
        """[..., n_params] -> (pe, mlp) dicts with leading axes kept."""
        lead = flat.shape[:-1]
        pe, mlp_p = {}, {}
        for g, n, shape, off, size in self.names:
            leaf = flat[..., off:off + size].reshape(*lead, *shape)
            (pe if g == "pe" else mlp_p)[n] = leaf
        return pe, mlp_p


@flax.struct.dataclass
class BankState:
    """Stacked per-object state; 6 device buffers total."""
    flat: jax.Array    # [capacity, n_params] parameters
    m: jax.Array       # [capacity, n_params] Adam first moments
    v: jax.Array       # [capacity, n_params] Adam second moments
    step: jax.Array    # [capacity] int32 per-slot Adam step count
    active: jax.Array  # [capacity] bool
    scale: jax.Array   # [capacity] f32 PE coordinate scale per slot
    spec: BankSpec = flax.struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    # dict-pytree views (free reshapes at trace time)
    @property
    def pe(self) -> dict:
        return self.spec.unflatten(self.flat)[0]

    @property
    def mlp(self) -> dict:
        return self.spec.unflatten(self.flat)[1]

    def params_for(self, slot) -> tuple[dict, dict]:
        return self.spec.unflatten(self.flat[slot])


def _fresh_flat(key: jax.Array, spec: BankSpec) -> jax.Array:
    pe = embedding.init_pe_params(key)
    mlp_p = mlp.init_mlp_params(key, spec.hidden)
    return spec.flatten(pe, mlp_p)


def init_bank(key: jax.Array, capacity: int, hidden: int,
              default_scale: float = 2.0) -> BankState:
    spec = BankSpec.create(hidden)
    keys = jax.random.split(key, capacity)
    flat = jax.vmap(lambda k: _fresh_flat(k, spec))(keys)
    return BankState(
        flat=flat,
        m=jnp.zeros_like(flat), v=jnp.zeros_like(flat),
        step=jnp.zeros((capacity,), jnp.int32),
        active=jnp.zeros((capacity,), bool),
        scale=jnp.full((capacity,), default_scale, jnp.float32),
        spec=spec,
    )


def activate_slot(bank: BankState, slot: jax.Array | int, key: jax.Array,
                  scale: jax.Array | float, hidden: int | None = None) -> BankState:
    """Activate ``slot`` with freshly initialised params (jit-safe)."""
    fresh = _fresh_flat(key, bank.spec)
    return bank.replace(
        flat=bank.flat.at[slot].set(fresh),
        m=bank.m.at[slot].set(0.0),
        v=bank.v.at[slot].set(0.0),
        step=bank.step.at[slot].set(0),
        active=bank.active.at[slot].set(True),
        scale=bank.scale.at[slot].set(scale),
    )


def set_slot_params(bank: BankState, slot, pe: dict, mlp_p: dict) -> BankState:
    """Overwrite one slot's parameters from dict pytrees (checkpoint load)."""
    fresh = bank.spec.flatten(
        {k: jnp.asarray(v) for k, v in pe.items()},
        {k: jnp.asarray(v) for k, v in mlp_p.items()})
    return bank.replace(flat=bank.flat.at[slot].set(fresh))


def apply_adamw(bank: BankState, grads_flat: jax.Array, lr: float, wd: float,
                b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8) -> BankState:
    """Masked AdamW on the flat buffers (composable inside a jitted step)."""
    t = jnp.where(bank.active, bank.step + 1, bank.step)
    tb = jnp.maximum(t, 1).astype(bank.flat.dtype)[:, None]
    act = bank.active[:, None]
    g = grads_flat
    mn = b1 * bank.m + (1 - b1) * g
    vn = b2 * bank.v + (1 - b2) * g * g
    mhat = mn / (1 - b1 ** tb)
    vhat = vn / (1 - b2 ** tb)
    pn = bank.flat * (1 - lr * wd) - lr * mhat / (jnp.sqrt(vhat) + eps)
    return bank.replace(
        flat=jnp.where(act, pn, bank.flat),
        m=jnp.where(act, mn, bank.m),
        v=jnp.where(act, vn, bank.v),
        step=t,
    )


@partial(jax.jit, donate_argnums=(0,), static_argnames=("lr", "wd"))
def adamw_update(bank: BankState, grads_flat: jax.Array,
                 lr: float, wd: float) -> BankState:
    return apply_adamw(bank, grads_flat, lr, wd)
