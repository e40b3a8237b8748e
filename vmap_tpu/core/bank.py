"""Fixed-capacity stacked object bank + masked AdamW.

This replaces the reference's functorch ensemble dance: instead of
re-stacking per-object nn.Modules into fresh tensors every time an object
appears (``combine_state_for_ensemble`` + optimiser ``add_param_group`` +
post-step write-back, reference utils.py:30-34, train.py:179-183,331-338),
all object fields live from the start in ``[capacity, ...]`` arrays with an
``active`` mask. Creating an object = activating a slot; no recompilation,
and Adam moments persist (the reference silently resets moments for the
whole ensemble on every new object).

AdamW follows torch.optim.AdamW semantics (decoupled decay applied as
``p *= 1 - lr*wd`` before the Adam step, betas (0.9, 0.999), eps 1e-8,
per-slot bias-correction step counts) so training dynamics match the
reference optimiser (train.py:67: AdamW(lr=1e-3, weight_decay=0.013)).
Inactive slots receive exactly zero update (no decay, no moment drift).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from vmap_tpu.ops import embedding, mlp


@flax.struct.dataclass
class BankState:
    """Stacked per-object state. Every leaf has leading dim = capacity."""
    pe: dict          # positional-encoding params (trainable dirs)
    mlp: dict         # occupancy MLP params
    m_pe: dict        # Adam first moments
    v_pe: dict        # Adam second moments
    m_mlp: dict
    v_mlp: dict
    step: jax.Array   # [capacity] int32, per-slot Adam step count
    active: jax.Array  # [capacity] bool
    scale: jax.Array  # [capacity] f32, PE coordinate scale per slot

    @property
    def capacity(self) -> int:
        return self.active.shape[0]


def init_bank(key: jax.Array, capacity: int, hidden: int,
              default_scale: float = 2.0) -> BankState:
    keys = jax.random.split(key, capacity)
    stacked_mlp = jax.vmap(lambda k: mlp.init_mlp_params(k, hidden))(keys)
    stacked_pe = jax.vmap(lambda k: embedding.init_pe_params(k))(keys)
    zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)  # noqa: E731
    return BankState(
        pe=stacked_pe,
        mlp=stacked_mlp,
        m_pe=zeros_like(stacked_pe), v_pe=zeros_like(stacked_pe),
        m_mlp=zeros_like(stacked_mlp), v_mlp=zeros_like(stacked_mlp),
        step=jnp.zeros((capacity,), jnp.int32),
        active=jnp.zeros((capacity,), bool),
        scale=jnp.full((capacity,), default_scale, jnp.float32),
    )


def activate_slot(bank: BankState, slot: jax.Array | int, key: jax.Array,
                  scale: jax.Array | float, hidden: int) -> BankState:
    """Activate ``slot`` with freshly initialised params (jit-safe)."""
    fresh_mlp = mlp.init_mlp_params(key, hidden)
    fresh_pe = embedding.init_pe_params(key)
    set_at = lambda bank_t, fresh_t: jax.tree.map(  # noqa: E731
        lambda b, f: b.at[slot].set(f.astype(b.dtype)), bank_t, fresh_t)
    zero_at = lambda t: jax.tree.map(lambda b: b.at[slot].set(0), t)  # noqa: E731
    return bank.replace(
        pe=set_at(bank.pe, fresh_pe),
        mlp=set_at(bank.mlp, fresh_mlp),
        m_pe=zero_at(bank.m_pe), v_pe=zero_at(bank.v_pe),
        m_mlp=zero_at(bank.m_mlp), v_mlp=zero_at(bank.v_mlp),
        step=bank.step.at[slot].set(0),
        active=bank.active.at[slot].set(True),
        scale=bank.scale.at[slot].set(scale),
    )


def _bcast(v: jax.Array, leaf: jax.Array) -> jax.Array:
    """Broadcast a [capacity] vector against a [capacity, ...] leaf."""
    return v.reshape(v.shape + (1,) * (leaf.ndim - 1))


def _adamw_tree(params: dict, grads: dict, m: dict, v: dict,
                active: jax.Array, t: jax.Array,
                lr: float, wd: float,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Masked AdamW over one stacked pytree; returns (params, m, v)."""
    new_p, new_m, new_v = {}, {}, {}
    for name, p in params.items():
        g = grads[name]
        act = _bcast(active, p)
        tb = _bcast(t, p).astype(p.dtype)
        mn = b1 * m[name] + (1 - b1) * g
        vn = b2 * v[name] + (1 - b2) * g * g
        mhat = mn / (1 - b1 ** tb)
        vhat = vn / (1 - b2 ** tb)
        pn = p * (1 - lr * wd) - lr * mhat / (jnp.sqrt(vhat) + eps)
        new_p[name] = jnp.where(act, pn, p)
        new_m[name] = jnp.where(act, mn, m[name])
        new_v[name] = jnp.where(act, vn, v[name])
    return new_p, new_m, new_v


@partial(jax.jit, donate_argnums=(0,), static_argnames=("lr", "wd"))
def adamw_update(bank: BankState, grads_pe: dict, grads_mlp: dict,
                 lr: float, wd: float) -> BankState:
    return apply_adamw(bank, grads_pe, grads_mlp, lr, wd)


def apply_adamw(bank: BankState, grads_pe: dict, grads_mlp: dict,
                lr: float, wd: float) -> BankState:
    """Non-jitted body (composable inside a larger jitted step)."""
    t = jnp.where(bank.active, bank.step + 1, bank.step)
    t_safe = jnp.maximum(t, 1)
    pe, m_pe, v_pe = _adamw_tree(bank.pe, grads_pe, bank.m_pe, bank.v_pe,
                                 bank.active, t_safe, lr, wd)
    mlp_p, m_mlp, v_mlp = _adamw_tree(bank.mlp, grads_mlp, bank.m_mlp,
                                      bank.v_mlp, bank.active, t_safe, lr, wd)
    return bank.replace(pe=pe, mlp=mlp_p, m_pe=m_pe, v_pe=v_pe,
                        m_mlp=m_mlp, v_mlp=v_mlp, step=t)
