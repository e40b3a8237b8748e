"""Tiny occupancy-field MLP (the per-object neural field).

Architecture parity with the reference ``OccupancyMap``
(/root/reference/model.py:16-85):

    trunk:  Linear(emb1 -> h) + ReLU
            Linear(h -> h) + ReLU                      (mid1)
            Linear(h + emb1 -> h) + ReLU               (cat skip of emb trunk)
            Linear(h -> h) + ReLU                      (mid2)
    alpha:  Linear(h -> 1) * 10                        (UniSURF raw scale)
    colour: Linear(h + emb2 -> h) + ReLU
            Linear(h -> 3) -> sigmoid

emb1 = 87 (x + first 4 PE bands), emb2 = 42 (last 2 bands), h = 32 for
objects / 128 for background / 256 for iMAP.

Weights use Xavier-normal init, biases the torch Linear default
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (model.py:4-6 applies xavier to weights
only). Params are plain dicts so a stacked object bank is just the same
pytree with a leading [n_obj] axis (built via ``jax.vmap(init_mlp_params)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> tuple[jax.Array, jax.Array]:
    kw, kb = jax.random.split(key)
    std = (2.0 / (fan_in + fan_out)) ** 0.5  # xavier normal
    w = jax.random.normal(kw, (fan_out, fan_in), dtype=jnp.float32) * std
    bound = 1.0 / (fan_in ** 0.5)
    b = jax.random.uniform(kb, (fan_out,), dtype=jnp.float32, minval=-bound, maxval=bound)
    return w, b


def init_mlp_params(key: jax.Array, hidden: int, emb1: int = 87, emb2: int = 42) -> dict:
    keys = jax.random.split(key, 7)
    names = ["in", "mid1", "cat", "mid2", "alpha", "col", "col_out"]
    fans = [
        (emb1, hidden),
        (hidden, hidden),
        (hidden + emb1, hidden),
        (hidden, hidden),
        (hidden, 1),
        (hidden + emb2, hidden),
        (hidden, 3),
    ]
    p = {}
    for k, name, (fi, fo) in zip(keys, names, fans):
        w, b = _linear_init(k, fi, fo)
        p[f"w_{name}"] = w
        p[f"b_{name}"] = b
    return p


def mlp_apply(
    params: dict,
    emb: jax.Array,
    emb1: int = 87,
    do_alpha: bool = True,
    do_color: bool = True,
    compute_dtype=None,
) -> tuple[jax.Array | None, jax.Array | None]:
    """Forward pass. ``emb`` [..., emb1+emb2] -> (alpha [..., 1], color [..., 3]).

    ``compute_dtype`` (e.g. jnp.bfloat16) casts activations/weights for MXU
    throughput; outputs are returned in float32.
    """
    x1 = emb[..., :emb1]
    x2 = emb[..., emb1:]
    p = params
    if compute_dtype is not None:
        p = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x1 = x1.astype(compute_dtype)
        x2 = x2.astype(compute_dtype)

    def lin(name, x):
        return x @ p[f"w_{name}"].T + p[f"b_{name}"]

    h = jax.nn.relu(lin("in", x1))
    h = jax.nn.relu(lin("mid1", h))
    h = jax.nn.relu(lin("cat", jnp.concatenate([h, x1], axis=-1)))
    h4 = jax.nn.relu(lin("mid2", h))

    alpha = None
    if do_alpha:
        alpha = (lin("alpha", h4) * 10.0).astype(jnp.float32)  # unisurf scale, model.py:77

    color = None
    if do_color:
        c = jax.nn.relu(lin("col", jnp.concatenate([h4, x2], axis=-1)))
        color = jax.nn.sigmoid(lin("col_out", c).astype(jnp.float32))
    return alpha, color


def count_params(hidden: int, emb1: int = 87, emb2: int = 42) -> int:
    sizes = [
        (emb1, hidden), (hidden, hidden), (hidden + emb1, hidden), (hidden, hidden),
        (hidden, 1), (hidden + emb2, hidden), (hidden, 3),
    ]
    return sum(fi * fo + fo for fi, fo in sizes)
