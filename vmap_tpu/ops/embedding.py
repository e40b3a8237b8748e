"""Icosahedral-direction positional encoding.

Behavioural parity with the reference ``UniDirsEmbed``
(/root/reference/embedding.py:43-91): points are divided by a per-object
scale, projected onto 21 fixed icosahedral directions by a *trainable* 3->21
linear map (no bias), multiplied by frequency bands 2^0..2^max_deg, and passed
through sin(pi * .). The output is ``concat([x/scale (3), sin bands
(21*(max_deg+1))])`` giving 129 dims for max_deg=5, split 87/42 between the
density trunk and the colour head (/root/reference/trainer.py:16-17).

TPU-first notes: the encoding is a single [*, 3] @ [3, 21] matmul plus
elementwise ops, so it fuses trivially into the downstream MLP under XLA; the
stacked object axis is handled by ``jax.vmap`` over the params pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 21 unit directions derived from icosahedron symmetry (same constants as the
# reference's fixed projection matrix, /root/reference/embedding.py:51-73).
# These are used as the *initial* value of the trainable projection.
ICO_DIRS = np.array([
    [0.8506508, 0.0, 0.5257311],
    [0.809017, 0.5, 0.309017],
    [0.5257311, 0.8506508, 0.0],
    [1.0, 0.0, 0.0],
    [0.809017, 0.5, -0.309017],
    [0.8506508, 0.0, -0.5257311],
    [0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, -0.8506508],
    [0.5, 0.309017, -0.809017],
    [0.0, 1.0, 0.0],
    [-0.5257311, 0.8506508, 0.0],
    [-0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, 0.8506508],
    [-0.309017, 0.809017, 0.5],
    [0.309017, 0.809017, 0.5],
    [0.5, 0.309017, 0.809017],
    [0.5, -0.309017, 0.809017],
    [0.0, 0.0, 1.0],
    [-0.5, 0.309017, 0.809017],
    [-0.809017, 0.5, 0.309017],
    [-0.809017, 0.5, -0.309017],
], dtype=np.float32)

N_DIRS = 21


def embedding_sizes(max_deg: int = 5) -> tuple[int, int, int]:
    """(total, trunk, colour) embedding widths.

    Reference: trainer.py:16-17 — emb1 = 21*(3+1)+3 = 87 (x + first 4 bands),
    emb2 = 21*(max_deg+1)+3 - emb1 (last bands, colour head).
    """
    total = N_DIRS * (max_deg + 1) + 3
    emb1 = N_DIRS * 4 + 3
    return total, emb1, total - emb1


def init_pe_params(key: jax.Array | None = None) -> dict:
    """Trainable PE parameters. The projection matrix starts at the
    icosahedral directions (reference registers it as an nn.Linear weight that
    ends up in the optimiser, embedding.py:75-76 + train.py:160)."""
    del key  # deterministic init
    return {"dirs": jnp.asarray(ICO_DIRS)}  # [21, 3]


def embed(params: dict, x: jax.Array, scale: jax.Array, max_deg: int = 5) -> jax.Array:
    """Encode points ``x`` [..., 3] -> [..., 3 + 21*(max_deg+1)].

    Matches UniDirsEmbed.forward (embedding.py:82-91): band-major layout
    ``[x/scale, sin(pi*2^0*proj), ..., sin(pi*2^max_deg*proj)]``.
    """
    xs = x / scale
    proj = xs @ params["dirs"].T  # [..., 21]
    bands = 2.0 ** jnp.arange(max_deg + 1, dtype=proj.dtype)  # [B]
    # [..., B, 21] -> flatten band-major -> [..., B*21]
    pb = proj[..., None, :] * bands[:, None]
    sin = jnp.sin(pb * jnp.pi)
    sin = sin.reshape(*proj.shape[:-1], (max_deg + 1) * N_DIRS)
    return jnp.concatenate([xs, sin], axis=-1)
