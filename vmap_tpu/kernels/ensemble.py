"""Fused positional-encoding + occupancy-MLP field evaluation (Pallas).

The field query chain (embed -> 7 linear layers -> activations,
ops/embedding.py + ops/mlp.py) is the framework's dominant FLOP consumer:
training touches ~1.2k points per object per step, but *meshing* evaluates
up to 256^3 = 16.7M points per object (trainer.py:77-83 in the reference).
Under plain XLA each tiny layer round-trips activations through HBM; this
kernel keeps the whole chain in VMEM.

Layout: transposed "feature-major" form — features on sublanes, points on
lanes — so every matmul is [features, features] @ [features, TILE_M] with
both operands MXU-aligned:

    xs   = pts / scale                      [3, T]
    proj = dirs @ xs                        [21, T]
    emb_a = [xs; sin(pi 2^k proj), k<4]     [128, T]  (87 used, zero-padded)
    emb_b = [sin(pi 2^4 proj); sin(pi 2^5 proj)]  [128, T]  (42 used)
    h1 = relu(W_in emb_a + b)               [h, T]
    h2 = relu(W_mid1 h1 + b)
    h3 = relu(W_cat_h h2 + W_cat_x emb_a + b)     (skip-concat as a split
    h4 = relu(W_mid2 h3 + b)                       matmul — no concat op)
    alpha = (W_alpha h4 + b) * 10           [1, T]
    c  = relu(W_col_h h4 + W_col_x emb_b + b)
    color = sigmoid(W_out c + b)            [3, T]

Weight preprocessing (pad the 87/42-dim embedding inputs to 128 lanes,
split the concat layers) happens once per call at the JAX level.

The kernel runs per (object, point-tile) grid cell; per-object weights
(h=32: ~48 KB) stay resident in VMEM across the point tiles. Used by the
meshing/eval path; the training step keeps the XLA path (it is dispatch-
latency-bound, not FLOP-bound — see bench.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512
_EMB_PAD = 128  # both emb_a (87) and emb_b (42) pad to one lane tile


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def prepare_params(pe: dict, mlp: dict, scale, hidden: int) -> dict:
    """Standard stacked params ([O, ...] or unstacked) -> kernel operands.

    Works on a single object's params (adds the O axis) or a stacked bank.
    """
    stacked = pe["dirs"].ndim == 3
    def lead(a):
        return a if stacked else a[None]

    def padcols(w, used, to=_EMB_PAD):
        pad = [(0, 0)] * (w.ndim - 1) + [(0, to - used)]
        return jnp.pad(w, pad)

    h = hidden
    w_cat = lead(mlp["w_cat"])       # [O, h, h+87]
    w_col = lead(mlp["w_col"])       # [O, h, h+42]
    col2 = lambda b: lead(b)[..., :, None]  # bias [O, h] -> [O, h, 1]
    return {
        "dirs": lead(pe["dirs"]),                            # [O, 21, 3]
        "scale": jnp.reshape(jnp.asarray(scale, jnp.float32), (-1, 1)),
        "w_in": padcols(lead(mlp["w_in"]), 87),              # [O, h, 128]
        "b_in": col2(mlp["b_in"]),
        "w_mid1": lead(mlp["w_mid1"]), "b_mid1": col2(mlp["b_mid1"]),
        "w_cat_h": w_cat[..., :, :h],
        "w_cat_x": padcols(w_cat[..., :, h:], 87),
        "b_cat": col2(mlp["b_cat"]),
        "w_mid2": lead(mlp["w_mid2"]), "b_mid2": col2(mlp["b_mid2"]),
        "w_alpha": lead(mlp["w_alpha"]), "b_alpha": col2(mlp["b_alpha"]),
        "w_col_h": w_col[..., :, :h],
        "w_col_x": padcols(w_col[..., :, h:], 42),
        "b_col": col2(mlp["b_col"]),
        "w_out": lead(mlp["w_col_out"]), "b_out": col2(mlp["b_col_out"]),
    }


def _field_kernel(scale_ref, dirs_ref, w_in_ref, b_in_ref, w_mid1_ref,
                  b_mid1_ref, w_cat_h_ref, w_cat_x_ref, b_cat_ref,
                  w_mid2_ref, b_mid2_ref, w_alpha_ref, b_alpha_ref,
                  w_col_h_ref, b_col_h_ref, w_out_ref, b_out_ref,
                  w_col_x_ref,
                  pts_ref, alpha_ref, color_ref):
    f32 = jnp.float32
    xs = pts_ref[0] / scale_ref[0, 0]                     # [3, T]
    proj = jnp.dot(dirs_ref[0], xs, preferred_element_type=f32)  # [21, T]

    T = xs.shape[-1]
    pi = np.float32(np.pi)
    emb_a = jnp.concatenate(
        [xs] + [jnp.sin(proj * (pi * (2.0 ** k))) for k in range(4)]
        + [jnp.zeros((_EMB_PAD - 87, T), f32)], axis=0)
    emb_b = jnp.concatenate(
        [jnp.sin(proj * (pi * 16.0)), jnp.sin(proj * (pi * 32.0)),
         jnp.zeros((_EMB_PAD - 42, T), f32)], axis=0)

    def mm(w_ref, x):
        return jnp.dot(w_ref[0], x, preferred_element_type=f32)

    h1 = jax.nn.relu(mm(w_in_ref, emb_a) + b_in_ref[0])
    h2 = jax.nn.relu(mm(w_mid1_ref, h1) + b_mid1_ref[0])
    h3 = jax.nn.relu(mm(w_cat_h_ref, h2) + mm(w_cat_x_ref, emb_a)
                     + b_cat_ref[0])
    h4 = jax.nn.relu(mm(w_mid2_ref, h3) + b_mid2_ref[0])
    alpha_ref[0] = (mm(w_alpha_ref, h4) + b_alpha_ref[0]) * 10.0
    c = jax.nn.relu(mm(w_col_h_ref, h4) + mm(w_col_x_ref, emb_b)
                    + b_col_h_ref[0])
    color_ref[0] = jax.nn.sigmoid(mm(w_out_ref, c) + b_out_ref[0])


def fused_field_eval(prepared: dict, pts: jax.Array, hidden: int,
                     interpret: bool | None = None,
                     tile_m: int = TILE_M) -> tuple[jax.Array, jax.Array]:
    """Evaluate the field bank at ``pts`` [O, M, 3] -> (alpha [O, M],
    color [O, M, 3]). M is padded to the tile internally."""
    if interpret is None:
        interpret = _interpret_default()
    O, M, _ = pts.shape
    m_pad = (-M) % tile_m
    pts_t = jnp.swapaxes(pts, 1, 2).astype(jnp.float32)   # [O, 3, M]
    if m_pad:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, m_pad)))
    Mp = M + m_pad
    h = hidden

    def obj_block(shape):
        # per-object operand: same block for every m-tile (stays in VMEM)
        return pl.BlockSpec((1,) + shape, lambda o, i: (o, 0, 0),
                            memory_space=pltpu.VMEM)

    p = prepared
    grid = (O, Mp // tile_m)
    in_specs = [
        pl.BlockSpec((1, 1), lambda o, i: (o, 0), memory_space=pltpu.SMEM),
        obj_block((21, 3)),
        obj_block((h, _EMB_PAD)), obj_block((h, 1)),
        obj_block((h, h)), obj_block((h, 1)),
        obj_block((h, h)), obj_block((h, _EMB_PAD)), obj_block((h, 1)),
        obj_block((h, h)), obj_block((h, 1)),
        obj_block((1, h)), obj_block((1, 1)),
        obj_block((h, h)), obj_block((h, 1)),
        obj_block((3, h)), obj_block((3, 1)),
        obj_block((h, _EMB_PAD)),
        pl.BlockSpec((1, 3, tile_m), lambda o, i: (o, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, tile_m), lambda o, i: (o, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, tile_m), lambda o, i: (o, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((O, 1, Mp), jnp.float32),
        jax.ShapeDtypeStruct((O, 3, Mp), jnp.float32),
    ]
    alpha_t, color_t = pl.pallas_call(
        _field_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(p["scale"], p["dirs"], p["w_in"], p["b_in"], p["w_mid1"], p["b_mid1"],
      p["w_cat_h"], p["w_cat_x"], p["b_cat"], p["w_mid2"], p["b_mid2"],
      p["w_alpha"], p["b_alpha"], p["w_col_h"], p["b_col"], p["w_out"],
      p["b_out"], p["w_col_x"], pts_t)
    alpha = alpha_t[:, 0, :M]
    color = jnp.swapaxes(color_t[:, :, :M], 1, 2)
    return alpha, color


@partial(jax.jit, static_argnames=("hidden", "interpret"))
def fused_eval_single(pe: dict, mlp: dict, scale, pts: jax.Array,
                      hidden: int, interpret: bool | None = None):
    """Single-object convenience: pts [M, 3] -> (occupancy [M], color [M, 3]).
    Drop-in accelerator for the meshing field queries."""
    prepared = prepare_params(pe, mlp, scale, hidden)
    alpha, color = fused_field_eval(prepared, pts[None], hidden, interpret)
    return jax.nn.sigmoid(alpha[0]), color[0]
