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
(h=32: ~48 KB) stay resident in VMEM across the point tiles.

Where each path wins (measured on v5e, readback-synced):
  * meshing/eval (millions of points, forward only): this kernel is 1.77x
    the XLA path — the win is keeping 7 layers of activations in VMEM.
  * the online train step (1.2k points/object/iteration, 20 iterations
    under lax.scan): within noise of the XLA path (~55-63 ms/frame both) —
    the step is op-latency-chain-bound, and neither per-cell grouping nor
    rematerialisation helps (docs/round_notes.md). The exact hand-derived
    VJP (``fused_field_train``, ``StepStatics.use_pallas_train``, default
    False) is the tested building block for the planned monolithic
    train-iteration kernel.
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


def _make_fwd_kernel(G: int):
    """Forward kernel processing G objects per grid cell (static unroll):
    amortises per-cell launch/DMA overhead across the group."""

    def kernel(dirs_ref, w_in_ref, b_in_ref, w_mid1_ref,
               b_mid1_ref, w_cat_h_ref, w_cat_x_ref, b_cat_ref,
               w_mid2_ref, b_mid2_ref, w_alpha_ref, b_alpha_ref,
               w_col_h_ref, b_col_h_ref, w_out_ref, b_out_ref,
               w_col_x_ref,
               pts_ref, alpha_ref, color_ref):
        f32 = jnp.float32
        pi = np.float32(np.pi)
        for g in range(G):
            xs = pts_ref[g]                     # [3, T], pre-divided by scale
            proj = jnp.dot(dirs_ref[g], xs, preferred_element_type=f32)
            T = xs.shape[-1]
            emb_a = jnp.concatenate(
                [xs] + [jnp.sin(proj * (pi * (2.0 ** k))) for k in range(4)]
                + [jnp.zeros((_EMB_PAD - 87, T), f32)], axis=0)
            emb_b = jnp.concatenate(
                [jnp.sin(proj * (pi * 16.0)), jnp.sin(proj * (pi * 32.0)),
                 jnp.zeros((_EMB_PAD - 42, T), f32)], axis=0)

            def mm(w_ref, x, g=g):
                return jnp.dot(w_ref[g], x, preferred_element_type=f32)

            h1 = jax.nn.relu(mm(w_in_ref, emb_a) + b_in_ref[g])
            h2 = jax.nn.relu(mm(w_mid1_ref, h1) + b_mid1_ref[g])
            h3 = jax.nn.relu(mm(w_cat_h_ref, h2) + mm(w_cat_x_ref, emb_a)
                             + b_cat_ref[g])
            h4 = jax.nn.relu(mm(w_mid2_ref, h3) + b_mid2_ref[g])
            alpha_ref[g] = (mm(w_alpha_ref, h4) + b_alpha_ref[g]) * 10.0
            c = jax.nn.relu(mm(w_col_h_ref, h4) + mm(w_col_x_ref, emb_b)
                            + b_col_h_ref[g])
            color_ref[g] = jax.nn.sigmoid(mm(w_out_ref, c) + b_out_ref[g])

    return kernel


def pick_group(n_obj: int, hidden: int, cap_bytes: int = 1 << 20) -> int:
    """Group size for multi-object grid cells. The kernels support G > 1
    (static unroll amortising per-cell overhead), but measured end-to-end on
    v5e a G=8 group ran ~15% SLOWER than G=1 at the vMAP train shapes and
    G=20 overwhelmed the Mosaic compiler — per-cell launch overhead is not
    the bottleneck there. Default is therefore 1; pass ``group`` explicitly
    to the kernel entry points to re-explore."""
    del n_obj, hidden, cap_bytes
    return 1


def fused_field_eval(prepared: dict, pts: jax.Array, hidden: int,
                     interpret: bool | None = None,
                     tile_m: int = TILE_M) -> tuple[jax.Array, jax.Array]:
    """Evaluate the field bank at ``pts`` [O, M, 3] -> (alpha [O, M],
    color [O, M, 3]). M is padded to the tile internally."""
    if interpret is None:
        interpret = _interpret_default()
    O, M, _ = pts.shape
    xs = pts / prepared["scale"][:, :, None]  # scale applied outside the kernel
    pts_t = _pad_m(jnp.swapaxes(xs, 1, 2).astype(jnp.float32), tile_m)
    alpha_t, color_t = _run_fwd(prepared, pts_t, hidden, pts_t.shape[-1],
                                interpret, tile_m)
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


# ======================================================================== #
# Training path: fused forward + hand-derived backward (custom VJP).
# The backward kernel recomputes the forward activations in VMEM (cheap —
# the whole chain lives on-chip) and accumulates per-object weight grads
# across point tiles via the sequential TPU grid (same output block revisited
# for every m-tile of an object).
# ======================================================================== #

_PI = np.float32(np.pi)


def _recompute_fwd(dirs, p, xs):
    """Shared forward recompute used by the backward kernel. ``p`` maps
    name -> loaded [.,.] weight value. Returns every activation needed."""
    f32 = jnp.float32
    proj = jnp.dot(dirs, xs, preferred_element_type=f32)
    T = xs.shape[-1]
    emb_a = jnp.concatenate(
        [xs] + [jnp.sin(proj * (_PI * (2.0 ** k))) for k in range(4)]
        + [jnp.zeros((_EMB_PAD - 87, T), f32)], axis=0)
    emb_b = jnp.concatenate(
        [jnp.sin(proj * (_PI * 16.0)), jnp.sin(proj * (_PI * 32.0)),
         jnp.zeros((_EMB_PAD - 42, T), f32)], axis=0)

    def mm(w, x):
        return jnp.dot(w, x, preferred_element_type=f32)

    h1 = jax.nn.relu(mm(p["w_in"], emb_a) + p["b_in"])
    h2 = jax.nn.relu(mm(p["w_mid1"], h1) + p["b_mid1"])
    h3 = jax.nn.relu(mm(p["w_cat_h"], h2) + mm(p["w_cat_x"], emb_a) + p["b_cat"])
    h4 = jax.nn.relu(mm(p["w_mid2"], h3) + p["b_mid2"])
    c = jax.nn.relu(mm(p["w_col_h"], h4) + mm(p["w_col_x"], emb_b) + p["b_col"])
    logits = mm(p["w_out"], c) + p["b_out"]
    return proj, emb_a, emb_b, h1, h2, h3, h4, c, logits


_W_NAMES = ["dirs", "w_in", "b_in", "w_mid1", "b_mid1", "w_cat_h", "w_cat_x",
            "b_cat", "w_mid2", "b_mid2", "w_alpha", "b_alpha", "w_col_h",
            "b_col", "w_out", "b_out", "w_col_x"]


def _make_bwd_kernel(G: int):
    """Backward kernel processing G objects per grid cell, accumulating
    per-object weight grads across the (sequential) m-tile grid axis."""

    def kernel(*refs):
        n_w = len(_W_NAMES)
        w_refs = dict(zip(_W_NAMES, refs[:n_w]))
        pts_ref, ga_ref, gc_ref = refs[n_w: 3 + n_w]
        out_refs = dict(zip(_W_NAMES, refs[3 + n_w:]))
        f32 = jnp.float32
        first = pl.program_id(1) == 0

        for gi in range(G):
            xs = pts_ref[gi]  # pre-divided by scale
            p = {k: w_refs[k][gi] for k in _W_NAMES}
            proj, emb_a, emb_b, h1, h2, h3, h4, c, logits = _recompute_fwd(
                p["dirs"], p, xs)

            def mm(a, b):
                return jnp.dot(a, b, preferred_element_type=f32)

            sig = jax.nn.sigmoid(logits)
            d_logits = gc_ref[gi] * sig * (1.0 - sig)          # [3, T]
            da_pre = ga_ref[gi] * 10.0                          # [1, T]

            g = {}
            g["w_out"] = mm(d_logits, c.T)
            g["b_out"] = jnp.sum(d_logits, axis=1, keepdims=True)
            dc = mm(p["w_out"].T, d_logits) * (c > 0)
            g["w_col_h"] = mm(dc, h4.T)
            g["w_col_x"] = mm(dc, emb_b.T)
            g["b_col"] = jnp.sum(dc, axis=1, keepdims=True)
            g["w_alpha"] = mm(da_pre, h4.T)
            g["b_alpha"] = jnp.sum(da_pre, axis=1, keepdims=True)
            dh4 = (mm(p["w_col_h"].T, dc) + mm(p["w_alpha"].T, da_pre)) * (h4 > 0)
            g["w_mid2"] = mm(dh4, h3.T)
            g["b_mid2"] = jnp.sum(dh4, axis=1, keepdims=True)
            dh3 = mm(p["w_mid2"].T, dh4) * (h3 > 0)
            g["w_cat_h"] = mm(dh3, h2.T)
            g["w_cat_x"] = mm(dh3, emb_a.T)
            g["b_cat"] = jnp.sum(dh3, axis=1, keepdims=True)
            dh2 = mm(p["w_cat_h"].T, dh3) * (h2 > 0)
            g["w_mid1"] = mm(dh2, h1.T)
            g["b_mid1"] = jnp.sum(dh2, axis=1, keepdims=True)
            dh1 = mm(p["w_mid1"].T, dh2) * (h1 > 0)
            g["w_in"] = mm(dh1, emb_a.T)
            g["b_in"] = jnp.sum(dh1, axis=1, keepdims=True)

            demb_a = mm(p["w_in"].T, dh1) + mm(p["w_cat_x"].T, dh3)   # [128, T]
            demb_b = mm(p["w_col_x"].T, dc)                            # [128, T]
            dproj = jnp.zeros_like(proj)
            for k in range(4):
                f = _PI * (2.0 ** k)
                dproj = dproj + f * jnp.cos(proj * f) * demb_a[3 + 21 * k: 3 + 21 * (k + 1)]
            dproj = dproj + (_PI * 16.0) * jnp.cos(proj * (_PI * 16.0)) * demb_b[0:21]
            dproj = dproj + (_PI * 32.0) * jnp.cos(proj * (_PI * 32.0)) * demb_b[21:42]
            g["dirs"] = mm(dproj, xs.T)                                # [21, 3]

            for name in _W_NAMES:

                @pl.when(first)
                def _(name=name, gi=gi, g=g):
                    out_refs[name][gi] = g[name]

                @pl.when(jnp.logical_not(first))
                def _(name=name, gi=gi, g=g):
                    out_refs[name][gi] = out_refs[name][gi] + g[name]

    return kernel


def _run_fwd(prepared, pts_t, hidden, Mp, interpret, tile_m, group=None):
    O = pts_t.shape[0]
    h = hidden
    p = prepared
    G = group or pick_group(O, h)

    def obj_block(shape):
        # per-group operand: same block for every m-tile (stays in VMEM)
        return pl.BlockSpec((G,) + shape, lambda o, i: (o, 0, 0),
                            memory_space=pltpu.VMEM)

    grid = (O // G, Mp // tile_m)
    in_specs = [
        obj_block((21, 3)),
        obj_block((h, _EMB_PAD)), obj_block((h, 1)),
        obj_block((h, h)), obj_block((h, 1)),
        obj_block((h, h)), obj_block((h, _EMB_PAD)), obj_block((h, 1)),
        obj_block((h, h)), obj_block((h, 1)),
        obj_block((1, h)), obj_block((1, 1)),
        obj_block((h, h)), obj_block((h, 1)),
        obj_block((3, h)), obj_block((3, 1)),
        obj_block((h, _EMB_PAD)),
        pl.BlockSpec((G, 3, tile_m), lambda o, i: (o, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((G, 1, tile_m), lambda o, i: (o, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 3, tile_m), lambda o, i: (o, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((O, 1, Mp), jnp.float32),
        jax.ShapeDtypeStruct((O, 3, Mp), jnp.float32),
    ]
    return pl.pallas_call(
        _make_fwd_kernel(G), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(p["dirs"], p["w_in"], p["b_in"], p["w_mid1"], p["b_mid1"],
      p["w_cat_h"], p["w_cat_x"], p["b_cat"], p["w_mid2"], p["b_mid2"],
      p["w_alpha"], p["b_alpha"], p["w_col_h"], p["b_col"], p["w_out"],
      p["b_out"], p["w_col_x"], pts_t)

def _pad_m(x, tile_m):
    m_pad = (-x.shape[-1]) % tile_m
    if m_pad:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, m_pad)]
        x = jnp.pad(x, pad)
    return x


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_field_train(prepared: dict, pts: jax.Array, hidden: int,
                      interpret: bool, tile_m: int = TILE_M):
    """Differentiable fused field forward: (alpha [O, M], color [O, M, 3]).
    Gradients flow to every prepared weight (incl. the PE projection);
    points and scale get zero cotangents (they are data/buffers, matching
    the reference where only module parameters train)."""
    out, _ = _fused_train_fwd(prepared, pts, hidden, interpret, tile_m)
    return out


def _fused_train_fwd(prepared, pts, hidden, interpret, tile_m):
    O, M, _ = pts.shape
    xs = pts / prepared["scale"][:, :, None]
    pts_t = _pad_m(jnp.swapaxes(xs, 1, 2).astype(jnp.float32), tile_m)
    alpha_t, color_t = _run_fwd(prepared, pts_t, hidden, pts_t.shape[-1],
                                interpret, tile_m)
    alpha = alpha_t[:, 0, :M]
    color = jnp.swapaxes(color_t[:, :, :M], 1, 2)
    return (alpha, color), (prepared, pts)


def _fused_train_bwd(hidden, interpret, tile_m, res, cot):
    prepared, pts = res
    g_alpha, g_color = cot
    O, M, _ = pts.shape
    h = hidden
    xs = pts / prepared["scale"][:, :, None]
    pts_t = _pad_m(jnp.swapaxes(xs, 1, 2).astype(jnp.float32), tile_m)
    Mp = pts_t.shape[-1]
    ga_t = _pad_m(g_alpha[:, None, :].astype(jnp.float32), tile_m)
    gc_t = _pad_m(jnp.swapaxes(g_color, 1, 2).astype(jnp.float32), tile_m)

    G = pick_group(O, h)

    def obj_block(shape, mem=pltpu.VMEM):
        return pl.BlockSpec((G,) + shape, lambda o, i: (o, 0, 0),
                            memory_space=mem)

    shapes = {
        "dirs": (21, 3),
        "w_in": (h, _EMB_PAD), "b_in": (h, 1),
        "w_mid1": (h, h), "b_mid1": (h, 1),
        "w_cat_h": (h, h), "w_cat_x": (h, _EMB_PAD), "b_cat": (h, 1),
        "w_mid2": (h, h), "b_mid2": (h, 1),
        "w_alpha": (1, h), "b_alpha": (1, 1),
        "w_col_h": (h, h), "b_col": (h, 1),
        "w_out": (3, h), "b_out": (3, 1),
        "w_col_x": (h, _EMB_PAD),
    }
    grid = (O // G, Mp // tile_m)
    in_specs = (
        [obj_block(shapes[n]) for n in _W_NAMES]
        + [pl.BlockSpec((G, 3, tile_m), lambda o, i: (o, 0, i),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((G, 1, tile_m), lambda o, i: (o, 0, i),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((G, 3, tile_m), lambda o, i: (o, 0, i),
                        memory_space=pltpu.VMEM)]
    )
    out_specs = [obj_block(shapes[n]) for n in _W_NAMES]
    out_shape = [jax.ShapeDtypeStruct((O,) + shapes[n], jnp.float32)
                 for n in _W_NAMES]
    grads = pl.pallas_call(
        _make_bwd_kernel(G), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(*[prepared[n] for n in _W_NAMES], pts_t, ga_t, gc_t)
    d_prepared = dict(zip(_W_NAMES, grads))
    d_prepared["scale"] = jnp.zeros_like(prepared["scale"])
    return d_prepared, jnp.zeros_like(pts)


fused_field_train.defvjp(_fused_train_fwd, _fused_train_bwd)
