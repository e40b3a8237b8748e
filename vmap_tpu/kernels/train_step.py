"""Monolithic fused train-frame Pallas kernel.

One ``pallas_call`` runs the ENTIRE per-frame optimisation of a bank —
every iteration of: positional encoding -> occupancy-MLP forward -> volume
render -> masked losses -> hand-derived backward -> masked AdamW — with the
parameters and Adam moments resident in VMEM across iterations. This is the
TPU answer to the reference's hot loop (/root/reference/train.py:270-326),
replacing ~50 dependent XLA ops x 20 sequential iterations (measured
op-latency-chain-bound at ~29 ms/frame for the object bank in round 1) with
one kernel launch.

MXU utilisation comes from *object blocking*: G objects of hidden size h are
packed into block-diagonal [G*h, G*h] weight tiles, and the G objects'
(distinct) sample points share the lane (column) axis index space. A column
c then carries all G objects' point-c activations in disjoint sublane
blocks, so one dense [128, 128] @ [128, T] matmul advances G=128/h objects
at once with zero cross-talk (the off-diagonal blocks are structurally zero
and their gradients are masked before Adam). For h=32 this packs 4 objects
per MXU tile — recovering the 4x tile waste that capped the round-1 XLA
path at ~5.5 TF/s effective.

Grid: (n_groups, n_iter, n_chunks). Iterations advance sequentially per
group (TPU grids are sequential), parameters/moments live in VMEM blocks
with a group-constant index map, and the per-iteration ray batch streams in
as pipelined [*, S*128] tiles. Chunks (>1 only for the wide background
bank) split each iteration's rays into 128-ray tiles with gradients
accumulated in VMEM scratch; AdamW runs on the last chunk.

Layout glossary (see ``GroupLayout``):
  * xs rows: 3 coords x G objects (pre-divided by per-object scale).
  * PE projection: block-diagonal ``dirs`` [24G, 3G]; rows 24g..24g+20 hold
    object g's trainable 21-direction matrix, rows 24g+21..24g+23 a
    structural identity that routes xs itself into the band-0 block (the
    reference embedding is concat([x/scale, sin bands]), embedding.py:82-91).
  * emb_a = 4 band-blocks of 24G rows (bands 0..3 + xs), emb_b = 2 blocks
    (bands 4..5) — the 87/42 trunk/colour split of trainer.py:16-17.
  * per-ray arrays are [8, 128] tiles (object rows padded to 8); colour uses
    24 rows = channel-major 8c + g; z/alpha/colour sample tiles are columns
    s*128 + r.

Loss semantics match ops/losses.py exactly (masked L1 x (1, 5, 10), detached
depth-variance information weighting, the reference's batch-wide empty-mask
early-out) — the normalising ``wmul = flag * active / (count + 1e-10)``
factors are data-only and precomputed outside the kernel.
"""

from __future__ import annotations

import os
from functools import lru_cache

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmap_tpu.core.bank import BankState

R_TILE = 128          # rays per chunk tile (lane dim)
DPG = 24              # rows per object inside a PE band block: 21 dirs + 3 xs
OG = 8                # per-ray arrays pad the object axis to 8 sublanes
B1, B2, EPS = 0.9, 0.999, 1e-8


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=8)
def group_layout(G: int, h: int):
    """Static shape table for a G-object group of hidden size h."""
    HG = G * h
    EA = 4 * DPG * G          # emb_a rows (bands 0..3, incl. xs rows)
    EB = 2 * DPG * G          # emb_b rows (bands 4..5)
    XP = _rup(3 * G, 8)       # xs rows padded
    shapes = {
        "dirs": (DPG * G, XP),
        "w_in": (HG, EA), "b_in": (HG, 1),
        "w_mid1": (HG, HG), "b_mid1": (HG, 1),
        "w_cat_h": (HG, HG), "w_cat_x": (HG, EA), "b_cat": (HG, 1),
        "w_mid2": (HG, HG), "b_mid2": (HG, 1),
        "w_alpha": (OG, HG), "b_alpha": (OG, 1),
        "w_col_h": (HG, HG), "w_col_x": (HG, EB), "b_col": (HG, 1),
        "w_out": (3 * OG, HG), "b_out": (3 * OG, 1),
    }
    return shapes


P_NAMES = ("dirs", "w_in", "b_in", "w_mid1", "b_mid1", "w_cat_h", "w_cat_x",
           "b_cat", "w_mid2", "b_mid2", "w_alpha", "b_alpha", "w_col_h",
           "w_col_x", "b_col", "w_out", "b_out")


@lru_cache(maxsize=8)
def packed_layout(G: int, h: int):
    """Physical layout packing ALL 17 per-group tensors into TWO buffers:

      wide  [RW, CW]  — matrices stacked along rows (col-padded to CW),
      bias  [RB, 128] — the 7 bias vectors as columns 0..6.

    One PreparedBank state (p/m/v) is then 2 device buffers instead of 17:
    donated-dispatch cost scales with leaf count (~7 us/leaf measured on
    this frontend) and each pallas operand is a separate per-invocation
    block DMA, so 102 param operands -> 12 is both host- and device-side
    cheaper. Returns ({name: (kind, row_off, rows, cols_or_col)}, RW, CW,
    RB)."""
    shapes = group_layout(G, h)
    loc, off = {}, 0
    wide_names = [n for n in P_NAMES if not n.startswith("b_")]
    CW = max(shapes[n][1] for n in wide_names)
    for n in wide_names:
        r, c = shapes[n]
        loc[n] = ("w", off, r, c)
        off += r
    RW = _rup(off, 8)
    bcol = 0
    for n in P_NAMES:
        if n.startswith("b_"):
            r, _ = shapes[n]
            loc[n] = ("b", 0, r, bcol)
            bcol += 1
    RB = _rup(max(max(shapes[n][0] for n in P_NAMES if n.startswith("b_")),
                  8), 8)
    return loc, RW, CW, RB


def pack_state(per_name: dict, G: int, h: int):
    """{name: [ng, r, c]} -> (wide [ng, RW, CW], bias [ng, RB, 128])."""
    loc, RW, CW, RB = packed_layout(G, h)
    ng = per_name["dirs"].shape[0]
    f32 = jnp.float32
    wide = jnp.zeros((ng, RW, CW), f32)
    bias = jnp.zeros((ng, RB, 128), f32)
    for n in P_NAMES:
        kind, off, r, c = loc[n]
        if kind == "w":
            wide = wide.at[:, off:off + r, :c].set(per_name[n].astype(f32))
        else:
            bias = bias.at[:, :r, c:c + 1].set(per_name[n].astype(f32))
    return wide, bias


def unpack_state(packed, G: int, h: int) -> dict:
    loc, RW, CW, RB = packed_layout(G, h)
    wide, bias = packed
    out = {}
    for n in P_NAMES:
        kind, off, r, c = loc[n]
        out[n] = (wide[:, off:off + r, :c] if kind == "w"
                  else bias[:, :r, c:c + 1])
    return out


@lru_cache(maxsize=8)
def _prep_indices(G: int, h: int):
    """Numpy scatter indices mapping per-object param tensors into the
    prepared block forms. Returns {name: (rows, cols, src_shape)} where
    rows/cols are int arrays shaped [G, *src_shape]."""
    ga = np.arange(G)[:, None, None]

    def emb_col(c):
        """Column index inside emb_a for per-object embedding dim c (<87):
        dims 0..2 are x/scale -> band-0 xs rows; dims 3+ are sin bands."""
        c = np.asarray(c)
        xs = c < 3
        k = np.where(xs, 0, (c - 3) // 21)
        off = np.where(xs, 21 + c, (c - 3) % 21)
        return k * (DPG * G) + off  # + 24*g added by caller

    out = {}
    # dirs [21, 3] -> rows 24g+i, cols 3g+j
    i = np.arange(21)[None, :, None]
    j = np.arange(3)[None, None, :]
    out["dirs"] = (DPG * ga + i + 0 * j, 3 * ga + j + 0 * i, (21, 3))
    # w_in / w_cat_x: [h, 87] -> rows h*g+r, cols emb_col(c) + 24g
    r = np.arange(h)[None, :, None]
    c = np.arange(87)[None, None, :]
    ec = emb_col(np.arange(87))[None, None, :]
    out["w_in"] = (h * ga + r + 0 * c, ec + DPG * ga + 0 * r, (h, 87))
    out["w_cat_x"] = out["w_in"]
    # w_col_x: [h, 42] -> cols band k=c//21 block + off
    c42 = np.arange(42)
    ecb = ((c42 // 21) * (DPG * G) + c42 % 21)[None, None, :]
    c = np.arange(42)[None, None, :]
    out["w_col_x"] = (h * ga + r + 0 * c, ecb + DPG * ga + 0 * r, (h, 42))
    # hidden blocks [h, h]
    r = np.arange(h)[None, :, None]
    c = np.arange(h)[None, None, :]
    hid = (h * ga + r + 0 * c, h * ga + c + 0 * r, (h, h))
    for n in ("w_mid1", "w_cat_h", "w_mid2", "w_col_h"):
        out[n] = hid
    # heads
    c = np.arange(h)[None, None, :]
    out["w_alpha"] = (ga + 0 * c, h * ga + c, (1, h))
    ch = np.arange(3)[None, :, None]
    out["w_out"] = (OG * ch + ga + 0 * c, h * ga + c + 0 * ch, (3, h))
    # biases
    r = np.arange(h)[None, :, None]
    z1 = np.zeros((1, 1, 1), np.int64)
    bias = (h * ga + r, z1 + 0 * r, (h, 1))
    for n in ("b_in", "b_mid1", "b_cat", "b_mid2", "b_col"):
        out[n] = bias
    out["b_alpha"] = (ga + 0 * z1, z1 + 0 * ga, (1, 1))
    rch = np.arange(3)[None, :, None]
    out["b_out"] = (OG * rch + ga, z1 + 0 * rch, (3, 1))
    return out


# per-object source tensors, in (pe, mlp) dict terms, matching _prep_indices
def _source_views(pe: dict, mlp: dict):
    h = mlp["w_in"].shape[-2]
    return {
        "dirs": pe["dirs"],
        "w_in": mlp["w_in"], "b_in": mlp["b_in"][..., None],
        "w_mid1": mlp["w_mid1"], "b_mid1": mlp["b_mid1"][..., None],
        "w_cat_h": mlp["w_cat"][..., :, :h],
        "w_cat_x": mlp["w_cat"][..., :, h:],
        "b_cat": mlp["b_cat"][..., None],
        "w_mid2": mlp["w_mid2"], "b_mid2": mlp["b_mid2"][..., None],
        "w_alpha": mlp["w_alpha"], "b_alpha": mlp["b_alpha"][..., None],
        "w_col_h": mlp["w_col"][..., :, :h],
        "w_col_x": mlp["w_col"][..., :, h:],
        "b_col": mlp["b_col"][..., None],
        "w_out": mlp["w_col_out"], "b_out": mlp["b_col_out"][..., None],
    }


def prepare_params(flat: jax.Array, spec, G: int,
                   with_identity: bool) -> dict:
    """Bank flat buffer [cap, P] -> prepared group forms {name: [ng, ...]}.

    ``with_identity`` additionally writes the structural identity rows into
    ``dirs`` (True for parameters, False for Adam moments/zeros).
    """
    cap = flat.shape[0]
    h = spec.hidden
    assert cap % G == 0, (cap, G)
    ng = cap // G
    pe, mlp = spec.unflatten(flat)
    src = _source_views(pe, mlp)
    idx = _prep_indices(G, h)
    shapes = group_layout(G, h)
    out = {}
    for name in P_NAMES:
        rows, cols, sshape = idx[name]
        v = src[name].reshape(ng, G, *sshape)
        buf = jnp.zeros((ng,) + shapes[name], v.dtype)
        rr = jnp.asarray(np.broadcast_to(rows, (G,) + sshape).reshape(-1))
        cc = jnp.asarray(np.broadcast_to(cols, (G,) + sshape).reshape(-1))
        out[name] = buf.at[:, rr, cc].set(v.reshape(ng, -1))
    if with_identity:
        d = out["dirs"]
        g = np.arange(G).repeat(3)
        j = np.tile(np.arange(3), G)
        out["dirs"] = d.at[:, DPG * g + 21 + j, 3 * g + j].set(1.0)
    return out


def unprepare_params(prep: dict, spec, G: int) -> jax.Array:
    """Inverse of prepare_params (identity rows are simply not gathered)."""
    h = spec.hidden
    ng = prep["dirs"].shape[0]
    idx = _prep_indices(G, h)
    pe, mlp = {}, {}

    def take(name):
        rows, cols, sshape = idx[name]
        rr = jnp.asarray(np.broadcast_to(rows, (G,) + sshape).reshape(-1))
        cc = jnp.asarray(np.broadcast_to(cols, (G,) + sshape).reshape(-1))
        return prep[name][:, rr, cc].reshape(ng * G, *sshape)

    pe["dirs"] = take("dirs")
    mlp["w_in"] = take("w_in")
    mlp["b_in"] = take("b_in")[..., 0]
    mlp["w_mid1"] = take("w_mid1")
    mlp["b_mid1"] = take("b_mid1")[..., 0]
    mlp["w_cat"] = jnp.concatenate([take("w_cat_h"), take("w_cat_x")], -1)
    mlp["b_cat"] = take("b_cat")[..., 0]
    mlp["w_mid2"] = take("w_mid2")
    mlp["b_mid2"] = take("b_mid2")[..., 0]
    mlp["w_alpha"] = take("w_alpha")
    mlp["b_alpha"] = take("b_alpha")[..., 0]
    mlp["w_col"] = jnp.concatenate([take("w_col_h"), take("w_col_x")], -1)
    mlp["b_col"] = take("b_col")[..., 0]
    mlp["w_col_out"] = take("w_out")
    mlp["b_col_out"] = take("b_out")[..., 0]
    return jax.vmap(spec.flatten)(pe, mlp)


# ======================================================================== #
# Kernel
# ======================================================================== #

_PI = np.float32(np.pi)

# Quasi-minimax (Chebyshev-node LSQ) polynomials for sin(pi x) / cos(pi x)
# after the EXACT period reduction r = x - 2*round(x/2) (sin/cos of pi*x are
# 2-periodic in x, and the reduction is exact in f32 for |x| < 2^23).
# Max abs error ~1.1e-6 in f32 over all x — far below the ladder's own
# accepted rounding growth (<= ~32 ulp at band 5). ~18 VPU ops for the PAIR
# versus two libm-grade transcendentals on the same [DG, T] tile.
_SINPI_C = tuple(np.float32(c) for c in (
    3.14159265e+00, -5.16771255e+00, 2.55016036e+00, -5.99242307e-01,
    8.20818886e-02, -7.27531576e-03, 3.95280458e-04))
_COSPI_C = tuple(np.float32(c) for c in (
    1.00000000e+00, -4.93480219e+00, 4.05871182e+00, -1.33526029e+00,
    2.35320826e-01, -2.57858088e-02, 1.90432896e-03, -8.86909372e-05))


# 2^f on [-0.5, 0.5] (Chebyshev-node LSQ, deg 5, max rel err ~1.0e-7) for
# the fast sigmoid: 1/(1 + 2^(-x*log2 e)) with 2^t split into round/poly and
# an exponent-bit construction. Max abs err ~1.1e-7 over all x in f32.
_EXP2_C = tuple(np.float32(c) for c in (
    1.00000008, 0.69314721, 0.24022107, 0.05550327, 0.00967604, 0.00134004))
_NLOG2E = np.float32(-1.4426950408889634)


def sigmoid_fast(x):
    t = jnp.clip(x * _NLOG2E, -126.0, 126.0)
    n = jnp.round(t)
    f = t - n
    p = _EXP2_C[-1]
    for c in _EXP2_C[-2::-1]:
        p = p * f + c
    two_n = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32)
    return 1.0 / (1.0 + two_n * p)


def sincos_pi_poly(p):
    """(sin(pi*p), cos(pi*p)) as one shared-range-reduction poly pair."""
    r = p - 2.0 * jnp.round(p * 0.5)
    t = r * r
    s = _SINPI_C[-1]
    for c in _SINPI_C[-2::-1]:
        s = s * t + c
    s = s * r
    c_ = _COSPI_C[-1]
    for c in _COSPI_C[-2::-1]:
        c_ = c_ * t + c
    return s, c_


def _mm_policy(bf16) -> str:
    """Normalise the matmul dtype policy: False/"f32" (all f32),
    True/"bf16" (all matmuls bf16 operands, f32 accumulate),
    "bwd_bf16" (forward f32; backward weight/activation-grad matmuls
    bf16 — gradient noise the masked AdamW normalises away),
    "int8" (all MLP matmul operands dynamically quantised to s8, s32
    accumulate — 2x MXU pass rate on v5e; render/loss/Adam/PE stay f32),
    "int8_fwd" (forward quantised, backward f32 — the diagnostic
    half-policy for isolating gradient-quantisation quality effects),
    or "int8_static"/"int8_static_fwd" (as int8/int8_fwd but activation
    and gradient tensors use STATIC scales instead of the in-loop abs-max
    reduce — round 4 measured that reduce as the dynamic policy's killer
    at these K=128-384 shapes, ~5 VPU passes per operand tile; static
    scales leave only rescale+clip+round+cast. Scales are compile-time
    constants, env-tunable via VMAP_Q8_SACT/SHEAD/SGRAD; a production
    deployment would calibrate them from the previous frame's recorded
    maxima). Weights stay dynamically quantised once per iteration in all
    int8 policies (amortised, not on the per-chunk critical path)."""
    if bf16 is True:
        return "bf16"
    if bf16 is False:
        return "f32"
    assert bf16 in ("f32", "bf16", "bwd_bf16", "int8", "int8_fwd",
                    "int8_static", "int8_static_fwd"), bf16
    return bf16


def _make_kernel(G: int, h: int, S: int, n_iter: int, n_chunks: int,
                 lr: float, wd: float, cs: float, osc: float, bf16,
                 ablate: frozenset = frozenset(), ns: int = 1,
                 unroll: bool = False, grid_iters: bool = False,
                 lanemix: str = "mxu", adam_rsqrt: bool = False,
                 sched: str = "phase", rt: int = R_TILE,
                 shared: bool = False, fwdsplit: bool = False,
                 sincos: str = "exact", sigmoid: str = "exact",
                 adam_block: bool = False, render_packed: bool = False,
                 zb_mode: str = "mxu", alias: bool = False):
    """Kernel body for one invocation: every iteration of the frame for
    ``ns`` object groups whose render sections are MERGED.

    Grid is (n_groups / ns,): the whole 20-iteration optimisation runs
    inside one invocation (``lax.fori_loop`` over iterations, ray chunks
    unrolled), with parameters and Adam moments resident in the VMEM output
    blocks. This removes the measured ~4 us/invocation grid overhead that a
    (groups, iters, chunks) grid paid 500 times per frame.

    Render merging (``ns`` subgroups): matmuls keep the block-diagonal
    G-object grouping (G = 128/h fills the MXU tile), but per-ray arrays
    are [OG=8, T] VPU tiles — at G=4 only half the sublanes carry data, so
    the whole render/loss/backward-head section ran at 50% VPU density
    (12.5% for a G=1 bank). With ns = OG/G subgroups per invocation, the
    per-ray operands (z, depth, masks, gt colour, loss normalisers) are
    pre-merged to dense rows sub*G+g by the batch layout, the forward runs
    per subgroup, and the alpha/colour-logit outputs merge by a sublane
    roll + add — exact, because the pad rows of each subgroup's heads are
    structurally zero. Render/loss/backward-to-d(alpha,logits) then run
    ONCE on dense rows; the per-subgroup backward consumes sublane-rolled
    slices (junk rows are annihilated by the structurally-zero head weight
    rows and the Adam block masks).

    Points are built in-kernel from per-ray origins/dirs (pre-divided by the
    object scale) and the sample depths z: xs = o + z*d. This keeps the HBM
    ray stream at [XP+XP, 128] + z per tile instead of a [XP, S*128] point
    tensor (5x less batch traffic, and the XLA-side transpose of the big
    point tensor disappears).
    """
    HG = G * h
    DG = DPG * G
    policy = _mm_policy(bf16)
    f32 = jnp.float32
    # cdt: forward matmul operand dtype (stored activations included);
    # bdt: backward matmul operand dtype.
    cdt = jnp.bfloat16 if policy == "bf16" else f32
    bdt = jnp.bfloat16 if policy in ("bf16", "bwd_bf16") else f32
    # int8 policies: forward / backward MLP matmul operands quantised to
    # s8 (s32 accumulate, 2x MXU pass rate on v5e). PE maths, render/loss,
    # Adam and the dirs-projection matmuls stay f32. q8s selects STATIC
    # activation/gradient scales (no in-loop abs-max reduce).
    q8f = policy in ("int8", "int8_fwd", "int8_static", "int8_static_fwd")
    q8b = policy in ("int8", "int8_static")
    q8s = policy in ("int8_static", "int8_static_fwd")
    NP = len(P_NAMES)
    NC = n_chunks
    shapes = group_layout(G, h)
    XP = _rup(3 * G, 8)
    T = S * rt

    def blockmask(name: str):
        r, c = shapes[name]
        ri = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
        if name == "dirs":
            return (ri // DPG == ci // 3) & (ri % DPG < 21) & (ci < 3 * G)
        if name in ("w_in", "w_cat_x"):
            return ((ri // h == (ci % DG) // DPG)
                    & ((ci // DG == 0) | (ci % DPG < 21)))
        if name == "w_col_x":
            return (ri // h == (ci % DG) // DPG) & (ci % DPG < 21)
        if name in ("w_mid1", "w_cat_h", "w_mid2", "w_col_h"):
            return ri // h == ci // h
        if name == "w_alpha":
            return (ci // h == ri) & (ri < G)
        if name == "w_out":
            return (ci // h == ri % OG) & (ri % OG < G) & (ri // OG < 3)
        if name == "b_alpha":
            return (ri < G) & (ci == 0)
        if name == "b_out":
            return (ri % OG < G) & (ri // OG < 3) & (ci == 0)
        return jnp.ones((r, c), bool)  # other biases

    loc, RW, CW, RB = packed_layout(G, h)

    def kernel(*refs):
        state_in = refs[0:6]            # (p_w, p_b, m_w, m_b, v_w, v_b)
        od_ref, z_ref, pk_ref, wmul_ref = refs[6:10]
        state_out = refs[10:16]
        loss_ref = refs[16]
        pout_w, pout_b, mout_w, mout_b, vout_w, vout_b = state_out

        def init_state():
            # with input_output_aliases the output state blocks ARE the
            # (donated) input blocks — no copy-in needed, and XLA drops
            # the defensive buffer copies it otherwise emits per frame
            if not alias:
                for dst, src in zip(state_out, state_in):
                    dst[:] = src[:]
            loss_ref[:] = jnp.zeros_like(loss_ref)

        if not grid_iters:
            init_state()

        def view(wref, bref, n, gg):
            kind, off, r, c = loc[n]
            if kind == "w":
                return wref[gg, off:off + r, 0:c]
            return bref[gg, 0:r, c:c + 1]

        def store(wref, bref, n, gg, val):
            kind, off, r, c = loc[n]
            if kind == "w":
                wref[gg, off:off + r, 0:c] = val
            else:
                bref[gg, 0:r, c:c + 1] = val

        # z rows (merged: sub*G+g) -> xs rows [XP]: row 3g+c reads z row
        # sub*G+g for subgroup ``sub``
        zri = jax.lax.broadcasted_iota(jnp.int32, (XP, OG), 0)
        zci = jax.lax.broadcasted_iota(jnp.int32, (XP, OG), 1)
        zbmats = [((zri // 3 + sub * G == zci) & (zri < 3 * G)).astype(f32)
                  for sub in range(ns)]
        masks = {n: blockmask(n) for n in P_NAMES}
        rowi = jax.lax.broadcasted_iota(jnp.int32, (DG, 1), 0)
        xsrow = (rowi % DPG) >= 21
        coli_og = jax.lax.broadcasted_iota(jnp.int32, (OG, rt), 1)

        # ---- int8 dynamic quantisation (policy "int8"/"int8_fwd") ----
        # One SYMMETRIC PER-TENSOR scale per matmul operand. This is exact
        # scale algebra for this kernel: weights are block-diagonal
        # (structural zeros quantise to 0), so a scalar factors out of both
        # matmul orientations, and the per-output-block rescale collapses
        # to one multiplier on the f32-cast s32 accumulator. Embedding sin
        # rows are bounded [-1, 1] and use a STATIC x127 row scale folded
        # into the weight quantisation (no reduce on the critical path);
        # band-0 xs pass-through rows get x(127/XS_RANGE) with saturation.
        i8 = jnp.int8
        i32 = jnp.int32
        XS_RANGE = 4.0
        if q8f:
            EA = 4 * DG
            eri = jax.lax.broadcasted_iota(jnp.int32, (EA, 1), 0)
            is_xs0 = (eri < DG) & (eri % DPG >= 21)     # band-0 xs rows
            ma_col = jnp.where(is_xs0, 127.0 / XS_RANGE, 127.0)   # [EA, 1]
            inv_ma_row = (1.0 / ma_col).reshape(1, EA)            # [1, EA]

        def quant_dyn(x):
            """f32 -> (s8, scale): round-to-nearest symmetric per-tensor."""
            s = jnp.max(jnp.abs(x)) * (1.0 / 127.0) + 1e-30
            xq = jnp.round(x * (1.0 / s)).astype(i8)
            return xq, s

        def quant_static(x, m: float):
            """f32 -> (s8, scale) with a STATIC expected-max ``m``: the
            rescale/clip/round/cast only — no abs-max reduce on the chunk
            critical path. Saturates (clips) values past m."""
            s = m * (1.0 / 127.0)
            xq = jnp.round(jnp.clip(x * (127.0 / m), -127.0, 127.0)
                           ).astype(i8)
            return xq, s

        # static-scale policy constants (compile-time; a calibrating
        # deployment would feed previous-frame maxima here instead)
        S_ACT = float(os.environ.get("VMAP_Q8_SACT", "8.0"))
        S_HEAD = float(os.environ.get("VMAP_Q8_SHEAD", "0.125"))
        S_GRAD = float(os.environ.get("VMAP_Q8_SGRAD", "0.02"))
        quant_grad_head = ((lambda x: quant_static(x, S_HEAD)) if q8s
                           else quant_dyn)
        quant_grad_hid = ((lambda x: quant_static(x, S_GRAD)) if q8s
                          else quant_dyn)

        def quant_relu(y):
            """relu fused with quantisation (forward activations).
            Returns (s8 activation, scale, f32 relu output)."""
            r = jnp.maximum(y, 0.0)
            if q8s:
                xq, s = quant_static(r, S_ACT)
            else:
                xq, s = quant_dyn(r)
            return xq, s, r

        def quant_emb(e, m):
            """Static-row-scale embedding quantisation (saturating)."""
            return jnp.round(jnp.clip(e * m, -127.0, 127.0)).astype(i8)

        def mmq(aq, bq, s):
            return jnp.dot(aq, bq, preferred_element_type=i32
                           ).astype(f32) * s

        def mmTq(aq, bq, s):    # [m,T] x [k,T] -> [m,k], contract T
            return jax.lax.dot_general(
                aq, bq, (((1,), (1,)), ((), ())),
                preferred_element_type=i32).astype(f32) * s

        def mTvq(wq, dyq, s):   # [m,k] x [m,T] -> [k,T], contract m
            return jax.lax.dot_general(
                wq, dyq, (((0,), (0,)), ((), ())),
                preferred_element_type=i32).astype(f32) * s

        QW_NAMES = ("w_in", "w_mid1", "w_cat_h", "w_cat_x", "w_mid2",
                    "w_alpha", "w_col_h", "w_col_x", "w_out")

        def quant_weights(p):
            """Quantise one subgroup's matmul weights (once per iteration —
            they only change at the AdamW at the iteration's end). The
            embedding-facing weights absorb the static emb row scales into
            their columns, so ``mmq(wq, embq, s_w)`` needs no emb scale and
            the emb quantisation itself is reduce-free."""
            qw = {}
            for n in QW_NAMES:
                w = p[n]
                if n in ("w_in", "w_cat_x"):
                    w = w * inv_ma_row
                elif n == "w_col_x":
                    w = w * (1.0 / 127.0)
                qw[n] = quant_dyn(w)
            return qw

        def _roll_rows(x, k: int):
            """Sublane roll by k rows (merged-row <-> subgroup-row shift)."""
            if k == 0:
                return x
            k = k % x.shape[0]
            return jnp.concatenate([x[x.shape[0] - k:], x[:x.shape[0] - k]],
                                   0)

        # per-row -> per-MERGED-object expansion one-hots for Adam scalars
        def expand_oh(rows: int, mode: str, sub: int):
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            if mode == "dirs":
                ro = ri // DPG
            elif mode == "head":
                ro = ri % OG
            elif mode == "alpha":
                ro = ri
            else:
                ro = ri // h
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, OG), 1)
            return (ro + sub * G == ci).astype(f32)

        ohs = {(m, sub): expand_oh(r, m, sub)
               for m, r in (("div", HG), ("dirs", DG), ("alpha", OG),
                            ("head", 3 * OG))
               for sub in range(ns)}

        def cls(n):
            if n == "dirs":
                return "dirs"
            if n in ("w_alpha", "b_alpha"):
                return "alpha"
            if n in ("w_out", "b_out"):
                return "head"
            return "div"

        # Adam loop-invariants, hoisted out of the iteration loop: the
        # combined update mask (active-object rows AND the structural block
        # mask), both as a bool (moment write-back selects) and as an f32
        # multiplier (grad gating + decay/update application) — keeping
        # masked entries and inactive objects bit-identical. (Hoisting the
        # bias-correction row-vectors for all iterations as [rows, NI] was
        # tried; Mosaic has no value-dynamic_slice to extract column `it`.)
        actv0 = wmul_ref[0, 0, 5 * OG:6 * OG]        # [OG, 1] frame-const
        updb, maskf = [], []
        for sub in range(ns):
            actrows = {m: jnp.dot(ohs[(m, sub)], actv0,
                                  preferred_element_type=f32)
                       for m in ("div", "dirs", "alpha", "head")}
            updb.append({n: (actrows[cls(n)] > 0) & masks[n]
                         for n in P_NAMES})
            maskf.append({n: jnp.where(updb[sub][n], 1.0, 0.0)
                          for n in P_NAMES})

        # adam_block: the 10 per-tensor wide-view updates collapse into ONE
        # full-width [RW, CW] update (fewer, fatter VPU ops). Hoisted
        # constants: full-block masks and the row -> merged-object one-hot
        # (so the per-iteration bias-correction row vectors cost ONE
        # [RW, OG] x [OG, 1] dot per scalar instead of 8 per-class dots;
        # the bias path reuses slices of the full-height vectors).
        wide_names = [n for n in P_NAMES if not n.startswith("b_")]
        _wrows = sum(shapes[n][0] for n in wide_names)

        def place_rows(piece, width, dtype=None):
            """Assemble [RW, width] from per-wide-name pieces in packed
            row order (cols zero-padded to ``width``)."""
            pieces = []
            for n in wide_names:
                p_ = piece(n)
                dt = dtype or p_.dtype
                if p_.shape[1] < width:
                    p_ = jnp.concatenate(
                        [p_, jnp.zeros((p_.shape[0], width - p_.shape[1]),
                                       dt)], 1)
                pieces.append(p_.astype(dt))
            if _wrows < RW:
                pieces.append(jnp.zeros((RW - _wrows, width),
                                        pieces[0].dtype))
            return jnp.concatenate(pieces, 0)

        if adam_block:
            # concatenate in f32 (Mosaic cannot bitcast i1 vregs), then
            # compare: the bool mask is only ever consumed by jnp.where.
            maskf_wb = [place_rows(lambda n: maskf[sub][n], CW, f32)
                        for sub in range(ns)]
            updb_wb = [m > 0 for m in maskf_wb]
            oh_wb = [place_rows(lambda n: ohs[(cls(n), sub)], OG)
                     for sub in range(ns)]

        # Per-ray reductions over the S sample tiles, their broadcasts, and
        # the channel triplication/summing of the colour rows. Two
        # implementations, selected by ``lanemix``:
        #   "mxu": 0/1 lane-mixing matmuls (the round-2 full-width rewrite);
        #   "vpu": strided tile adds/concats — S-1 vector adds per
        #          reduction instead of a [rows, T] x [T, 128] dot.
        if lanemix == "mxu":
            ri_t = jax.lax.broadcasted_iota(jnp.int32, (T, rt), 0)
            ci_t = jax.lax.broadcasted_iota(jnp.int32, (T, rt), 1)
            msum = (ri_t % rt == ci_t).astype(f32)          # [T, rt]
            ri_b = jax.lax.broadcasted_iota(jnp.int32, (rt, T), 0)
            ci_b = jax.lax.broadcasted_iota(jnp.int32, (rt, T), 1)
            mbc = (ri_b == ci_b % rt).astype(f32)           # [rt, T]
            r3i = jax.lax.broadcasted_iota(jnp.int32, (3 * OG, OG), 0)
            r3j = jax.lax.broadcasted_iota(jnp.int32, (3 * OG, OG), 1)
            rep3m = (r3i % OG == r3j).astype(f32)           # [3OG, OG]
            s3i = jax.lax.broadcasted_iota(jnp.int32, (OG, 3 * OG), 0)
            s3j = jax.lax.broadcasted_iota(jnp.int32, (OG, 3 * OG), 1)
            sum3m = (s3j % OG == s3i).astype(f32)           # [OG, 3OG]

            def lane_sum(x):   # [rows, T] -> [rows, 128] (sum over s tiles)
                return jnp.dot(x, msum, preferred_element_type=f32)

            def bcast(x):      # [rows, 128] -> [rows, T]
                return jnp.dot(x, mbc, preferred_element_type=f32)

            def rep3(x):       # [OG, L] -> [3OG, L] channel triplication
                return jnp.dot(rep3m, x, preferred_element_type=f32)

            def sum3(x):       # [3OG, L] -> [OG, L] channel sum
                return jnp.dot(sum3m, x, preferred_element_type=f32)
        else:
            def lane_sum(x):
                acc = tile(x, 0)
                for s in range(1, S):
                    acc = acc + tile(x, s)
                return acc

            def bcast(x):
                return jnp.concatenate([x] * S, 1)

            def rep3(x):
                return jnp.concatenate([x, x, x], 0)

            def sum3(x):
                return x[0:OG] + x[OG:2 * OG] + x[2 * OG:3 * OG]

        def mm(w, x):
            return jnp.dot(w.astype(cdt), x, preferred_element_type=f32)

        def mmT(a, b):      # [m,T] x [k,T] -> [m,k], contract T
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

        def mTv(w, dy):     # [m,k] x [m,T] -> [k,T], contract m
            return jax.lax.dot_general(
                w.astype(bdt), dy, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)

        def pos(a):         # Mosaic cannot compare bf16 vectors; mask in f32
            return a.astype(f32) > 0

        def tile(a, s):
            return a[:, s * rt:(s + 1) * rt]

        def fwd_pe(p, idx, sub):
            """PE phase of the forward: xs build + dir projection + the
            sin/cos double-angle ladder + embedding concats. VPU-dominated
            (one small MXU dot); split from the matmul phase so the caller
            can emit subgroup B's PE adjacent to subgroup A's MLP matmuls
            (independent VPU/MXU work the VLIW scheduler can overlap)."""
            if "static0" in ablate:   # profiling: cost of dynamic batch reads
                idx = 0
            o = od_ref[sub, idx, 0:XP]                         # [XP, 128]
            d = od_ref[sub, idx, XP:2 * XP]
            z = z_ref[0, idx]                                  # [OG, T] merged

            if zb_mode == "vpu":
                # z row sub*G+g replicated into xs rows 3g..3g+2 with a
                # sublane broadcast+reshape instead of a [XP, OG] matmul —
                # frees ~10 MXU passes per subgroup-chunk in a kernel that
                # is otherwise MXU-bound (xs pad rows are annihilated by
                # the structurally-zero dirs columns, so their value is
                # free; zeros keep them exact).
                z_sub = z[sub * G:(sub + 1) * G]
                zb = jnp.broadcast_to(z_sub[:, None, :],
                                      (G, 3, T)).reshape(3 * G, T)
                if XP > 3 * G:
                    zb = jnp.concatenate(
                        [zb, jnp.zeros((XP - 3 * G, T), f32)], 0)
            else:
                zb = jnp.dot(zbmats[sub], z, preferred_element_type=f32)
            xs = jnp.concatenate(
                [o + tile(zb, s) * d for s in range(S)], 1)     # [XP, T]

            proj = jnp.dot(p["dirs"], xs, preferred_element_type=f32)
            # sin(pi*2^k*proj), k=0..5, via the double-angle ladder seeded
            # by ONE base sin/cos pair — by default the ~1e-6-exact
            # polynomial pair (zero transcendentals; sincos="exact" uses
            # libm-grade sin/cos instead). The per-band transcendentals
            # this replaces dominated the kernel (bf16 matmuls measured ~0%
            # faster -> VPU-bound). Ladder rounding grows ~2^k (<= ~32 ulp
            # at band 5), negligible at the 1e-4 loss scale.
            if "ladder" in ablate:  # profiling: transcendental/ladder cost
                sins = [proj * (0.1 * (k + 1)) for k in range(6)]
                coss = [proj * (0.05 * (k + 1)) for k in range(6)]
            else:
                if sincos == "poly":
                    s0, c0 = sincos_pi_poly(proj)
                else:
                    s0, c0 = jnp.sin(proj * _PI), jnp.cos(proj * _PI)
                sins, coss = [s0], [c0]
                for _ in range(5):
                    s_, c_ = sins[-1], coss[-1]
                    sins.append(2.0 * s_ * c_)
                    coss.append(1.0 - 2.0 * s_ * s_)
            # rows 21..23 of each 24-row object block are structural (xs
            # pass-through in band 0; JUNK in bands 1..5 and emb_b — their
            # weight columns are structurally zero, so no masking needed).
            band0 = jnp.where(xsrow, proj, sins[0])
            emb_a = jnp.concatenate([band0, sins[1], sins[2], sins[3]], 0)
            emb_b = jnp.concatenate([sins[4], sins[5]], 0)
            if q8f:
                # (quantised, f32) pairs; the f32 copy is kept only for the
                # "int8_fwd" half-policy whose backward runs in f32
                ea32 = None if q8b else emb_a
                eb32 = None if q8b else emb_b
                return (xs, coss, (quant_emb(emb_a, ma_col), ea32),
                        (quant_emb(emb_b, 127.0), eb32))
            return xs, coss, emb_a.astype(cdt), emb_b.astype(cdt)

        def fwd_mlp(p, pe_out, qw=None):
            """MLP matmul phase of the forward (MXU-dominated)."""
            xs, coss, emb_a, emb_b = pe_out
            if q8f:
                (eaq, ea32), (ebq, eb32) = emb_a, emb_b
                h1q, s1, h1f = quant_relu(
                    mmq(qw["w_in"][0], eaq, qw["w_in"][1]) + p["b_in"])
                h2q, s2, h2f = quant_relu(
                    mmq(qw["w_mid1"][0], h1q, qw["w_mid1"][1] * s1)
                    + p["b_mid1"])
                h3q, s3, h3f = quant_relu(
                    mmq(qw["w_cat_h"][0], h2q, qw["w_cat_h"][1] * s2)
                    + mmq(qw["w_cat_x"][0], eaq, qw["w_cat_x"][1])
                    + p["b_cat"])
                h4q, s4, h4f = quant_relu(
                    mmq(qw["w_mid2"][0], h3q, qw["w_mid2"][1] * s3)
                    + p["b_mid2"])
                alpha = (mmq(qw["w_alpha"][0], h4q, qw["w_alpha"][1] * s4)
                         + p["b_alpha"]) * 10.0
                cq, sc, cactf = quant_relu(
                    mmq(qw["w_col_h"][0], h4q, qw["w_col_h"][1] * s4)
                    + mmq(qw["w_col_x"][0], ebq, qw["w_col_x"][1])
                    + p["b_col"])
                logits = (mmq(qw["w_out"][0], cq, qw["w_out"][1] * sc)
                          + p["b_out"])
                if q8b:
                    saved = {"xs": xs, "coss": coss, "emb_a": eaq,
                             "emb_b": ebq, "h1": h1q, "h2": h2q, "h3": h3q,
                             "h4": h4q, "cact": cq,
                             "scales": (s1, s2, s3, s4, sc), "qw": qw}
                else:     # int8_fwd: keep f32 operands for the f32 backward
                    saved = {"xs": xs, "coss": coss, "emb_a": ea32,
                             "emb_b": eb32, "h1": h1f, "h2": h2f,
                             "h3": h3f, "h4": h4f, "cact": cactf}
                return alpha, logits, saved
            h1 = jax.nn.relu(mm(p["w_in"], emb_a) + p["b_in"]).astype(cdt)
            h2 = jax.nn.relu(mm(p["w_mid1"], h1) + p["b_mid1"]).astype(cdt)
            h3 = jax.nn.relu(mm(p["w_cat_h"], h2) + mm(p["w_cat_x"], emb_a)
                             + p["b_cat"]).astype(cdt)
            h4 = jax.nn.relu(mm(p["w_mid2"], h3) + p["b_mid2"]).astype(cdt)
            alpha = (mm(p["w_alpha"], h4) + p["b_alpha"]) * 10.0   # [OG,T]
            cact = jax.nn.relu(mm(p["w_col_h"], h4)
                               + mm(p["w_col_x"], emb_b)
                               + p["b_col"]).astype(cdt)
            logits = mm(p["w_out"], cact) + p["b_out"]             # [3*OG,T]
            saved = {"xs": xs, "coss": coss, "emb_a": emb_a,
                     "emb_b": emb_b, "h1": h1, "h2": h2, "h3": h3,
                     "h4": h4, "cact": cact}
            return alpha, logits, saved

        def fwd_chunk(p, idx, sub, qw=None):
            """Forward for one 128-ray chunk of subgroup ``sub``. Returns
            (alpha [OG, T], colour logits [3OG, T], saved activations);
            alpha/logit pad rows are structurally zero, so the caller
            merges subgroups by sublane-roll + add."""
            return fwd_mlp(p, fwd_pe(p, idx, sub), qw)

        def render_bwd(idx, w3, alpha, logits, z):
            """Render + losses + backward-to-(dalpha, dlogits) on MERGED
            dense rows. Returns (per-merged-object loss [OG, 1], dalpha
            [OG, T] or None, dlogits [3OG, T] or None)."""
            # ------------- render + losses (f32, full-width) -------------
            # Everything that can be [OG, T]-wide is (the original per-s
            # [OG, 128] tile chains were ~3 ms/frame of VPU issue overhead);
            # only the inherently sequential cumulative/suffix products run
            # per tile, and per-ray reductions/broadcasts ride the MXU via
            # lane_sum/bcast.
            sig = sigmoid_fast if sigmoid == "fast" else jax.nn.sigmoid
            if render_packed:
                # render_packed: fewer, fatter VPU ops — elementwise-equal
                # rows stacked so each fixed-overhead vector op covers more
                # data (one sigmoid/lane_sum/row-reduce instead of 2-3).
                sg = sig(jnp.concatenate([alpha, logits], 0))   # [4OG, T]
                occ = sg[0:OG]
                color = sg[OG:4 * OG]
            else:
                color = sig(logits)
                occ = sig(alpha)
            # 1 - occ + 1e-10 can const-fold to exactly 0 at occ == 1 under
            # some compilation paths; clamp so the cumprod backward's
            # division stays finite (the reference's intended epsilon).
            free = jnp.maximum(1.0 - occ + 1e-10, 1e-10)
            cp = jnp.ones((OG, rt), f32)
            cps = []
            for s in range(S):
                cps.append(cp)
                cp = cp * tile(free, s)
            cp_full = jnp.concatenate(cps, 1)                  # [OG, T]
            terms = occ * cp_full                              # [OG, T]
            terms3 = rep3(terms)
            if render_packed:
                # one stacked lane_sum for the three independent renders
                stk = lane_sum(jnp.concatenate(
                    [terms * z, terms, terms3 * color], 0))    # [5OG, 128]
                RD = stk[0:OG]
                RO = stk[OG:2 * OG]
                RC3 = stk[2 * OG:5 * OG]
            else:
                RD = lane_sum(terms * z)                       # [OG, 128]
                RO = lane_sum(terms)
                RC3 = lane_sum(terms3 * color)                 # [3OG, 128]
            RD_b = bcast(RD)
            var = lane_sum(terms * (z - RD_b) ** 2)
            info = 1.0 / (jnp.sqrt(var) + 1e-4)

            pk = pk_ref[0, idx]       # [7*OG, rt]: dep | gtc(3) | mo|ms|md
            dep = pk[0:OG]
            gtc = pk[OG:4 * OG]                                # [3*OG, 128]
            mo = pk[4 * OG:5 * OG]
            msm = pk[5 * OG:6 * OG]
            md = pk[6 * OG:7 * OG]
            w_d, w_c, w_o = w3[0:OG], w3[OG:2 * OG], w3[2 * OG:3 * OG]

            res_d = RD - dep
            res_o = RO - mo
            res_c3 = RC3 - gtc                                 # [3OG, 128]
            mo3 = rep3(mo)
            lc_obj = sum3(jnp.abs(res_c3) * mo3)           # [OG, 128]
            if render_packed:
                # one stacked cross-lane row-reduce for the three losses
                ls = jnp.sum(jnp.concatenate(
                    [jnp.abs(res_d) * md * info,
                     jnp.abs(res_o) * msm, lc_obj], 0),
                    1, keepdims=True)                          # [3OG, 1]
                ld = ls[0:OG] * w_d
                lo = ls[OG:2 * OG] * w_o
                lc = ls[2 * OG:3 * OG] * w_c
            else:
                ld = jnp.sum(jnp.abs(res_d) * md * info, 1,
                             keepdims=True) * w_d
                lc = jnp.sum(lc_obj, 1, keepdims=True) * w_c
                lo = jnp.sum(jnp.abs(res_o) * msm, 1, keepdims=True) * w_o
            lobj = ld + cs * lc + osc * lo                     # [OG, 1]

            # ------------- backward to (dalpha, dlogits) -------------
            if "bwdall" in ablate:  # profiling ablation: fwd+loss only
                return lobj, None, None
            dRD = jnp.sign(res_d) * md * info * w_d            # [OG, 128]
            dRO = jnp.sign(res_o) * msm * (w_o * osc)
            w_c3 = rep3(w_c * cs)
            dRC3 = jnp.sign(res_c3) * mo3 * w_c3               # [3OG, 128]
            if render_packed:
                # one stacked bcast for all five backward row-vectors
                b5 = bcast(jnp.concatenate([dRD, dRO, dRC3], 0))  # [5OG, T]
                dRC3_b = b5[2 * OG:5 * OG]
                dterm = (b5[0:OG] * z + b5[OG:2 * OG]
                         + sum3(dRC3_b * color))               # [OG, T]
            else:
                dRC3_b = bcast(dRC3)                           # [3OG, T]
                dterm = (bcast(dRD) * z + bcast(dRO)
                         + sum3(dRC3_b * color))               # [OG, T]
            # docc_s = dterm_s*cp_s - (sum_{k>s} dterm_k*term_k)/free_s
            tt = dterm * terms
            suf = jnp.zeros((OG, rt), f32)
            sufs = [None] * S
            for s in range(S - 1, -1, -1):
                sufs[s] = suf
                suf = suf + tile(tt, s)
            suf_full = jnp.concatenate(sufs, 1)                # [OG, T]
            docc = dterm * cp_full - suf_full / free
            dalpha = docc * occ * (1.0 - occ) * 10.0           # [OG, T]
            dcolor = dRC3_b * terms3                           # [3OG, T]
            dlogits = dcolor * color * (1.0 - color)
            return lobj, dalpha, dlogits

        def bwd_chunk(p, sv, dalpha, dlogits, lobj):
            """Backward matmul chain for one subgroup from its sublane-
            rolled (dalpha, dlogits) slices. Junk rows (other subgroups'
            data wrapped into the pad rows) are annihilated by the
            structurally-zero head-weight pad rows and the Adam block
            masks. Returns the grads dict."""
            if q8b:
                return bwd_chunk_q8(sv, dalpha, dlogits)
            cact, h4, h3, h2, h1 = (sv["cact"], sv["h4"], sv["h3"],
                                    sv["h2"], sv["h1"])
            emb_a, emb_b, coss, xs = (sv["emb_a"], sv["emb_b"], sv["coss"],
                                      sv["xs"])
            da_c = dalpha.astype(bdt)
            dl_c = dlogits.astype(bdt)
            # backward-side operand casts (no-ops unless policy=bwd_bf16)
            cact_b = cact.astype(bdt)
            h4_b = h4.astype(bdt)
            h3_b = h3.astype(bdt)
            h2_b = h2.astype(bdt)
            h1_b = h1.astype(bdt)
            emb_a_b = emb_a.astype(bdt)
            emb_b_b = emb_b.astype(bdt)

            g = {}
            g["w_out"] = mmT(dl_c, cact_b)
            g["b_out"] = jnp.sum(dlogits, 1, keepdims=True)
            dc = mTv(p["w_out"], dl_c) * pos(cact)
            dc_c = dc.astype(bdt)
            g["w_col_h"] = mmT(dc_c, h4_b)
            g["w_col_x"] = mmT(dc_c, emb_b_b)
            g["b_col"] = jnp.sum(dc, 1, keepdims=True)
            g["w_alpha"] = mmT(da_c, h4_b)
            g["b_alpha"] = jnp.sum(dalpha, 1, keepdims=True)
            dh4 = (mTv(p["w_col_h"], dc_c)
                   + mTv(p["w_alpha"], da_c)) * pos(h4)
            dh4_c = dh4.astype(bdt)
            g["w_mid2"] = mmT(dh4_c, h3_b)
            g["b_mid2"] = jnp.sum(dh4, 1, keepdims=True)
            dh3 = mTv(p["w_mid2"], dh4_c) * pos(h3)
            dh3_c = dh3.astype(bdt)
            g["w_cat_h"] = mmT(dh3_c, h2_b)
            g["w_cat_x"] = mmT(dh3_c, emb_a_b)
            g["b_cat"] = jnp.sum(dh3, 1, keepdims=True)
            dh2 = mTv(p["w_cat_h"], dh3_c) * pos(h2)
            dh2_c = dh2.astype(bdt)
            g["w_mid1"] = mmT(dh2_c, h1_b)
            g["b_mid1"] = jnp.sum(dh2, 1, keepdims=True)
            dh1 = mTv(p["w_mid1"], dh2_c) * pos(h1)
            dh1_c = dh1.astype(bdt)
            g["w_in"] = mmT(dh1_c, emb_a_b)
            g["b_in"] = jnp.sum(dh1, 1, keepdims=True)

            demb_a = mTv(p["w_in"], dh1_c) + mTv(p["w_cat_x"], dh3_c)
            if "bwd" in ablate:   # profiling ablation: cheap fake grads
                return {n: jnp.zeros(shapes[n], f32) + lobj[0, 0]
                        for n in P_NAMES}
            demb_b = mTv(p["w_col_x"], dc_c)
            # xs rows: band-0 routes xs grads into the structural identity
            # rows; bands 1..5 have zero weight columns there, so their
            # demb xs rows are exactly 0 and need no masking. The identity
            # and junk rows of g["dirs"] are masked before Adam anyway.
            dproj = jnp.where(xsrow, demb_a[0:DG], coss[0] * _PI
                              * demb_a[0:DG])
            for k in range(1, 6):
                blk = demb_a[k * DG:(k + 1) * DG] if k < 4 else \
                    demb_b[(k - 4) * DG:(k - 3) * DG]
                fq = _PI * np.float32(2.0 ** k)
                dproj = dproj + fq * coss[k] * blk
            g["dirs"] = jax.lax.dot_general(
                dproj.astype(bdt), xs.astype(bdt), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            return g

        def bwd_chunk_q8(sv, dalpha, dlogits):
            """Quantised backward (policy "int8"): every HG-row matmul runs
            s8 x s8 -> s32; each gradient tensor is dynamically quantised
            ONCE and reused as both its grad-weight (mmTq) and
            grad-activation (mTvq) operand. Scale algebra: a tensor x is
            represented as xq * s_x, so every product rescales by the two
            operand scales; the emb static row scales (folded into the
            weight quants) re-emerge as the ``inv_ma_row`` / ``ma_col``
            multipliers on w_in/w_cat_x grads and demb_a. Bias grads,
            relu masks, dproj and the dirs grad stay f32."""
            qw = sv["qw"]
            s1, s2, s3, s4, sc = sv["scales"]
            cq, h4q, h3q, h2q, h1q = (sv["cact"], sv["h4"], sv["h3"],
                                      sv["h2"], sv["h1"])
            eaq, ebq, coss, xs = (sv["emb_a"], sv["emb_b"], sv["coss"],
                                  sv["xs"])
            daq, sda = quant_grad_head(dalpha)
            dlq, sdl = quant_grad_head(dlogits)
            g = {}
            g["w_out"] = mmTq(dlq, cq, sdl * sc)
            g["b_out"] = jnp.sum(dlogits, 1, keepdims=True)
            dc = mTvq(qw["w_out"][0], dlq,
                      qw["w_out"][1] * sdl) * pos(cq)
            dcq, sdc = quant_grad_hid(dc)
            g["w_col_h"] = mmTq(dcq, h4q, sdc * s4)
            g["w_col_x"] = mmTq(dcq, ebq, sdc * (1.0 / 127.0))
            g["b_col"] = jnp.sum(dc, 1, keepdims=True)
            g["w_alpha"] = mmTq(daq, h4q, sda * s4)
            g["b_alpha"] = jnp.sum(dalpha, 1, keepdims=True)
            dh4 = (mTvq(qw["w_col_h"][0], dcq, qw["w_col_h"][1] * sdc)
                   + mTvq(qw["w_alpha"][0], daq,
                          qw["w_alpha"][1] * sda)) * pos(h4q)
            dh4q, sdh4 = quant_grad_hid(dh4)
            g["w_mid2"] = mmTq(dh4q, h3q, sdh4 * s3)
            g["b_mid2"] = jnp.sum(dh4, 1, keepdims=True)
            dh3 = mTvq(qw["w_mid2"][0], dh4q,
                       qw["w_mid2"][1] * sdh4) * pos(h3q)
            dh3q, sdh3 = quant_grad_hid(dh3)
            g["w_cat_h"] = mmTq(dh3q, h2q, sdh3 * s2)
            g["w_cat_x"] = mmTq(dh3q, eaq, sdh3) * inv_ma_row
            g["b_cat"] = jnp.sum(dh3, 1, keepdims=True)
            dh2 = mTvq(qw["w_cat_h"][0], dh3q,
                       qw["w_cat_h"][1] * sdh3) * pos(h2q)
            dh2q, sdh2 = quant_grad_hid(dh2)
            g["w_mid1"] = mmTq(dh2q, h1q, sdh2 * s1)
            g["b_mid1"] = jnp.sum(dh2, 1, keepdims=True)
            dh1 = mTvq(qw["w_mid1"][0], dh2q,
                       qw["w_mid1"][1] * sdh2) * pos(h1q)
            dh1q, sdh1 = quant_grad_hid(dh1)
            g["w_in"] = mmTq(dh1q, eaq, sdh1) * inv_ma_row
            g["b_in"] = jnp.sum(dh1, 1, keepdims=True)

            demb_a = (mTvq(qw["w_in"][0], dh1q, qw["w_in"][1] * sdh1)
                      + mTvq(qw["w_cat_x"][0], dh3q,
                             qw["w_cat_x"][1] * sdh3)) * ma_col
            demb_b = mTvq(qw["w_col_x"][0], dcq,
                          qw["w_col_x"][1] * sdc) * 127.0
            dproj = jnp.where(xsrow, demb_a[0:DG], coss[0] * _PI
                              * demb_a[0:DG])
            for k in range(1, 6):
                blk = demb_a[k * DG:(k + 1) * DG] if k < 4 else \
                    demb_b[(k - 4) * DG:(k - 3) * DG]
                fq = _PI * np.float32(2.0 ** k)
                dproj = dproj + fq * coss[k] * blk
            g["dirs"] = jax.lax.dot_general(
                dproj, xs, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            return g

        def fake_grads(lobj):
            return {n: jnp.zeros(shapes[n], f32) + lobj[0, 0]
                    for n in P_NAMES}

        def iteration(it):
            """One optimisation iteration for all ``ns`` merged subgroups:
            per-subgroup forward -> merged render/loss/backward-head ->
            per-subgroup backward -> per-subgroup masked AdamW.

            ``shared`` (chunk-merge): the ns "subgroups" are consecutive
            ray chunks of ONE object group — all read parameter block 0,
            their backward grads sum, and AdamW runs once."""
            w3 = wmul_ref[0, 0] if grid_iters else wmul_ref[0, it]
            ps = [{n: view(pout_w, pout_b, n, 0 if shared else sub)
                   for n in P_NAMES}
                  for sub in range(ns)]
            # weights are constant across the iteration's chunks (AdamW
            # runs at its end): quantise once per iteration per subgroup;
            # shared (chunk-merge) subgroups alias ONE parameter block
            if q8f:
                qws = ([quant_weights(ps[0])] * ns if shared
                       else [quant_weights(ps[sub]) for sub in range(ns)])
            else:
                qws = [None] * ns
            ns_adam = 1 if shared else ns
            def adam_sub(sub, g):
                """Masked AdamW for one subgroup from its grads dict."""
                c1v = w3[3 * OG:4 * OG]                        # [OG, 1]
                c2v = w3[4 * OG:5 * OG]
                if adam_block:
                    c1w = jnp.dot(oh_wb[sub], c1v,
                                  preferred_element_type=f32)  # [RW, 1]
                    c2w = jnp.dot(oh_wb[sub], c2v,
                                  preferred_element_type=f32)
                    mf = maskf_wb[sub]
                    gw = place_rows(lambda n: g[n], CW) * mf
                    pw = pout_w[sub]
                    mw = mout_w[sub]
                    vw = vout_w[sub]
                    mn = B1 * mw + (1.0 - B1) * gw
                    vn = B2 * vw + (1.0 - B2) * gw * gw
                    if adam_rsqrt:
                        upd = (lr * (mn * c1w)
                               * jax.lax.rsqrt(jnp.maximum(vn * c2w,
                                                           EPS * EPS)))
                    else:
                        upd = lr * (mn * c1w) / (jnp.sqrt(vn * c2w) + EPS)
                    pout_w[sub] = pw - (lr * wd * pw + upd) * mf
                    mout_w[sub] = jnp.where(updb_wb[sub], mn, mw)
                    vout_w[sub] = jnp.where(updb_wb[sub], vn, vw)
                    # bias path: the per-class correction row-vectors are
                    # exact row-slices of the full-height vectors (w_in
                    # rows share b_*'s ri//h object map, w_alpha b_alpha's,
                    # w_out b_out's).
                    o_div = loc["w_in"][1]
                    o_al = loc["w_alpha"][1]
                    o_hd = loc["w_out"][1]
                    rowvecs = {
                        "div": (c1w[o_div:o_div + HG],
                                c2w[o_div:o_div + HG]),
                        "alpha": (c1w[o_al:o_al + OG],
                                  c2w[o_al:o_al + OG]),
                        "head": (c1w[o_hd:o_hd + 3 * OG],
                                 c2w[o_hd:o_hd + 3 * OG]),
                    }
                    names = [n for n in P_NAMES if n.startswith("b_")]
                else:
                    rowvecs = {m: (jnp.dot(ohs[(m, sub)], c1v,
                                           preferred_element_type=f32),
                                   jnp.dot(ohs[(m, sub)], c2v,
                                           preferred_element_type=f32))
                               for m in ("div", "dirs", "alpha", "head")}
                    names = P_NAMES
                for n in names:
                    c1r, c2r = rowvecs[cls(n)]
                    mf = maskf[sub][n]
                    ggrad = g[n] * mf
                    po = view(pout_w, pout_b, n, sub)
                    mo_ = view(mout_w, mout_b, n, sub)
                    vo = view(vout_w, vout_b, n, sub)
                    mn = B1 * mo_ + (1.0 - B1) * ggrad
                    vn = B2 * vo + (1.0 - B2) * ggrad * ggrad
                    if adam_rsqrt:
                        # 1/(sqrt(x)+EPS) -> rsqrt(max(x, EPS^2)): equal to
                        # within 2x only where vhat < 1e-16 (dead params);
                        # saves the serial f32 sqrt+divide chain per tensor.
                        upd = (lr * (mn * c1r)
                               * jax.lax.rsqrt(jnp.maximum(vn * c2r,
                                                           EPS * EPS)))
                    else:
                        upd = lr * (mn * c1r) / (jnp.sqrt(vn * c2r) + EPS)
                    store(pout_w, pout_b, n, sub,
                          po - (lr * wd * po + upd) * mf)
                    store(mout_w, mout_b, n, sub,
                          jnp.where(updb[sub][n], mn, mo_))
                    store(vout_w, vout_b, n, sub,
                          jnp.where(updb[sub][n], vn, vo))

            # sched "alt" (single-chunk banks): emit each subgroup's VPU
            # Adam right after its backward, so it sits adjacent to the
            # NEXT subgroup's MXU matmul chain in the instruction stream
            # (independent work the VLIW scheduler can overlap).
            alt = (sched == "alt" and NC == 1 and not shared
                   and not ({"render", "bwdall", "adam"} & ablate))
            gacc = None
            lacc = None
            for ch in range(NC):
                # grid_iters: the batch window already holds only this
                # iteration's chunks, so the read offset is STATIC (dynamic
                # non-minor block indexing costs O(block) in Mosaic).
                idx = ch if grid_iters else it * NC + ch
                if fwdsplit and ns > 1:
                    # emit ALL subgroups' PE phases (VPU), then the MLP
                    # matmul phases (MXU): sub k's PE sits adjacent to sub
                    # k-1's matmuls in the instruction stream — independent
                    # VPU/MXU work the VLIW scheduler can overlap (same
                    # adjacency trick as sched="alt" for Adam/backward).
                    pes = [fwd_pe(ps[sub], idx, sub) for sub in range(ns)]
                    fw = [fwd_mlp(ps[sub], pes[sub], qws[sub])
                          for sub in range(ns)]
                else:
                    fw = [fwd_chunk(ps[sub], idx, sub, qws[sub])
                          for sub in range(ns)]
                alpha, logits = fw[0][0], fw[0][1]
                for sub in range(1, ns):
                    alpha = alpha + _roll_rows(fw[sub][0], sub * G)
                    logits = logits + _roll_rows(fw[sub][1], sub * G)
                if "render" in ablate:  # profiling: fwd matmuls only
                    color = jax.nn.sigmoid(logits)
                    lobj = (jnp.sum(alpha[:, 0:1], 1, keepdims=True)
                            + jnp.sum(color[0:OG, 0:1], 1, keepdims=True))
                    gs = [fake_grads(lobj) for _ in range(ns_adam)]
                else:
                    lobj, da, dl = render_bwd(idx, w3, alpha, logits,
                                              z_ref[0, idx])
                    if "bwdall" in ablate:
                        gs = [fake_grads(lobj) for _ in range(ns_adam)]
                    elif alt:
                        loss_ref[0] = (loss_ref[0]
                                       + jnp.where(coli_og == it, lobj, 0.0))
                        for sub in range(ns):
                            g = bwd_chunk(ps[sub], fw[sub][2],
                                          _roll_rows(da, -sub * G),
                                          _roll_rows(dl, -sub * G), lobj)
                            adam_sub(sub, g)
                        return
                    else:
                        gs = [bwd_chunk(ps[sub], fw[sub][2],
                                        _roll_rows(da, -sub * G),
                                        _roll_rows(dl, -sub * G), lobj)
                              for sub in range(ns)]
                        if shared:   # chunks of one group: grads sum
                            g0 = gs[0]
                            for g2 in gs[1:]:
                                g0 = {n: g0[n] + g2[n] for n in P_NAMES}
                            gs = [g0]
                if gacc is None:
                    gacc, lacc = gs, lobj
                else:
                    gacc = [{n: a[n] + b[n] for n in P_NAMES}
                            for a, b in zip(gacc, gs)]
                    lacc = lacc + lobj
            if shared:   # per-chunk-row loss partials -> row 0 (one object)
                lacc = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (OG, 1), 0) == 0,
                    jnp.broadcast_to(jnp.sum(lacc, 0, keepdims=True),
                                     (OG, 1)), 0.0)
            loss_ref[0] = loss_ref[0] + jnp.where(coli_og == it, lacc, 0.0)

            # ---------------- masked AdamW ----------------
            if "adam" in ablate:    # profiling ablation: write grads as p
                for sub in range(ns_adam):
                    for n in P_NAMES:
                        store(pout_w, pout_b, n, sub,
                              view(pout_w, pout_b, n, sub)
                              + 1e-30 * gacc[sub][n])
                return
            for sub in range(ns_adam):
                adam_sub(sub, gacc[sub])

        # Mosaic lowers a DYNAMIC index on a non-minor block dimension as an
        # O(block)-select over the whole VMEM block (~1.8 ms/frame measured
        # on the background bank's 200 chunk reads). Two remedies:
        #   * grid_iters: iterations are a second grid dimension — batch
        #     windows are per-iteration (static reads, DMA-pipelined by
        #     Mosaic), states/loss revisit the same block and stay resident;
        #   * unroll: statically unroll the iteration loop (bigger program).
        if grid_iters:
            it = pl.program_id(1)

            @pl.when(it == 0)
            def _():
                init_state()

            iteration(it)
        elif unroll:
            for it in range(n_iter):
                iteration(it)
        else:
            jax.lax.fori_loop(0, n_iter,
                              lambda it, _: (iteration(it), 0)[1], 0)

    return kernel


# ======================================================================== #
# Entry
# ======================================================================== #


def _prepare_batch(batch: dict, scale, active, step, n_iter: int,
                   n_per: int, G: int, ns: int = 1, rt: int = R_TILE,
                   cm: int = 1, nc_pad: int | None = None, reuse: int = 1):
    """Sampler output -> kernel operand dict.

    ``reuse > 1`` (iteration-reuse sampling, core/step.py): the batch's
    PIXEL arrays (rgb/depth/state/valid/origins/dirs) cover only
    n_iter/reuse iterations' worth of distinct rays — z_sm alone is
    full-size (fresh per iteration). The od/pk operands and the wm half
    of wmul are built at that reduced iteration count and repeated along
    the ITERATION axis of the final kernel layouts (index it*NC+ch with
    it = c*NE + i <-> iteration it reads pixel block it mod NE) — the
    exact operands the pre-tiled sampler produced, built with ~reuse x
    less relayout work and no sampler-side tile
    (tests/test_sample_reuse.py asserts operand bit-equality).

    ``batch`` carries per-ray origins/dirs (world frame) and per-sample
    depths z; the kernel builds the sample points in-VMEM (o + z*d, both
    pre-divided here by the per-object PE scale).

    ``ns`` render subgroups per invocation: per-ray operands are laid out
    with MERGED dense rows sub*G+g (object slot = pair*(ns*G) + sub*G + g,
    i.e. plain slot order), while the vec3 ray operands (o, d) stay
    per-subgroup for the xs build.

    ``cm`` (chunk merge, G=1 multi-chunk banks, exclusive with ns>1):
    per-ray rows are cm CONSECUTIVE RAY CHUNKS of the same object, so the
    render section runs once per cm chunks at cm/8 sublane density instead
    of cm times at 1/8 (the background bank's NC=10 -> cm=5: 5x fewer
    full-width render/loss/backward-head ops). Per-object wmul rows are
    duplicated across the cm rows (each row carries a partial ray sum; the
    weights/normalisers are per-object constants)."""
    f32 = jnp.float32
    cap = batch["depth"].shape[0]
    if "z_sm" not in batch:   # legacy ray-major batch (tests, ad-hoc use)
        batch = dict(batch)
        batch["z_sm"] = jnp.moveaxis(batch["z"], -1, 1)
        batch["rgb_sm"] = jnp.moveaxis(batch["rgb"], -1, 1)
        batch["origins_sm"] = jnp.moveaxis(batch["origins"], -1, 1)
        batch["dirs_sm"] = jnp.moveaxis(batch["dirs"], -1, 1)
    S = batch["z_sm"].shape[1]
    assert n_iter % reuse == 0, (n_iter, reuse)
    assert reuse == 1 or cm == 1, (reuse, cm)
    NE = n_iter // reuse             # iterations' worth of distinct pixels
    ng = cap // G
    assert ng % ns == 0, (ng, ns)
    assert ns == 1 or cm == 1, (ns, cm)
    npair = ng // ns
    MG = ns * G                      # merged rows per invocation (<= OG)
    n_chunks = -(-n_per // rt)
    if nc_pad is not None:
        # pad the chunk count up with fully-masked ray chunks (state 0,
        # valid 0 -> zero grads/losses): the merged obj+bg kernel spreads
        # the bg iteration over exactly npair_obj chunk-slots per iteration.
        n_chunks = max(n_chunks, nc_pad)
    assert n_chunks % cm == 0, (n_chunks, cm)
    RP = n_chunks * rt
    XP = _rup(3 * G, 8)
    active_f = active.astype(f32)

    def pad_rays_sm(a, ni=n_iter):
        """Channel/sample-major per-ray array [cap, C, ni*n_per] ->
        [cap, C, ni, RP] (ray axis stays MINOR throughout — none of
        the layout transposes below move the lane dimension). ni is
        NE for the pixel-periodic operands under reuse."""
        a = a.reshape(cap, -1, ni, n_per)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, RP - n_per)))

    state = batch["state"].reshape(cap, NE, n_per)
    valid = batch["valid"].reshape(cap, NE, n_per)
    mask_obj = (state != 0).astype(f32)
    mask_sem = (state != 2).astype(f32)
    m_do = mask_obj * valid.astype(f32)

    # empty-batch flags + per-object normalisers (ops/losses.py:40-44)
    cnts = jnp.stack([m_do.sum(-1), mask_obj.sum(-1), mask_sem.sum(-1)])
    empty = jnp.any((cnts == 0) & active[None, :, None], axis=1)   # [3, NI]
    flag = 1.0 - empty.astype(f32)
    wm = flag[:, None, :] * active_f[None, :, None] / (cnts + 1e-10)
    wm = wm.reshape(3, npair, MG, NE).transpose(1, 3, 0, 2)  # np,NE,3,MG
    wm = jnp.pad(wm, ((0, 0), (0, 0), (0, 0), (0, OG - MG)))
    if reuse > 1:   # repeat the pixel-periodic normalisers per iteration
        wm = jnp.tile(wm, (1, reuse, 1, 1))

    # Adam per-slot factors for iteration i: t = step + i + 1
    t = (step.astype(f32)[:, None]
         + jnp.arange(1, n_iter + 1, dtype=f32)[None, :])          # [cap, NI]
    c1 = 1.0 / (1.0 - B1 ** t)
    c2 = 1.0 / (1.0 - B2 ** t)
    av = jnp.broadcast_to(active_f[:, None], t.shape)
    adamv = jnp.stack([c1, c2, av])                                 # [3,cap,NI]
    adamv = adamv.reshape(3, npair, MG, n_iter).transpose(1, 3, 0, 2)
    adamv = jnp.pad(adamv, ((0, 0), (0, 0), (0, 0), (0, OG - MG)))

    if cm > 1:
        # chunk-merge rows all belong to the same object: duplicate its
        # weights/normalisers/Adam factors across the OG rows (pad-chunk
        # rows carry zero masks, so their duplicated weights are inert).
        wm = jnp.broadcast_to(wm[..., :1], wm.shape[:3] + (OG,))
        adamv = jnp.broadcast_to(adamv[..., :1], adamv.shape[:3] + (OG,))
    wmul = jnp.concatenate([wm, adamv], axis=2)                   # np,NI,6,8
    wmul = wmul.reshape(npair, n_iter, 6 * OG, 1)

    inv_s = (1.0 / scale)[:, None, None].astype(f32)

    # One transpose chain per DEVICE LAYOUT instead of one per logical
    # operand: the round-1 layout ran 8 independent pad/reshape/transpose
    # chains (~1.7 ms/frame of op-chain latency); packing the per-ray
    # scalars into one [7*OG, rt] row-block (k*OG + merged-row, k = dep,
    # r, g, b, mask_obj, mask_sem, mask_depth) and o/d into one
    # [2*XP, rt] block turns that into 3 chains moving the same bytes.
    # Round 3: the sampler emits channel/sample-major arrays, so every
    # transpose below permutes MAJOR axes only — the ray (lane) dimension
    # never moves, which is the cheap direction for TPU relayouts.
    od = jnp.concatenate([batch["origins_sm"], batch["dirs_sm"]],
                         axis=1).astype(f32) * inv_s    # [cap, 6, NE*n_per]
    od = pad_rays_sm(od, NE)                 # [cap, 6, NE, RP]
    pkc = jnp.concatenate([
        batch["depth"].astype(f32)[:, None],
        batch["rgb_sm"].astype(f32),
        mask_obj.reshape(cap, 1, -1),
        mask_sem.reshape(cap, 1, -1),
        m_do.reshape(cap, 1, -1),
    ], axis=1)                               # [cap, 7, NE*n_per]
    pkc = pad_rays_sm(pkc, NE)               # [cap, 7, NE, RP]
    zp = pad_rays_sm(batch["z_sm"])          # [cap, S, NI, RP] (z is fresh)

    if cm == 1:
        od = od.reshape(ng, G, 2, 3, NE, n_chunks, rt)
        od = od.transpose(0, 4, 5, 2, 1, 3, 6)   # ng,NE,NC,2,G,3,rt
        od = od.reshape(ng, NE, n_chunks, 2, 3 * G, rt)
        od = jnp.pad(od, ((0, 0),) * 4 + ((0, XP - 3 * G), (0, 0)))
        od = od.reshape(ng, NE * n_chunks, 2 * XP, rt)
        if reuse > 1:
            od = jnp.tile(od, (1, reuse, 1, 1))

        z = zp.reshape(npair, MG, S, n_iter, n_chunks, rt)
        z = z.transpose(0, 3, 4, 1, 2, 5)        # np,NI,NC,MG,S,rt
        z = z.reshape(npair, n_iter, n_chunks, MG, S * rt)
        z = jnp.pad(z, ((0, 0),) * 3 + ((0, OG - MG), (0, 0)))
        z = z.reshape(npair, n_iter * n_chunks, OG, S * rt)

        pk = pkc.reshape(npair, MG, 7, NE, n_chunks, rt)
        pk = pk.transpose(0, 3, 4, 2, 1, 5)      # np,NE,NC,7,MG,rt
        pk = jnp.pad(pk, ((0, 0),) * 4 + ((0, OG - MG), (0, 0)))
        pk = pk.reshape(npair, NE * n_chunks, 7 * OG, rt)
        if reuse > 1:
            pk = jnp.tile(pk, (1, reuse, 1, 1))
        nc_out = n_chunks
    else:
        # chunk-merge layout (G=1): per-ray rows = cm consecutive chunks
        # of the same object; the per-merge chunk index r rides the
        # LEADING (subgroup) axis of od, exactly like ns-subgroups do.
        NM = n_chunks // cm
        od = od.reshape(ng, 2, 3, n_iter, NM, cm, rt)
        od = od.transpose(0, 5, 3, 4, 1, 2, 6)   # ng,cm,NI,NM,2,3,rt
        od = od.reshape(ng, cm, n_iter, NM, 2, 3, rt)
        od = jnp.pad(od, ((0, 0),) * 4 + ((0, 0), (0, XP - 3), (0, 0)))
        od = od.reshape(ng * cm, n_iter * NM, 2 * XP, rt)

        z = zp.reshape(ng, S, n_iter, NM, cm, rt)
        z = z.transpose(0, 2, 3, 4, 1, 5)        # ng,NI,NM,cm,S,rt
        z = z.reshape(ng, n_iter, NM, cm, S * rt)
        z = jnp.pad(z, ((0, 0),) * 3 + ((0, OG - cm), (0, 0)))
        z = z.reshape(ng, n_iter * NM, OG, S * rt)

        pk = pkc.reshape(ng, 7, n_iter, NM, cm, rt)
        pk = pk.transpose(0, 2, 3, 1, 4, 5)      # ng,NI,NM,7,cm,rt
        pk = jnp.pad(pk, ((0, 0),) * 4 + ((0, OG - cm), (0, 0)))
        pk = pk.reshape(ng, n_iter * NM, 7 * OG, rt)
        nc_out = NM

    return {
        "od": od, "z": z, "pk": pk, "wmul": wmul,
        "n_chunks": nc_out, "S": S, "XP": XP, "ng": ng, "ns": ns,
        "cm": cm,
    }


def pick_rt(G: int, h: int, ng: int, n_per: int, S: int) -> int:
    """Ray-tile (lane) width per chunk. Default 128 everywhere: widening
    the background bank's tile (1200 rays/iter -> rt 640/1280, fewer
    chunks per iteration) was measured NEUTRAL-to-worse on v5e (3.55 ms at
    rt=128 vs 3.80/3.66 at 640/1280, scripts/bench_bg_ab.py) — the bg
    kernel's gap to its matmul floor is NOT per-chunk glue. The knob stays
    for experiments: VMAP_RT overrides (exactness-tested at rt=256)."""
    import os
    env = os.environ.get("VMAP_RT")
    if env is not None:
        return int(env)
    return R_TILE


def pick_cm(G: int, ng: int, n_chunks: int) -> int:
    """Chunk-merge factor for G=1 multi-chunk banks: the render/loss/
    backward-head section of a G=1 group uses 1 of 8 sublane rows; merging
    cm consecutive ray chunks into rows runs it once per cm chunks at cm/8
    density. Largest divisor of n_chunks <= 8 (the background's NC=10 ->
    cm=5: 2 render sections per iteration instead of 10). VMAP_CM
    overrides (1 disables)."""
    import os
    env = os.environ.get("VMAP_CM")
    if env is not None:
        return int(env)
    if G != 1 or n_chunks <= 1:
        return 1
    return max(d for d in range(1, OG + 1) if n_chunks % d == 0)


def pick_ns(G: int, h: int, ng: int, n_per: int,
            rt: int = R_TILE) -> int:
    """Render subgroups per invocation: merge ns = OG/G groups' per-ray
    rows to full sublane density for the render/loss section (see
    _make_kernel). Restricted to single-chunk banks (the object bank;
    multi-chunk G=1 banks keep ns=1 for now) and bounded by a VMEM
    estimate; env VMAP_NS overrides for experiments."""
    import os
    n_chunks = -(-n_per // rt)
    ns = OG // G if OG % G == 0 else 1
    if n_chunks > 1:
        ns = 1
    while ns > 1 and ng % ns:
        ns //= 2
    env_ns = os.environ.get("VMAP_NS")
    if env_ns is not None:
        ns = max(g for g in range(1, int(env_ns) + 1)
                 if ng % g == 0 and g <= (OG // G))
    _, RW, CW, RB = packed_layout(G, h)
    state_bytes = 6 * (RW * CW + RB * 128) * 4
    budget = 100 * 1024 * 1024
    while ns > 1 and ns * 4 * state_bytes > budget:
        ns //= 2
    return ns


@flax.struct.dataclass
class PreparedBank:
    """A bank held persistently in the kernel's prepared block layout.

    The training path converts a ``BankState`` to this form ONCE (and back
    only for meshing / eval / checkpointing): the prepare/unprepare scatter
    transforms cost ~6 ms/frame at the 100-object workload when done per
    frame. Each state (p/m/v) is the PACKED (wide, bias) buffer pair of
    ``packed_layout`` — 6 device buffers total, so donation stays cheap
    and the kernel sees 12 param operands instead of 102.
    """
    p: tuple
    m: tuple
    v: tuple
    step: jax.Array    # [cap]
    active: jax.Array  # [cap]
    scale: jax.Array   # [cap]
    spec: object = flax.struct.field(pytree_node=False)
    G: int = flax.struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.active.shape[0]


def prepare_bank(bank: BankState, G: int) -> PreparedBank:
    h = bank.spec.hidden
    return PreparedBank(
        p=pack_state(prepare_params(bank.flat, bank.spec, G,
                                    with_identity=True), G, h),
        m=pack_state(prepare_params(bank.m, bank.spec, G,
                                    with_identity=False), G, h),
        v=pack_state(prepare_params(bank.v, bank.spec, G,
                                    with_identity=False), G, h),
        step=bank.step, active=bank.active, scale=bank.scale,
        spec=bank.spec, G=G)


def unprepare_bank(pb: PreparedBank) -> BankState:
    h = pb.spec.hidden
    return BankState(
        flat=unprepare_params(unpack_state(pb.p, pb.G, h), pb.spec, pb.G),
        m=unprepare_params(unpack_state(pb.m, pb.G, h), pb.spec, pb.G),
        v=unprepare_params(unpack_state(pb.v, pb.G, h), pb.spec, pb.G),
        step=pb.step, active=pb.active, scale=pb.scale, spec=pb.spec)


def fused_frame_prepared(pb: PreparedBank, batch: dict, n_iter: int,
                         n_per: int, lr: float, wd: float,
                         color_scaling: float = 5.0,
                         opacity_scaling: float = 10.0,
                         bf16: bool | str = True,
                         interpret: bool | None = None,
                         _ablate: frozenset = frozenset(),
                         reuse: int = 1):
    """One frame's full optimisation of a prepared bank in one pallas_call.

    batch: sampler output ({rgb, depth, state, valid, z, origins, dirs},
    rays iteration-major, ``n_per`` rays per iteration). Returns
    (updated PreparedBank, per-slot per-iteration losses [cap, n_iter]).

    ``bf16`` is the matmul dtype policy (see ``_mm_policy``): False/"f32",
    True/"bf16", or "bwd_bf16" (f32 forward, bf16 backward matmuls).

    ``reuse > 1``: the batch's pixel arrays are UNTILED (n_iter/reuse
    iterations' worth; sampler called with tile_pixels=False) and z_sm is
    full-size — _prepare_batch repeats the pixel operands along the
    iteration axis of the kernel layouts (see its docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G = pb.G
    cap = pb.capacity
    h = pb.spec.hidden
    assert cap % G == 0, (cap, G)
    assert n_iter <= R_TILE, n_iter   # loss columns (rt >= R_TILE)
    ng = cap // G
    shapes = group_layout(G, h)
    f32 = jnp.float32

    loc, RW, CW, RB = packed_layout(G, h)
    rt = pick_rt(G, h, ng, n_per, batch["z_sm"].shape[1]
                 if "z_sm" in batch else batch["z"].shape[-1])
    ns = pick_ns(G, h, ng, n_per, rt)
    cm = pick_cm(G, ng, -(-n_per // rt)) if ns == 1 else 1
    b = _prepare_batch(batch, pb.scale, pb.active, pb.step, n_iter, n_per,
                       G, ns, rt, cm, reuse=reuse)
    S, n_chunks, XP = b["S"], b["n_chunks"], b["XP"]
    NI, NC = n_iter, n_chunks          # NC = merge groups/iter when cm > 1
    shared = cm > 1
    nsk = cm if shared else ns         # kernel row-merge width
    npair = ng // ns
    T = S * rt

    import os
    unroll = os.environ.get("VMAP_UNROLL", "0") == "1"
    # iterations as a second grid dimension for multi-chunk (G=1) banks:
    # their per-iteration batch slabs are big (NC chunks), so per-iteration
    # windows both kill the dynamic-read cost and let Mosaic DMA-pipeline
    # the batch stream. Single-chunk banks keep the in-kernel loop (grid
    # invocation overhead ~4-6 us would exceed their read cost).
    env_gi = os.environ.get("VMAP_GRID_ITERS", "1")
    grid_iters = (not unroll
                  and (env_gi == "force"
                       or ((NC > 1 or rt > R_TILE) and env_gi == "1")))
    kernel = _make_kernel(G, h, S, NI, NC, lr, wd,
                          color_scaling, opacity_scaling, bf16, _ablate,
                          ns=nsk, unroll=unroll, grid_iters=grid_iters,
                          lanemix=os.environ.get("VMAP_LANEMIX", "vpu"),
                          adam_rsqrt=os.environ.get("VMAP_ADAM_RSQRT",
                                                    "1") == "1",
                          sched=os.environ.get("VMAP_SCHED", "alt"),
                          rt=rt, shared=shared,
                          fwdsplit=os.environ.get("VMAP_FWDSPLIT",
                                                  "1") == "1",
                          # poly sincos: ~1e-6-exact, -11% object-kernel
                          # time on v5e (8.44 -> 7.47 ms); the fast sigmoid
                          # measured NEUTRAL-to-worse (XLA's logistic is
                          # already cheap on TPU) so it stays opt-in.
                          sincos=os.environ.get("VMAP_SINCOS", "poly"),
                          sigmoid=os.environ.get("VMAP_SIGMOID", "exact"),
                          adam_block=os.environ.get("VMAP_ADAM",
                                                    "name") == "block",
                          render_packed=os.environ.get("VMAP_RENDER",
                                                       "base") == "packed",
                          # z-row replication via sublane broadcast instead
                          # of a [XP, OG] matmul: 7.95 -> 7.59 ms obj kernel
                          # on v5e (the kernel is MXU-bound; round-3 A/B)
                          zb_mode=os.environ.get("VMAP_ZB", "vpu"),
                          alias=os.environ.get("VMAP_ALIAS", "0") == "1")

    if grid_iters:
        grid = (npair, NI)
        gmap = {"state": lambda g, it: (g, 0, 0),
                "batch": lambda g, it: (g, it, 0, 0),
                "loss": lambda g, it: (g, 0, 0)}
        nb = NC            # batch window: this iteration's chunks only
        nw = 1
    else:
        grid = (npair,)
        gmap = {"state": lambda g: (g, 0, 0),
                "batch": lambda g: (g, 0, 0, 0),
                "loss": lambda g: (g, 0, 0)}
        nb = NI * NC
        nw = NI

    def pspec(shape):
        return pl.BlockSpec((1 if shared else ns,) + shape, gmap["state"],
                            memory_space=pltpu.VMEM)

    def bspec(shape):
        """Per-subgroup ray stream (o, d): leading axis = group (ns-merge)
        or chunk-within-merge (cm-merge)."""
        return pl.BlockSpec((nsk, nb) + shape, gmap["batch"],
                            memory_space=pltpu.VMEM)

    def mspec(shape):
        """Merged per-ray operands: one dense row-block per invocation."""
        return pl.BlockSpec((1, nb) + shape, gmap["batch"],
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((1, nw, 6 * OG, 1), gmap["batch"],
                         memory_space=pltpu.VMEM)

    param_specs = [pspec((RW, CW)), pspec((RB, 128))]
    in_specs = (param_specs * 3
                + [bspec((2 * XP, rt)), mspec((OG, T)),
                   mspec((7 * OG, rt)), wspec])
    out_specs = (param_specs * 3
                 + [pl.BlockSpec((1, OG, rt), gmap["loss"],
                                 memory_space=pltpu.VMEM)])
    state_shapes = [jax.ShapeDtypeStruct((ng, RW, CW), f32),
                    jax.ShapeDtypeStruct((ng, RB, 128), f32)]
    out_shape = state_shapes * 3 + [jax.ShapeDtypeStruct((npair, OG, rt),
                                                         f32)]

    alias = os.environ.get("VMAP_ALIAS", "0") == "1"
    outs = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
        input_output_aliases=({i: i for i in range(6)} if alias else {}),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            # params+moments x6 + a group's full-frame ray blocks exceed the
            # 16 MiB default scoped-vmem budget; v5e has 128 MiB VMEM.
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*pb.p, *pb.m, *pb.v, b["od"], b["z"], b["pk"], b["wmul"])

    new_pb = pb.replace(
        p=tuple(outs[0:2]), m=tuple(outs[2:4]), v=tuple(outs[4:6]),
        step=jnp.where(pb.active, pb.step + n_iter, pb.step),
    )
    loss_out = outs[6]                                       # [npair, OG, 128]
    losses = loss_out[:, :ns * G, :n_iter].reshape(cap, n_iter)
    return new_pb, losses


def fused_bank_frame(bank: BankState, batch: dict, n_iter: int, n_per: int,
                     G: int, lr: float, wd: float,
                     color_scaling: float = 5.0,
                     opacity_scaling: float = 10.0,
                     bf16: bool | str = False,
                     interpret: bool | None = None,
                     reuse: int = 1):
    """Flat-bank convenience wrapper: prepare -> fused frame -> unprepare.

    The product path holds banks prepared across frames and calls
    ``fused_frame_prepared`` directly; this wrapper serves tests and
    one-shot use. ``batch`` needs origins/dirs (world rays); a legacy
    ``pts`` key is accepted and decomposed is NOT supported — sampler
    emits rays.
    """
    pb = prepare_bank(bank, G)
    pb, losses = fused_frame_prepared(
        pb, batch, n_iter, n_per, lr, wd, color_scaling, opacity_scaling,
        bf16, interpret, reuse=reuse)
    return unprepare_bank(pb), losses


def _activate_prepared_j(pb: PreparedBank, group: jax.Array, j: int,
                         fresh_flat: jax.Array, scale, slot) -> PreparedBank:
    """Scatter one freshly initialised object's params into group ``group``
    at intra-group position ``j`` (static), zeroing its Adam moments."""
    h = pb.spec.hidden
    idx = _prep_indices(pb.G, h)
    loc, RW, CW, RB = packed_layout(pb.G, h)
    pe, mlp = pb.spec.unflatten(fresh_flat)
    src = _source_views(pe, mlp)
    G = pb.G

    # object j's packed scatter coordinates + the fresh value vector
    rr_w, cc_w, rr_b, cc_b, w_srcs, b_srcs = [], [], [], [], [], []
    for name in P_NAMES:
        rows, cols, sshape = idx[name]
        rr = np.broadcast_to(rows, (G,) + sshape)[j].reshape(-1)
        cc = np.broadcast_to(cols, (G,) + sshape)[j].reshape(-1)
        kind, off, r, c = loc[name]
        if kind == "w":
            rr_w.append(rr + off)
            cc_w.append(cc)
            w_srcs.append(name)
        else:
            rr_b.append(rr)
            cc_b.append(np.full_like(cc, c))
            b_srcs.append(name)

    def scatter(state, vals_w, vals_b):
        wide, bias = state
        cur_w = jax.lax.dynamic_index_in_dim(wide, group, 0, keepdims=False)
        cur_b = jax.lax.dynamic_index_in_dim(bias, group, 0, keepdims=False)
        cur_w = cur_w.at[np.concatenate(rr_w), np.concatenate(cc_w)].set(
            vals_w)
        cur_b = cur_b.at[np.concatenate(rr_b), np.concatenate(cc_b)].set(
            vals_b)
        return (jax.lax.dynamic_update_index_in_dim(wide, cur_w, group, 0),
                jax.lax.dynamic_update_index_in_dim(bias, cur_b, group, 0))

    vals_w = jnp.concatenate([src[n].reshape(-1) for n in w_srcs])
    vals_b = jnp.concatenate([src[n].reshape(-1) for n in b_srcs])
    return pb.replace(
        p=scatter(pb.p, vals_w, vals_b),
        m=scatter(pb.m, 0.0 * vals_w, 0.0 * vals_b),
        v=scatter(pb.v, 0.0 * vals_w, 0.0 * vals_b),
        step=pb.step.at[slot].set(0),
        active=pb.active.at[slot].set(True),
        scale=pb.scale.at[slot].set(scale))


@lru_cache(maxsize=32)
def _activate_prepared_jit(G: int, hidden: int, j: int):
    from vmap_tpu.core.bank import _fresh_flat, BankSpec
    spec = BankSpec.create(hidden)

    def fn(pb, group, key, scale, slot):
        fresh = _fresh_flat(key, spec)
        return _activate_prepared_j(pb, group, j, fresh, scale, slot)

    return jax.jit(fn, donate_argnums=(0,))


def activate_slot_prepared(pb: PreparedBank, slot: int, key: jax.Array,
                           scale) -> PreparedBank:
    """Prepared-layout counterpart of bank.activate_slot (host-level ``slot``;
    compiles at most G kernel variants)."""
    g, j = divmod(int(slot), pb.G)
    fn = _activate_prepared_jit(pb.G, pb.spec.hidden, j)
    return fn(pb, jnp.int32(g), key, jnp.float32(scale), jnp.int32(slot))
