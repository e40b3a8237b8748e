"""Merged object+background train-frame kernel: ONE pallas_call per frame,
with the background's instruction stream interleaved at OP granularity into
the object iteration's complementary compute phases.

Round-2 profiling (scripts/microbench_overlap.py) measured that two
INDEPENDENT MXU/VPU dependency chains emission-interleaved inside one
Pallas body overlap almost perfectly on v5e (overlap fraction 0.95: the
pair costs ~max(vpu, mxu), not the sum). The object bank's kernel is
VPU-bound (render/loss/Adam/PE ladder) while the background bank's
(hidden 128, dense [128, 128] tiles) is MXU-bound — run separately they
serialise; merged, the background's matmul chain hides under the object
kernel's VPU sections and vice versa.

v1 of this kernel (round 2) emitted the two workloads as adjacent phase
SLABS and measured ~1 ms SLOWER than two kernels: the Mosaic/LLO scheduler
does not hoist ops across whole foreign slabs, and the bg batch was read
with dynamic block indices (O(block) vector selects, ~1.8 ms/frame — the
separate bg kernel gets static grid_iters reads + Mosaic DMA pipelining).
This v2 fixes both failure modes:

  * **Op-granularity interleave.** The background chunk's computation is a
    Python GENERATOR (``_bg_steps``) that yields after each small op group;
    the object iteration ``pump()``s it at its phase seams, so each bg MXU
    op group is emitted *inside* an object VPU section (render, Adam) and
    each bg VPU group (PE ladder, render) inside an object MXU section
    (MLP forward, backward matmuls) — the exact emission pattern the
    overlap microbench validated.
  * **Explicit double-buffered DMA.** The bg ray batch stays in HBM
    (``memory_space=ANY``); each iteration prefetches the next chunk's
    three slabs (od/z/pk, ~90 KB) into VMEM scratch with
    ``pltpu.make_async_copy`` while the current chunk computes. No dynamic
    block reads, no O(block) selects, and the copy hides under compute.

Schedule: grid (npair_obj,) — invocation ``g`` runs object pair ``g``'s
full ``n_iter``-iteration optimisation (exactly kernels/train_step.py),
and each object iteration additionally advances the background by ONE
128-ray chunk. The global background chunk counter k = g*n_iter + it walks
chunks in order; with the background's chunks-per-iteration padded to
exactly npair_obj (pad chunks carry zero masks -> exactly zero grads and
losses), background iteration boundaries fall at k % npair == npair-1,
where a masked AdamW step consumes the VMEM-scratch gradient accumulator.
Background state blocks use a grid-constant index map (resident across
invocations, written back once); its per-chunk gradients accumulate in
scratch across invocation boundaries (TPU grids execute sequentially).

Semantics are identical to running kernels/train_step.py on each bank
(tests/test_merged_kernel.py checks both against the XLA reference path):
the reference behaviour being matched is /root/reference/train.py:270-326
training the object models and the background model in the same frame loop.

The fast-math defaults mirror train_step.py (poly sincos seed, rsqrt
AdamW); matmul policy is f32 (bf16 measured neutral on v5e — TPU runs f32
dots at bf16 single-pass rate here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmap_tpu.kernels.train_step import (
    B1, B2, DPG, EPS, OG, P_NAMES, R_TILE, PreparedBank, _prepare_batch,
    _rup, group_layout, packed_layout, pick_ns, sincos_pi_poly)

_PI = np.float32(np.pi)
f32 = jnp.float32


class _Cfg:
    """Static layout table for one bank inside the merged kernel."""

    def __init__(self, G: int, h: int, S: int, rt: int, ns: int):
        self.G, self.h, self.S, self.rt, self.ns = G, h, S, rt, ns
        self.HG = G * h
        self.DG = DPG * G
        self.XP = _rup(3 * G, 8)
        self.T = S * rt
        self.shapes = group_layout(G, h)
        self.loc, self.RW, self.CW, self.RB = packed_layout(G, h)
        self.wide_names = [n for n in P_NAMES if not n.startswith("b_")]
        self.bias_names = [n for n in P_NAMES if n.startswith("b_")]
        self.wrows = sum(self.shapes[n][0] for n in self.wide_names)


def _blockmask(c: _Cfg, name: str):
    """Structural validity mask of one prepared block (same semantics as
    train_step.py's in-kernel blockmask)."""
    r, cl = c.shapes[name]
    ri = jax.lax.broadcasted_iota(jnp.int32, (r, cl), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (r, cl), 1)
    G, h, DG = c.G, c.h, c.DG
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
    return jnp.ones((r, cl), bool)


def _cls(n: str) -> str:
    if n == "dirs":
        return "dirs"
    if n in ("w_alpha", "b_alpha"):
        return "alpha"
    if n in ("w_out", "b_out"):
        return "head"
    return "div"


def _expand_oh(c: _Cfg, rows: int, mode: str, sub: int):
    """Per-row -> merged-object-column one-hot for Adam scalar expansion."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    if mode == "dirs":
        ro = ri // DPG
    elif mode == "head":
        ro = ri % OG
    elif mode == "alpha":
        ro = ri
    else:
        ro = ri // c.h
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, OG), 1)
    return (ro + sub * c.G == ci).astype(f32)


def _place_rows(c: _Cfg, piece, width: int):
    """Assemble [RW, width] from per-wide-name pieces in packed row order
    (cols zero-padded to ``width``)."""
    pieces = []
    for n in c.wide_names:
        p_ = piece(n)
        if p_.shape[1] < width:
            p_ = jnp.concatenate(
                [p_, jnp.zeros((p_.shape[0], width - p_.shape[1]),
                               p_.dtype)], 1)
        pieces.append(p_)
    if c.wrows < c.RW:
        pieces.append(jnp.zeros((c.RW - c.wrows, width), pieces[0].dtype))
    return jnp.concatenate(pieces, 0)


def _place_bias(c: _Cfg, piece):
    """Assemble [RB, 128] with the 7 bias grads as columns 0..6."""
    cols = []
    for n in c.bias_names:
        p_ = piece(n)                                   # [r, 1]
        if p_.shape[0] < c.RB:
            p_ = jnp.concatenate(
                [p_, jnp.zeros((c.RB - p_.shape[0], 1), p_.dtype)], 0)
        cols.append(p_)
    cols.append(jnp.zeros((c.RB, 128 - len(cols)), cols[0].dtype))
    return jnp.concatenate(cols, 1)


def _make_merged_kernel(co: _Cfg, cb: _Cfg, NI: int, NCb: int,
                        lr: float, wd: float, cs: float, osc: float,
                        sincos: str, adam_rsqrt: bool):
    """Kernel body: object pair per invocation + one bg chunk per object
    iteration, bg ops pumped into the object phases. See module docstring."""

    def mm(w, x):
        return jnp.dot(w, x, preferred_element_type=f32)

    def mmT(a, b):      # [m,T] x [k,T] -> [m,k], contract T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def mTv(w, dy):     # [m,k] x [m,T] -> [k,T], contract m
        return jax.lax.dot_general(
            w, dy, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def tile(c, a, s):
        return a[:, s * c.rt:(s + 1) * c.rt]

    def lane_sum(c, x):
        acc = tile(c, x, 0)
        for s in range(1, c.S):
            acc = acc + tile(c, x, s)
        return acc

    def bcast(c, x):
        return jnp.concatenate([x] * c.S, 1)

    def rep3(x):
        return jnp.concatenate([x, x, x], 0)

    def sum3(x):
        return x[0:OG] + x[OG:2 * OG] + x[2 * OG:3 * OG]

    def roll_rows(x, k: int):
        if k == 0:
            return x
        k = k % x.shape[0]
        return jnp.concatenate([x[x.shape[0] - k:], x[:x.shape[0] - k]], 0)

    def kernel(*refs):
        in_o = refs[0:6]
        in_b = refs[6:12]
        od_o, z_o, pk_o, wm_o = refs[12:16]
        od_bh, z_bh, pk_bh, wm_b = refs[16:20]   # od/z/pk in HBM (ANY)
        out_o = refs[20:26]
        out_b = refs[26:32]
        loss_o, loss_b = refs[32], refs[33]
        gw_s, gb_s = refs[34], refs[35]
        od_s, z_s, pk_s = refs[36], refs[37], refs[38]   # [2, ...] buffers
        sems = refs[39]                                  # DMA sems [2, 3]
        po_w, po_b, mo_w, mo_b, vo_w, vo_b = out_o
        pb_w, pb_b, mb_w, mb_b, vb_w, vb_b = out_b

        g_id = pl.program_id(0)

        def bg_dmas(k, slot):
            """The three async copies moving bg chunk ``k``'s slabs from
            HBM into double-buffer ``slot``."""
            return (
                pltpu.make_async_copy(od_bh.at[0, k], od_s.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(z_bh.at[0, k], z_s.at[slot],
                                      sems.at[slot, 1]),
                pltpu.make_async_copy(pk_bh.at[0, k], pk_s.at[slot],
                                      sems.at[slot, 2]),
            )

        for dst, src in zip(out_o, in_o):
            dst[:] = src[:]
        loss_o[:] = jnp.zeros_like(loss_o)

        @pl.when(g_id == 0)
        def _():
            for dst, src in zip(out_b, in_b):
                dst[:] = src[:]
            loss_b[:] = jnp.zeros_like(loss_b)

        # warm-up: start the invocation's first bg chunk copy (slot 0)
        for d in bg_dmas(g_id * NI, 0):
            d.start()

        def view(c, wref, bref, n, gg):
            kind, off, r, cl = c.loc[n]
            if kind == "w":
                return wref[gg, off:off + r, 0:cl]
            return bref[gg, 0:r, cl:cl + 1]

        def store(c, wref, bref, n, gg, val):
            kind, off, r, cl = c.loc[n]
            if kind == "w":
                wref[gg, off:off + r, 0:cl] = val
            else:
                bref[gg, 0:r, cl:cl + 1] = val

        def zbmat(c, sub):
            zri = jax.lax.broadcasted_iota(jnp.int32, (c.XP, OG), 0)
            zci = jax.lax.broadcasted_iota(jnp.int32, (c.XP, OG), 1)
            return ((zri // 3 + sub * c.G == zci)
                    & (zri < 3 * c.G)).astype(f32)

        coli_og = jax.lax.broadcasted_iota(jnp.int32, (OG, co.rt), 1)

        # ------------ per-bank forward / render / backward ------------

        def fwd_pe(c, o, d, z, p, sub):
            zb = jnp.dot(zbmat(c, sub), z, preferred_element_type=f32)
            xs = jnp.concatenate(
                [o + tile(c, zb, s) * d for s in range(c.S)], 1)
            proj = jnp.dot(p["dirs"], xs, preferred_element_type=f32)
            if sincos == "poly":
                s0, c0 = sincos_pi_poly(proj)
            else:
                s0, c0 = jnp.sin(proj * _PI), jnp.cos(proj * _PI)
            sins, coss = [s0], [c0]
            for _ in range(5):
                s_, c_ = sins[-1], coss[-1]
                sins.append(2.0 * s_ * c_)
                coss.append(1.0 - 2.0 * s_ * s_)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (c.DG, 1), 0)
            xsrow = (rowi % DPG) >= 21
            band0 = jnp.where(xsrow, proj, sins[0])
            emb_a = jnp.concatenate([band0, sins[1], sins[2], sins[3]], 0)
            emb_b = jnp.concatenate([sins[4], sins[5]], 0)
            return xs, coss, emb_a, emb_b

        def fwd_mlp(c, p, pe_out):
            xs, coss, emb_a, emb_b = pe_out
            h1 = jax.nn.relu(mm(p["w_in"], emb_a) + p["b_in"])
            h2 = jax.nn.relu(mm(p["w_mid1"], h1) + p["b_mid1"])
            h3 = jax.nn.relu(mm(p["w_cat_h"], h2) + mm(p["w_cat_x"], emb_a)
                             + p["b_cat"])
            h4 = jax.nn.relu(mm(p["w_mid2"], h3) + p["b_mid2"])
            alpha = (mm(p["w_alpha"], h4) + p["b_alpha"]) * 10.0
            cact = jax.nn.relu(mm(p["w_col_h"], h4)
                               + mm(p["w_col_x"], emb_b) + p["b_col"])
            logits = mm(p["w_out"], cact) + p["b_out"]
            saved = {"xs": xs, "coss": coss, "emb_a": emb_a,
                     "emb_b": emb_b, "h1": h1, "h2": h2, "h3": h3,
                     "h4": h4, "cact": cact}
            return alpha, logits, saved

        def render_fwd(c, pk, w3, alpha, logits, z):
            """Render + masked losses (semantics of ops/losses.py, matching
            /root/reference/train.py:295-306). Returns (lobj, residual
            pack) — backward-to-(dalpha, dlogits) split out so bg ops can
            pump between the halves."""
            color = jax.nn.sigmoid(logits)
            occ = jax.nn.sigmoid(alpha)
            free = jnp.maximum(1.0 - occ + 1e-10, 1e-10)
            cp = jnp.ones((OG, c.rt), f32)
            cps = []
            for s in range(c.S):
                cps.append(cp)
                cp = cp * tile(c, free, s)
            cp_full = jnp.concatenate(cps, 1)
            terms = occ * cp_full
            terms3 = rep3(terms)
            RD = lane_sum(c, terms * z)
            RO = lane_sum(c, terms)
            RC3 = lane_sum(c, terms3 * color)
            RD_b = bcast(c, RD)
            var = lane_sum(c, terms * (z - RD_b) ** 2)
            info = 1.0 / (jnp.sqrt(var) + 1e-4)

            dep = pk[0:OG]
            gtc = pk[OG:4 * OG]
            mo = pk[4 * OG:5 * OG]
            msm = pk[5 * OG:6 * OG]
            md = pk[6 * OG:7 * OG]
            w_d, w_c, w_o = w3[0:OG], w3[OG:2 * OG], w3[2 * OG:3 * OG]

            res_d = RD - dep
            res_o = RO - mo
            res_c3 = RC3 - gtc
            mo3 = rep3(mo)
            lc_obj = sum3(jnp.abs(res_c3) * mo3)
            ld = jnp.sum(jnp.abs(res_d) * md * info, 1, keepdims=True) * w_d
            lc = jnp.sum(lc_obj, 1, keepdims=True) * w_c
            lo = jnp.sum(jnp.abs(res_o) * msm, 1, keepdims=True) * w_o
            lobj = ld + cs * lc + osc * lo
            resid = (color, occ, free, cp_full, terms, terms3,
                     res_d, res_o, res_c3, mo3, msm, md, info,
                     w_d, w_c, w_o)
            return lobj, resid

        def render_head_bwd(c, resid, z):
            """Backward from the masked losses to (dalpha, dlogits)."""
            (color, occ, free, cp_full, terms, terms3,
             res_d, res_o, res_c3, mo3, msm, md, info,
             w_d, w_c, w_o) = resid
            dRD = jnp.sign(res_d) * md * info * w_d
            dRO = jnp.sign(res_o) * msm * (w_o * osc)
            w_c3 = rep3(w_c * cs)
            dRC3 = jnp.sign(res_c3) * mo3 * w_c3
            dRC3_b = bcast(c, dRC3)
            dterm = (bcast(c, dRD) * z + bcast(c, dRO)
                     + sum3(dRC3_b * color))
            tt = dterm * terms
            suf = jnp.zeros((OG, c.rt), f32)
            sufs = [None] * c.S
            for s in range(c.S - 1, -1, -1):
                sufs[s] = suf
                suf = suf + tile(c, tt, s)
            suf_full = jnp.concatenate(sufs, 1)
            docc = dterm * cp_full - suf_full / free
            dalpha = docc * occ * (1.0 - occ) * 10.0
            dcolor = dRC3_b * terms3
            dlogits = dcolor * color * (1.0 - color)
            return dalpha, dlogits

        def render_bwd(c, pk, w3, alpha, logits, z, pump=None):
            lobj, resid = render_fwd(c, pk, w3, alpha, logits, z)
            if pump:
                pump()
            da, dl = render_head_bwd(c, resid, z)
            return lobj, da, dl

        def bwd_chunk(c, p, sv, dalpha, dlogits, pump=None):
            """Backward matmul chain; ``pump`` (if given) is called between
            layer groups so foreign VPU ops land inside this MXU section."""
            cact, h4, h3, h2, h1 = (sv["cact"], sv["h4"], sv["h3"],
                                    sv["h2"], sv["h1"])
            emb_a, emb_b, coss, xs = (sv["emb_a"], sv["emb_b"], sv["coss"],
                                      sv["xs"])

            def tick():
                if pump:
                    pump()

            g = {}
            g["w_out"] = mmT(dlogits, cact)
            g["b_out"] = jnp.sum(dlogits, 1, keepdims=True)
            dc = mTv(p["w_out"], dlogits) * (cact > 0)
            tick()
            g["w_col_h"] = mmT(dc, h4)
            g["w_col_x"] = mmT(dc, emb_b)
            g["b_col"] = jnp.sum(dc, 1, keepdims=True)
            g["w_alpha"] = mmT(dalpha, h4)
            g["b_alpha"] = jnp.sum(dalpha, 1, keepdims=True)
            dh4 = (mTv(p["w_col_h"], dc)
                   + mTv(p["w_alpha"], dalpha)) * (h4 > 0)
            tick()
            g["w_mid2"] = mmT(dh4, h3)
            g["b_mid2"] = jnp.sum(dh4, 1, keepdims=True)
            dh3 = mTv(p["w_mid2"], dh4) * (h3 > 0)
            tick()
            g["w_cat_h"] = mmT(dh3, h2)
            g["w_cat_x"] = mmT(dh3, emb_a)
            g["b_cat"] = jnp.sum(dh3, 1, keepdims=True)
            dh2 = mTv(p["w_cat_h"], dh3) * (h2 > 0)
            tick()
            g["w_mid1"] = mmT(dh2, h1)
            g["b_mid1"] = jnp.sum(dh2, 1, keepdims=True)
            dh1 = mTv(p["w_mid1"], dh2) * (h1 > 0)
            tick()
            g["w_in"] = mmT(dh1, emb_a)
            g["b_in"] = jnp.sum(dh1, 1, keepdims=True)
            demb_a = mTv(p["w_in"], dh1) + mTv(p["w_cat_x"], dh3)
            demb_b = mTv(p["w_col_x"], dc)
            tick()
            rowi = jax.lax.broadcasted_iota(jnp.int32, (c.DG, 1), 0)
            xsrow = (rowi % DPG) >= 21
            dproj = jnp.where(xsrow, demb_a[0:c.DG],
                              coss[0] * _PI * demb_a[0:c.DG])
            for k in range(1, 6):
                blk = (demb_a[k * c.DG:(k + 1) * c.DG] if k < 4
                       else demb_b[(k - 4) * c.DG:(k - 3) * c.DG])
                fq = _PI * np.float32(2.0 ** k)
                dproj = dproj + fq * coss[k] * blk
            g["dirs"] = mmT(dproj, xs)
            return g

        # ---------------- hoisted Adam constants ----------------
        masks_o = {n: _blockmask(co, n) for n in P_NAMES}
        masks_b = {n: _blockmask(cb, n) for n in P_NAMES}
        ohs_o = {(m, sub): _expand_oh(co, r, m, sub)
                 for m, r in (("div", co.HG), ("dirs", co.DG),
                              ("alpha", OG), ("head", 3 * OG))
                 for sub in range(co.ns)}
        ohs_b = {(m, 0): _expand_oh(cb, r, m, 0)
                 for m, r in (("div", cb.HG), ("dirs", cb.DG),
                              ("alpha", OG), ("head", 3 * OG))}

        actv_o = wm_o[0, 0, 5 * OG:6 * OG]               # [OG, 1]
        updb_o, maskf_o = [], []
        for sub in range(co.ns):
            actrows = {m: jnp.dot(ohs_o[(m, sub)], actv_o,
                                  preferred_element_type=f32)
                       for m in ("div", "dirs", "alpha", "head")}
            updb_o.append({n: (actrows[_cls(n)] > 0) & masks_o[n]
                           for n in P_NAMES})
            maskf_o.append({n: jnp.where(updb_o[sub][n], 1.0, 0.0)
                            for n in P_NAMES})

        actv_b = wm_b[0, 0, 5 * OG:6 * OG]
        actrows_b = {m: jnp.dot(ohs_b[(m, 0)], actv_b,
                                preferred_element_type=f32)
                     for m in ("div", "dirs", "alpha", "head")}
        updb_b = {n: (actrows_b[_cls(n)] > 0) & masks_b[n]
                  for n in P_NAMES}
        maskf_b = {n: jnp.where(updb_b[n], 1.0, 0.0) for n in P_NAMES}
        # bg wide state as ONE packed [RW, CW] block (grads arrive packed
        # from the scratch accumulator; the update is one fat VPU pass)
        maskf_bw = _place_rows(cb, lambda n: maskf_b[n], cb.CW)
        updb_bw = maskf_bw > 0
        oh_bw = _place_rows(cb, lambda n: ohs_b[(_cls(n), 0)], OG)

        def adam_obj(sub, g, w3):
            """Per-name masked AdamW for one object subgroup (the measured
            fastest layout for the 13x20 object schedule)."""
            c1v = w3[3 * OG:4 * OG]
            c2v = w3[4 * OG:5 * OG]
            rowvecs = {m: (jnp.dot(ohs_o[(m, sub)], c1v,
                                   preferred_element_type=f32),
                           jnp.dot(ohs_o[(m, sub)], c2v,
                                   preferred_element_type=f32))
                       for m in ("div", "dirs", "alpha", "head")}
            for n in P_NAMES:
                c1r, c2r = rowvecs[_cls(n)]
                mf = maskf_o[sub][n]
                gg = g[n] * mf
                po = view(co, po_w, po_b, n, sub)
                mo_ = view(co, mo_w, mo_b, n, sub)
                vo = view(co, vo_w, vo_b, n, sub)
                mn = B1 * mo_ + (1.0 - B1) * gg
                vn = B2 * vo + (1.0 - B2) * gg * gg
                if adam_rsqrt:
                    upd = (lr * (mn * c1r)
                           * jax.lax.rsqrt(jnp.maximum(vn * c2r,
                                                       EPS * EPS)))
                else:
                    upd = lr * (mn * c1r) / (jnp.sqrt(vn * c2r) + EPS)
                store(co, po_w, po_b, n, sub, po - (lr * wd * po + upd) * mf)
                store(co, mo_w, mo_b, n, sub,
                      jnp.where(updb_o[sub][n], mn, mo_))
                store(co, vo_w, vo_b, n, sub,
                      jnp.where(updb_o[sub][n], vn, vo))

        def adam_bg(w3):
            """Packed-block masked AdamW for the bg bank from the scratch
            accumulators (wide: one [RW, CW] pass; biases per-name)."""
            c1v = w3[3 * OG:4 * OG]
            c2v = w3[4 * OG:5 * OG]
            c1w = jnp.dot(oh_bw, c1v, preferred_element_type=f32)
            c2w = jnp.dot(oh_bw, c2v, preferred_element_type=f32)
            gw = gw_s[:] * maskf_bw
            pw = pb_w[0]
            mw = mb_w[0]
            vw = vb_w[0]
            mn = B1 * mw + (1.0 - B1) * gw
            vn = B2 * vw + (1.0 - B2) * gw * gw
            if adam_rsqrt:
                upd = (lr * (mn * c1w)
                       * jax.lax.rsqrt(jnp.maximum(vn * c2w, EPS * EPS)))
            else:
                upd = lr * (mn * c1w) / (jnp.sqrt(vn * c2w) + EPS)
            pb_w[0] = pw - (lr * wd * pw + upd) * maskf_bw
            mb_w[0] = jnp.where(updb_bw, mn, mw)
            vb_w[0] = jnp.where(updb_bw, vn, vw)
            rowvecs = {m: (jnp.dot(ohs_b[(m, 0)], c1v,
                                   preferred_element_type=f32),
                           jnp.dot(ohs_b[(m, 0)], c2v,
                                   preferred_element_type=f32))
                       for m in ("div", "dirs", "alpha", "head")}
            for ci, n in enumerate(cb.bias_names):
                c1r, c2r = rowvecs[_cls(n)]
                r = cb.shapes[n][0]
                mf = maskf_b[n]
                gg = gb_s[0:r, ci:ci + 1] * mf
                po = view(cb, pb_w, pb_b, n, 0)
                mo_ = view(cb, mb_w, mb_b, n, 0)
                vo = view(cb, vb_w, vb_b, n, 0)
                mn = B1 * mo_ + (1.0 - B1) * gg
                vn = B2 * vo + (1.0 - B2) * gg * gg
                if adam_rsqrt:
                    upd = (lr * (mn * c1r)
                           * jax.lax.rsqrt(jnp.maximum(vn * c2r,
                                                       EPS * EPS)))
                else:
                    upd = lr * (mn * c1r) / (jnp.sqrt(vn * c2r) + EPS)
                store(cb, pb_w, pb_b, n, 0, po - (lr * wd * po + upd) * mf)
                store(cb, mb_w, mb_b, n, 0, jnp.where(updb_b[n], mn, mo_))
                store(cb, vb_w, vb_b, n, 0, jnp.where(updb_b[n], vn, vo))

        # ------------- the background chunk as pumpable steps -------------

        def _bg_steps(it, slot):
            """Generator: one background chunk's full compute, yielding
            after each small op group. The object iteration pumps it at its
            phase seams so bg MXU groups are emitted inside object VPU
            sections and vice versa. Op order (hence numerics) is identical
            to v1 / the standalone kernel."""
            k = g_id * NI + it          # global bg chunk counter
            bit = k // NCb              # bg iteration index
            ch = jax.lax.rem(k, NCb)    # chunk within the bg iteration

            # wait for this chunk's slabs (prefetched last iteration)
            for d in bg_dmas(k, slot):
                d.wait()
            od = od_s[slot]
            o_b, d_b = od[0:cb.XP], od[cb.XP:2 * cb.XP]
            z = z_s[slot]
            p_b = {n: view(cb, pb_w, pb_b, n, 0) for n in P_NAMES}

            # --- PE (VPU: xs build + ladder); 2 steps
            zb = jnp.dot(zbmat(cb, 0), z, preferred_element_type=f32)
            xs = jnp.concatenate(
                [o_b + tile(cb, zb, s) * d_b for s in range(cb.S)], 1)
            proj = jnp.dot(p_b["dirs"], xs, preferred_element_type=f32)
            yield
            if sincos == "poly":
                s0, c0 = sincos_pi_poly(proj)
            else:
                s0, c0 = jnp.sin(proj * _PI), jnp.cos(proj * _PI)
            sins, coss = [s0], [c0]
            for _ in range(5):
                s_, c_ = sins[-1], coss[-1]
                sins.append(2.0 * s_ * c_)
                coss.append(1.0 - 2.0 * s_ * s_)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (cb.DG, 1), 0)
            xsrow = (rowi % DPG) >= 21
            band0 = jnp.where(xsrow, proj, sins[0])
            emb_a = jnp.concatenate([band0, sins[1], sins[2], sins[3]], 0)
            emb_b = jnp.concatenate([sins[4], sins[5]], 0)
            yield

            # --- forward matmul chain (MXU); 5 steps
            h1 = jax.nn.relu(mm(p_b["w_in"], emb_a) + p_b["b_in"])
            yield
            h2 = jax.nn.relu(mm(p_b["w_mid1"], h1) + p_b["b_mid1"])
            yield
            h3 = jax.nn.relu(mm(p_b["w_cat_h"], h2)
                             + mm(p_b["w_cat_x"], emb_a) + p_b["b_cat"])
            yield
            h4 = jax.nn.relu(mm(p_b["w_mid2"], h3) + p_b["b_mid2"])
            yield
            alpha = (mm(p_b["w_alpha"], h4) + p_b["b_alpha"]) * 10.0
            cact = jax.nn.relu(mm(p_b["w_col_h"], h4)
                               + mm(p_b["w_col_x"], emb_b) + p_b["b_col"])
            logits = mm(p_b["w_out"], cact) + p_b["b_out"]
            yield

            # --- render + losses + backward head (VPU); 3 steps
            w3b = wm_b[0, bit]
            pk = pk_s[slot]
            lobj_b, resid = render_fwd(cb, pk, w3b, alpha, logits, z)
            yield
            loss_b[0] = loss_b[0] + jnp.where(coli_og == bit, lobj_b, 0.0)
            da_b, dl_b = render_head_bwd(cb, resid, z)
            yield

            # --- backward matmul chain (MXU); 6 steps
            g = {}
            g["w_out"] = mmT(dl_b, cact)
            g["b_out"] = jnp.sum(dl_b, 1, keepdims=True)
            dc = mTv(p_b["w_out"], dl_b) * (cact > 0)
            yield
            g["w_col_h"] = mmT(dc, h4)
            g["w_col_x"] = mmT(dc, emb_b)
            g["b_col"] = jnp.sum(dc, 1, keepdims=True)
            g["w_alpha"] = mmT(da_b, h4)
            g["b_alpha"] = jnp.sum(da_b, 1, keepdims=True)
            dh4 = (mTv(p_b["w_col_h"], dc)
                   + mTv(p_b["w_alpha"], da_b)) * (h4 > 0)
            yield
            g["w_mid2"] = mmT(dh4, h3)
            g["b_mid2"] = jnp.sum(dh4, 1, keepdims=True)
            dh3 = mTv(p_b["w_mid2"], dh4) * (h3 > 0)
            g["w_cat_h"] = mmT(dh3, h2)
            g["w_cat_x"] = mmT(dh3, emb_a)
            g["b_cat"] = jnp.sum(dh3, 1, keepdims=True)
            yield
            dh2 = mTv(p_b["w_cat_h"], dh3) * (h2 > 0)
            g["w_mid1"] = mmT(dh2, h1)
            g["b_mid1"] = jnp.sum(dh2, 1, keepdims=True)
            dh1 = mTv(p_b["w_mid1"], dh2) * (h1 > 0)
            yield
            g["w_in"] = mmT(dh1, emb_a)
            g["b_in"] = jnp.sum(dh1, 1, keepdims=True)
            demb_a = mTv(p_b["w_in"], dh1) + mTv(p_b["w_cat_x"], dh3)
            demb_b = mTv(p_b["w_col_x"], dc)
            yield
            dproj = jnp.where(xsrow, demb_a[0:cb.DG],
                              coss[0] * _PI * demb_a[0:cb.DG])
            for kk in range(1, 6):
                blk = (demb_a[kk * cb.DG:(kk + 1) * cb.DG] if kk < 4
                       else demb_b[(kk - 4) * cb.DG:(kk - 3) * cb.DG])
                fq = _PI * np.float32(2.0 ** kk)
                dproj = dproj + fq * coss[kk] * blk
            g["dirs"] = mmT(dproj, xs)
            yield

            # --- pack + accumulate grads (VPU); 2 steps. First chunk of a
            # bg iteration STORES (never reads the uninitialised scratch);
            # later chunks accumulate.
            gw_new = _place_rows(cb, lambda n: g[n], cb.CW)
            gb_new = _place_bias(cb, lambda n: g[n])
            yield

            @pl.when(ch == 0)
            def _():
                gw_s[:] = gw_new
                gb_s[:] = gb_new

            @pl.when(ch != 0)
            def _():
                gw_s[:] = gw_s[:] + gw_new
                gb_s[:] = gb_s[:] + gb_new
            yield

            # --- masked AdamW on the last chunk of the bg iteration
            @pl.when(ch == NCb - 1)
            def _():
                adam_bg(w3b)

        # ---------------- the merged iteration ----------------

        def iteration(it, _):
            slot = jax.lax.rem(it, 2)

            # prefetch next chunk's slabs into the other buffer while this
            # iteration computes (the next invocation re-warms its own
            # first chunk — a ~us unhidden wait, once per invocation)
            @pl.when(it + 1 < NI)
            def _():
                for d in bg_dmas(g_id * NI + it + 1, 1 - slot):
                    d.start()

            bg = _bg_steps(it, slot)

            def pump(n=1):
                for _ in range(n):
                    next(bg, None)

            w3o = wm_o[0, it]
            ps_o = [{n: view(co, po_w, po_b, n, sub) for n in P_NAMES}
                    for sub in range(co.ns)]

            # object PE phases (VPU) — bg DMA is in flight; no pumps
            pes = [fwd_pe(co, od_o[sub, it, 0:co.XP],
                          od_o[sub, it, co.XP:2 * co.XP],
                          z_o[0, it], ps_o[sub], sub)
                   for sub in range(co.ns)]

            # object MLP matmul phases (MXU) <- bg PE ladder (VPU,
            # steps 1-2). With ns == 1 both pumps follow the single phase.
            fw = []
            for sub in range(co.ns):
                fw.append(fwd_mlp(co, ps_o[sub], pes[sub]))
                pump(1 if co.ns > 1 else 2)

            # object merge + render/loss/backward-head (VPU-heavy)
            # <- bg forward matmul chain (MXU, steps 3-7) inside it
            alpha, logits = fw[0][0], fw[0][1]
            for sub in range(1, co.ns):
                alpha = alpha + roll_rows(fw[sub][0], sub * co.G)
                logits = logits + roll_rows(fw[sub][1], sub * co.G)
            pump(2)                                        # bg h1, h2
            lobj_o, da_o, dl_o = render_bwd(
                co, pk_o[0, it], w3o, alpha, logits, z_o[0, it],
                pump=lambda: pump(2))                      # bg h3, h4
            loss_o[0] = loss_o[0] + jnp.where(coli_og == it, lobj_o, 0.0)
            pump(1)                                        # bg heads

            # object backward (MXU) + Adam (VPU), alternated per subgroup.
            # bg's remaining steps are a fixed linear chain
            #   render_fwd(V), head_bwd(V), 6x bwd-matmul(M), pack(V),
            #   accumulate(V), [adam(V)]
            # so: its two render steps pump inside the first object
            # backward's matmul seams (V inside M), the backward-matmul
            # steps pump inside the object Adam sections (M inside V), the
            # pack/accumulate inside the second object backward.
            sched = {0: [1, 0, 0, 1, 0, 0],    # bwd0: bg render steps 8-9
                     1: [1, 0, 0, 1, 0, 0]}    # bwd1: bg pack steps
            for sub in range(co.ns):
                ticks = iter(sched.get(sub, [0] * 6) if co.ns > 1
                             else [1, 1, 0, 1, 1, 0])
                g = bwd_chunk(co, ps_o[sub], fw[sub][2],
                              roll_rows(da_o, -sub * co.G),
                              roll_rows(dl_o, -sub * co.G),
                              pump=lambda: pump(next(ticks, 0)))
                adam_obj(sub, g, w3o)
                pump(3)                        # bg bwd matmuls under Adam

            # drain whatever the pump schedule didn't reach (incl. the
            # bg Adam step on bg-iteration boundaries)
            for _ in bg:
                pass
            return 0

        jax.lax.fori_loop(0, NI, iteration, 0)

    return kernel


def fused_frame_merged(pb_o: PreparedBank, batch_o: dict,
                       pb_b: PreparedBank, batch_b: dict,
                       n_iter: int, n_per_o: int, n_per_b: int,
                       lr: float, wd: float,
                       color_scaling: float = 5.0,
                       opacity_scaling: float = 10.0,
                       interpret: bool | None = None):
    """One pallas_call optimising BOTH banks for a frame.

    Returns (new_pb_o, new_pb_b, losses_o [cap_o, n_iter],
    losses_b [1, n_iter]). Requirements (else use fused_frame_prepared
    per bank): object bank single-chunk (n_per_o <= 128), bg bank is one
    G=1 slot, and ceil(n_per_b/128) <= npair_obj — check with
    ``merge_applicable`` first.
    """
    import os
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rt = R_TILE
    Go, ho = pb_o.G, pb_o.spec.hidden
    cap_o = pb_o.capacity
    ng_o = cap_o // Go
    ns = pick_ns(Go, ho, ng_o, n_per_o, rt)
    npair = ng_o // ns
    assert -(-n_per_o // rt) == 1, ("merged kernel needs a single-chunk "
                                    "object bank", n_per_o)
    assert pb_b.G == 1 and pb_b.capacity == 1, "bg bank must be one G=1 slot"
    ncb_real = -(-n_per_b // rt)
    assert ncb_real <= npair, (ncb_real, npair)
    assert n_iter <= rt, n_iter

    So = batch_o["z"].shape[-1]
    Sb = batch_b["z"].shape[-1]
    co = _Cfg(Go, ho, So, rt, ns)
    cb = _Cfg(1, pb_b.spec.hidden, Sb, rt, 1)
    NCb = npair

    b_o = _prepare_batch(batch_o, pb_o.scale, pb_o.active, pb_o.step,
                         n_iter, n_per_o, Go, ns, rt, 1)
    b_b = _prepare_batch(batch_b, pb_b.scale, pb_b.active, pb_b.step,
                         n_iter, n_per_b, 1, 1, rt, 1, nc_pad=NCb)
    assert b_o["n_chunks"] == 1 and b_b["n_chunks"] == NCb

    NI = n_iter
    kernel = _make_merged_kernel(
        co, cb, NI, NCb, lr, wd, color_scaling, opacity_scaling,
        sincos=os.environ.get("VMAP_SINCOS", "poly"),
        adam_rsqrt=os.environ.get("VMAP_ADAM_RSQRT", "1") == "1")

    def so_state(shape):
        return pl.BlockSpec((ns,) + shape, lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    def sb_state(shape):
        return pl.BlockSpec((1,) + shape, lambda g: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    state_o = [so_state((co.RW, co.CW)), so_state((co.RB, 128))]
    state_b = [sb_state((cb.RW, cb.CW)), sb_state((cb.RB, 128))]

    batch_specs_o = [
        pl.BlockSpec((ns, NI, 2 * co.XP, rt), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NI, OG, co.T), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NI, 7 * OG, rt), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NI, 6 * OG, 1), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # bg od/z/pk stay in HBM; the kernel DMAs per-chunk slabs into a VMEM
    # double buffer (so no dynamic VMEM block reads, no big bg windows)
    batch_specs_b = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, NI, 6 * OG, 1), lambda g: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    in_specs = state_o * 3 + state_b * 3 + batch_specs_o + batch_specs_b
    out_specs = (state_o * 3 + state_b * 3
                 + [pl.BlockSpec((1, OG, rt), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, OG, rt), lambda g: (0, 0, 0),
                                 memory_space=pltpu.VMEM)])
    out_shape = ([jax.ShapeDtypeStruct((ng_o, co.RW, co.CW), f32),
                  jax.ShapeDtypeStruct((ng_o, co.RB, 128), f32)] * 3
                 + [jax.ShapeDtypeStruct((1, cb.RW, cb.CW), f32),
                    jax.ShapeDtypeStruct((1, cb.RB, 128), f32)] * 3
                 + [jax.ShapeDtypeStruct((npair, OG, rt), f32),
                    jax.ShapeDtypeStruct((1, OG, rt), f32)])

    outs = pl.pallas_call(
        kernel, grid=(npair,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((cb.RW, cb.CW), f32),
                        pltpu.VMEM((cb.RB, 128), f32),
                        pltpu.VMEM((2, 2 * cb.XP, rt), f32),
                        pltpu.VMEM((2, OG, cb.T), f32),
                        pltpu.VMEM((2, 7 * OG, rt), f32),
                        pltpu.SemaphoreType.DMA((2, 3))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*pb_o.p, *pb_o.m, *pb_o.v, *pb_b.p, *pb_b.m, *pb_b.v,
      b_o["od"], b_o["z"], b_o["pk"], b_o["wmul"],
      b_b["od"], b_b["z"], b_b["pk"], b_b["wmul"])

    new_pb_o = pb_o.replace(
        p=tuple(outs[0:2]), m=tuple(outs[2:4]), v=tuple(outs[4:6]),
        step=jnp.where(pb_o.active, pb_o.step + n_iter, pb_o.step))
    new_pb_b = pb_b.replace(
        p=tuple(outs[6:8]), m=tuple(outs[8:10]), v=tuple(outs[10:12]),
        step=jnp.where(pb_b.active, pb_b.step + n_iter, pb_b.step))
    losses_o = outs[12][:, :ns * Go, :n_iter].reshape(cap_o, n_iter)
    losses_b = outs[13][0, 0:1, :n_iter]
    return new_pb_o, new_pb_b, losses_o, losses_b


def merge_applicable(cap_o: int, G: int, h: int, n_per_o: int,
                     n_per_b: int, n_iter: int,
                     cap_b: int = 1, G_b: int = 1) -> bool:
    """Whether the merged obj+bg kernel supports this configuration.
    ``cap_b``/``G_b`` describe the background bank — the kernel requires a
    single G=1 bg slot (fused_frame_merged hard-asserts it, so the gate
    must fall back gracefully for any other bg bank shape)."""
    rt = R_TILE
    if cap_b != 1 or G_b != 1:
        return False
    if -(-n_per_o // rt) != 1 or n_iter > rt:
        return False
    ng = cap_o // G
    ns = pick_ns(G, h, ng, n_per_o, rt)
    return -(-n_per_b // rt) <= ng // ns
