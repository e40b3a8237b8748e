"""Section-replica probes: true silicon cost of the fused kernel's render
and embedding sections, measured standalone with the two-point rep slope.

  * render    — exact replica of _make_kernel's render_bwd (lanemix=vpu
    strided reductions), chained on synthetic [8, T] alpha/logit data.
  * emb_cat   — emb_a = concat(4 x [96, T]) -> two matmuls read [384, T]
    (the kernel's current form).
  * emb_split — no concat: w @ emb as a sum of per-band [128, 96] x
    [96, T] dots (reads the band buffers in place).
  * ladder    — sin/cos + 5 double-angle levels on [96, T].

Usage: python scripts/microbench_sections.py [case ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

f32 = jnp.float32
S, R, T, OG = 10, 128, 1280, 8


def _one(body, shapes, reps):
    def kernel(*refs):
        out = refs[-1]
        ins = refs[:-1]
        c0 = ins[0][:] * 1.0001

        def step(i, c):
            return body(ins, c, i)

        c = jax.lax.fori_loop(0, reps, step, c0)
        out[:] = jnp.broadcast_to(jnp.sum(c, 1, keepdims=True)[:8, :1],
                                  (8, 128))

    xs = [jnp.asarray(np.random.default_rng(7).random(s) * 0.5 + 0.25, f32)
          for s in shapes]

    @jax.jit
    def run(*xs):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), f32),
            interpret=jax.default_backend() != "tpu")(*xs)

    out = run(*xs)
    float(jnp.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            out = run(*xs)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, (time.time() - t0) / 10)
    return best * 1e9


def slope(body, shapes, reps):
    t1 = _one(body, shapes, reps)
    t4 = _one(body, shapes, reps * 4)
    return (t4 - t1) / 3.0 / reps


def tile(a, s):
    return a[:, s * R:(s + 1) * R]


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


def render_body(ins, c, i):
    """ins: z [8,T], dep [8,128], gtc [24,128], masks... c: alpha [8,T]."""
    z = ins[1][:]
    dep = ins[2][:]
    gtc = ins[3][:]
    mo = ins[4][:]
    alpha = c
    logits = rep3(c * 0.3)
    color = jax.nn.sigmoid(logits)
    occ = jax.nn.sigmoid(alpha)
    free = jnp.maximum(1.0 - occ + 1e-10, 1e-10)
    cp = jnp.ones((OG, R), f32)
    cps = []
    for s in range(S):
        cps.append(cp)
        cp = cp * tile(free, s)
    cp_full = jnp.concatenate(cps, 1)
    terms = occ * cp_full
    RD = lane_sum(terms * z)
    RO = lane_sum(terms)
    RD_b = bcast(RD)
    var = lane_sum(terms * (z - RD_b) ** 2)
    info = 1.0 / (jnp.sqrt(var) + 1e-4)
    terms3 = rep3(terms)
    RC3 = lane_sum(terms3 * color)
    res_d = RD - dep
    res_o = RO - mo
    res_c3 = RC3 - gtc
    mo3 = rep3(mo)
    ld = jnp.sum(jnp.abs(res_d) * info, 1, keepdims=True)
    lc_obj = sum3(jnp.abs(res_c3) * mo3)
    lc = jnp.sum(lc_obj, 1, keepdims=True)
    lo = jnp.sum(jnp.abs(res_o), 1, keepdims=True)
    dRD = jnp.sign(res_d) * info
    dRO = jnp.sign(res_o)
    dRC3 = jnp.sign(res_c3) * mo3
    dRC3_b = bcast(dRC3)
    dterm = bcast(dRD) * z + bcast(dRO) + sum3(dRC3_b * color)
    tt = dterm * terms
    suf = jnp.zeros((OG, R), f32)
    sufs = [None] * S
    for s in range(S - 1, -1, -1):
        sufs[s] = suf
        suf = suf + tile(tt, s)
    suf_full = jnp.concatenate(sufs, 1)
    docc = dterm * cp_full - suf_full / free
    dalpha = docc * occ * (1.0 - occ) * 10.0
    dcolor = dRC3_b * terms3
    dlogits = dcolor * color * (1.0 - color)
    return dalpha * 1e-3 + c * 0.999 + (ld + lc + lo) * 1e-6 \
        + jnp.broadcast_to(dlogits[0:OG, 0:1], c.shape) * 1e-9


def main():
    cases = sys.argv[1:] or ["render", "emb_cat", "emb_split", "ladder"]
    for case in cases:
        if case == "render":
            ns = slope(render_body,
                       [(OG, T), (OG, T), (OG, R), (3 * OG, R), (OG, R)],
                       200)
            print(f"render section (full render_bwd replica): {ns:.0f} ns")
        elif case == "emb_cat":
            def body(ins, c, i):
                b0, b1, b2, b3 = (c, c * 0.5, c * 0.25, c * 0.125)
                emb = jnp.concatenate([b0, b1, b2, b3], 0)       # [384, T]
                w1, w2 = ins[1][:], ins[2][:]
                y = (jnp.dot(w1, emb, preferred_element_type=f32)
                     + jnp.dot(w2, emb, preferred_element_type=f32))
                return c * 0.999 + y[:96] * 1e-6
            ns = slope(body, [(96, T), (128, 384), (128, 384)], 200)
            print(f"emb concat + 2 matmuls: {ns:.0f} ns")
        elif case == "emb_split":
            def body(ins, c, i):
                bands = [c, c * 0.5, c * 0.25, c * 0.125]
                w1, w2 = ins[1][:], ins[2][:]
                y = None
                for k, b in enumerate(bands):
                    yk = (jnp.dot(w1[:, k * 96:(k + 1) * 96], b,
                                  preferred_element_type=f32)
                          + jnp.dot(w2[:, k * 96:(k + 1) * 96], b,
                                    preferred_element_type=f32))
                    y = yk if y is None else y + yk
                return c * 0.999 + y[:96] * 1e-6
            ns = slope(body, [(96, T), (128, 384), (128, 384)], 200)
            print(f"emb split (8 banded matmuls, no concat): {ns:.0f} ns")
        elif case == "ladder":
            def body(ins, c, i):
                sins = [jnp.sin(c * np.float32(np.pi))]
                coss = [jnp.cos(c * np.float32(np.pi))]
                for _ in range(5):
                    s_, c_ = sins[-1], coss[-1]
                    sins.append(2.0 * s_ * c_)
                    coss.append(1.0 - 2.0 * s_ * s_)
                acc = sins[0]
                for x in sins[1:] + coss:
                    acc = acc + x
                return c * 0.9 + acc * 1e-6
            ns = slope(body, [(96, T)], 200)
            print(f"ladder (sin+cos + 5 levels + 11 adds) [96,{T}]: "
                  f"{ns:.0f} ns")
        else:
            print("unknown", case)


if __name__ == "__main__":
    main()
