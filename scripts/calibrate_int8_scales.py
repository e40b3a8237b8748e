"""Calibrate the static-int8 quantisation scales from REAL training maxima.

The "int8_static" kernel policy (kernels/train_step.py) replaces dynamic
per-tensor abs-max quantisation with compile-time scale constants
(VMAP_Q8_SACT / VMAP_Q8_SHEAD / VMAP_Q8_SGRAD) — round 4 measured the
in-loop abs-max reduce as the entire net cost of dynamic int8, and the
round-5 kernel A/B shows the static variant beating f32. What the env
constants SHOULD be is an empirical question about real workloads: this
script trains the shipped Replica-room config through the real Mapper
(XLA path — bit-identical parameter trajectory to the fused kernel,
tests/test_train_kernel.py) and, at logarithmically spaced probe frames,
recomputes one frame's forward/backward with explicit perturbation
inputs at the kernel's 12 quantisation sites:

  quant_relu   : h1 h2 h3 h4 c        (post-relu activations)
  quant_grad_head : dalpha dlogits    (head matmul-output grads)
  quant_grad_hid  : dh1 dh2 dh3 dh4 dc (relu-masked hidden grads)

and reports global + p99.9 abs-maxima per site group, with suggested
scale constants. Grad magnitudes match the kernel's per-iteration loss
normalisation (the probe slices single iterations, core/step._slice_iter).

Usage (TPU, ~1 min):  python scripts/calibrate_int8_scales.py \
    [--config /tmp/vmap_room/room_config_default.json] [--max_frames 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.config import Config
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.core.step import _ray_major, _sample_bank, _slice_iter
from vmap_tpu.data.loader import PrefetchIterator, make_dataset
from vmap_tpu.ops.embedding import embed
from vmap_tpu.ops import losses as L

SITES_ACT = ("h1", "h2", "h3", "h4", "c")
SITES_HEAD = ("alpha", "logits")
SITES_HID = ("dh1", "dh2", "dh3", "dh4", "dc")


def probe_fn(spec, st):
    """Jitted: one iteration slice -> dict of per-site |abs| flat arrays."""

    def lin(p, name, x):
        return x @ p[f"w_{name}"].T + p[f"b_{name}"]

    def fwd_one(p, pe, sc, pts, eps):
        e = embed(pe, pts, sc, st.max_deg)
        x1, x2 = e[..., : st.emb1], e[..., st.emb1:]
        h1 = jax.nn.relu(lin(p, "in", x1) + eps["h1"])
        h2 = jax.nn.relu(lin(p, "mid1", h1) + eps["h2"])
        h3 = jax.nn.relu(lin(p, "cat", jnp.concatenate([h2, x1], -1))
                         + eps["h3"])
        h4 = jax.nn.relu(lin(p, "mid2", h3) + eps["h4"])
        a_pre = lin(p, "alpha", h4) + eps["alpha"]          # [.., 1]
        c = jax.nn.relu(lin(p, "col", jnp.concatenate([h4, x2], -1))
                        + eps["c"])
        logit = lin(p, "col_out", c) + eps["logits"]        # [.., 3]
        return (a_pre[..., 0] * 10.0, jax.nn.sigmoid(logit),
                (h1, h2, h3, h4, c))

    def run(flat, scale, active, sl, eps):
        pe, mlp_p = spec.unflatten(flat)
        alpha, color, acts = jax.vmap(fwd_one)(mlp_p, pe, scale,
                                               sl["pts"], eps)
        loss, _ = L.step_batch_loss(
            alpha, color, sl["depth"], sl["rgb"], sl["state"], sl["valid"],
            sl["z"], active, st.color_scaling, st.opacity_scaling)
        return loss, acts

    def measure(flat, scale, active, sl):
        cap, n_per, S = sl["pts"].shape[:3]
        h = spec.hidden
        shapes = {"h1": h, "h2": h, "h3": h, "h4": h, "c": h,
                  "alpha": 1, "logits": 3}
        eps = {k: jnp.zeros((cap, n_per, S, w)) for k, w in shapes.items()}
        (_, acts), g = jax.value_and_grad(run, argnums=4, has_aux=True)(
            flat, scale, active, sl, eps)
        out = {}
        for name, a in zip(SITES_ACT, acts):
            out[name] = jnp.abs(a)
        out["dalpha"] = jnp.abs(g["alpha"])
        out["dlogits"] = jnp.abs(g["logits"])
        for name in ("h1", "h2", "h3", "h4", "c"):
            out["d" + name] = jnp.abs(g[name])
        # restrict to active slots (inactive params are init noise)
        return {k: jnp.where(active[:, None, None, None], v, 0.0).ravel()
                for k, v in out.items()}

    return jax.jit(measure)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="/tmp/vmap_room/room_config_default.json")
    ap.add_argument("--max_frames", type=int, default=400)
    ap.add_argument("--probes", default="10,50,150,399",
                    help="frame indices to measure at")
    ap.add_argument("--out", default=None, help="write JSON summary here")
    args = ap.parse_args()

    cfg = Config.from_json(args.config)
    cfg.fused_train_step = False    # XLA path keeps BankState reachable
    dataset = make_dataset(cfg)
    mapper = Mapper(cfg)
    st = mapper.statics
    probes = {int(x) for x in args.probes.split(",")}

    meas = None
    stats: dict[str, list] = {}
    it = iter(PrefetchIterator(dataset))
    n = min(len(dataset), args.max_frames)
    for fi in range(n):
        sample = next(it)
        if sample is None:
            continue
        mapper.ingest_frame(FrameSample(
            image=sample["image"], depth=sample["depth"], inst=sample["obj"],
            bbox_dict=sample["bbox_dict"], t_wc=sample["T"],
            frame_id=sample["frame_id"]))
        m = mapper.train_frame()
        if fi in probes:
            bank = mapper._bank_obj
            if meas is None:
                meas = probe_fn(bank.spec, st)
            obj_tab, _ = mapper._device_tables()
            obj_ids = jnp.asarray(mapper._slot_objid)
            batch = _sample_bank(
                jax.random.fold_in(jax.random.PRNGKey(7), fi),
                *mapper.pool.arrays(), *obj_tab, obj_ids,
                st.n_iter * st.win, st.n_px, st.n_b2s, st)
            rm = _ray_major({k: v for k, v in batch.items()
                             if k in ("pts", "depth", "rgb", "state",
                                      "valid", "z")})
            n_per = st.win * st.n_px
            for itr in (0, st.n_iter // 2, st.n_iter - 1):
                sl = _slice_iter(rm, jnp.int32(itr), n_per)
                out = meas(bank.flat, bank.scale, bank.active, sl)
                for k, v in out.items():
                    a = np.asarray(v)
                    a = a[a > 0]
                    stats.setdefault(k, []).append(
                        (float(a.max()) if a.size else 0.0,
                         float(np.percentile(a, 99.9)) if a.size else 0.0))
            print(f"frame {fi}: probed (loss {float(m.get('loss', 0)):.2f})",
                  flush=True)

    def agg(keys):
        mx = max(m for k in keys for (m, _) in stats[k])
        p = max(p for k in keys for (_, p) in stats[k])
        return mx, p

    summary = {}
    for label, keys in (("S_ACT(quant_relu)", SITES_ACT),
                        ("S_HEAD(grad_head)", ("dalpha", "dlogits")),
                        ("S_GRAD(grad_hid)", SITES_HID)):
        mx, p999 = agg(keys)
        summary[label] = {"abs_max": mx, "p99.9": p999}
        print(f"{label}: abs_max {mx:.5g}  p99.9 {p999:.5g}")
    for k in sorted(stats):
        mx = max(m for m, _ in stats[k])
        print(f"  site {k}: max {mx:.5g}")
    sug = {
        "VMAP_Q8_SACT": round(1.1 * summary["S_ACT(quant_relu)"]["abs_max"], 4),
        "VMAP_Q8_SHEAD": float(f"{1.1 * summary['S_HEAD(grad_head)']['abs_max']:.3g}"),
        "VMAP_Q8_SGRAD": float(f"{1.1 * summary['S_GRAD(grad_hid)']['abs_max']:.3g}"),
    }
    print("suggested:", json.dumps(sug))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "suggested": sug}, f, indent=1)


if __name__ == "__main__":
    main()
