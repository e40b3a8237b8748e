"""Self-contained demo: map the analytic scene, export meshes, render a
snapshot PNG, and print eval metrics. No dataset downloads needed.

    python scripts/demo.py --out /tmp/vmap_demo [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/vmap_demo")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    from vmap_tpu.config import Config
    from vmap_tpu.core.mapper import FrameSample, Mapper
    from vmap_tpu.data.synthetic import SyntheticScene
    from vmap_tpu.eval.mesh_eval import eval_object
    from vmap_tpu.utils.vis import render_mesh_snapshot, save_frame_debug

    scene = SyntheticScene(width=120, height=90, fx=90.0, fy=90.0)
    cfg = Config(
        max_n_models=4, do_bg=True, hidden_feature_size=32,
        hidden_feature_size_bg=32, n_iter_per_frame=10,
        win_size=3, n_samples_per_frame=40, win_size_bg=3,
        n_samples_per_frame_bg=80, keyframe_buffer_size=10, keyframe_step=4,
        keyframe_step_bg=4, W=120, H=90, fx=90.0, fy=90.0,
        cx=59.5, cy=44.5, frame_pool_size=20, live_voxel_size=0.02,
        grid_dim=64, seed=0)
    m = Mapper(cfg)

    print("mapping ...")
    for fid in list(range(args.frames)) * args.passes:
        s = scene.frame_sample(fid, n_frames=args.frames)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
        if fid == 0:
            save_frame_debug(s, os.path.join(args.out, "input_frame.png"))

    paths = m.export_meshes(args.out, frame_id=args.frames * args.passes - 1)
    print(f"exported {len(paths)} meshes -> {args.out}")

    obj_meshes = [m.mesh_object(oid) for oid in sorted(m.registry) if oid != 0]
    snap = render_mesh_snapshot([x for x in obj_meshes if x is not None],
                                os.path.join(args.out, "objects.png"),
                                elev=-20, azim=-60)
    print(f"object snapshot -> {snap}")
    all_meshes = obj_meshes + [m.mesh_object(0)]
    snap = render_mesh_snapshot([x for x in all_meshes if x is not None],
                                os.path.join(args.out, "scene.png"),
                                elev=-20, azim=-60)
    print(f"scene snapshot -> {snap}")

    gt = scene.gt_meshes()
    names = {0: "background", scene.SPHERE_ID: "sphere", scene.BOX_ID: "box"}
    for oid in (scene.SPHERE_ID, scene.BOX_ID):
        rec = m.mesh_object(oid)
        if rec is None:
            continue
        met = eval_object(rec, gt[oid], n=5000)
        if met:
            print(f"{names[oid]:>10}: acc={met['accuracy']:.4f}m "
                  f"comp={met['completion']:.4f}m "
                  f"r@5cm={met['completion_ratio_5cm']:.3f}")


if __name__ == "__main__":
    main()
