"""End-to-end quality check on the analytic scene: train -> mesh -> 3D
metrics against exact ground truth.

This plays the role of the reference's Replica evaluation protocol
(metric/eval_3D_obj.py) in an environment without the Replica assets: the
synthetic scene has closed-form GT meshes, so Accuracy / Completion /
Completion-ratio are exact.

    python scripts/eval_synthetic.py [--frames 24] [--passes 3] [--grid 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--width", type=int, default=120)
    p.add_argument("--height", type=int, default=90)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    # quality-study knobs (bf16 / block-sampling / background budget)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "bwd_bf16"])
    p.add_argument("--px_block", type=int, default=1)
    p.add_argument("--px_block_bg", type=int, default=1)
    p.add_argument("--bg_rays", type=int, default=80)
    p.add_argument("--bg_hidden", type=int, default=32)
    p.add_argument("--fused", default="auto")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from vmap_tpu.config import Config
    from vmap_tpu.core.mapper import FrameSample, Mapper
    from vmap_tpu.data.synthetic import SyntheticScene
    from vmap_tpu.eval.mesh_eval import eval_object, observed_points_mask

    fx = args.width * 0.75
    scene = SyntheticScene(width=args.width, height=args.height, fx=fx, fy=fx)
    fused = args.fused if args.fused == "auto" else args.fused == "1"
    cfg = Config(
        max_n_models=4, do_bg=True, hidden_feature_size=32,
        hidden_feature_size_bg=args.bg_hidden, n_iter_per_frame=args.iters,
        win_size=3, n_samples_per_frame=40,
        win_size_bg=3, n_samples_per_frame_bg=args.bg_rays,
        keyframe_buffer_size=10, keyframe_step=4, keyframe_step_bg=4,
        W=args.width, H=args.height, fx=fx, fy=fx,
        cx=(args.width - 1) / 2, cy=(args.height - 1) / 2,
        frame_pool_size=args.frames + 2, live_voxel_size=0.02,
        grid_dim=args.grid, seed=0, compute_dtype=args.dtype,
        px_block=args.px_block, px_block_bg=args.px_block_bg,
        fused_train_step=fused)

    m = Mapper(cfg)
    for fid in list(range(args.frames)) * args.passes:
        s = scene.frame_sample(fid, n_frames=args.frames)
        m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                    s["bbox_dict"], s["T"], fid))
    total_steps = int(np.asarray(m.bank_obj.step).max())
    print(f"trained: {m.n_objects} objects, {total_steps} steps each")

    gt = scene.gt_meshes()
    results = {}
    names = {0: "background", scene.SPHERE_ID: "sphere", scene.BOX_ID: "box"}

    # Background completion is only meaningful over OBSERVED floor: the
    # orbit views a fraction of the analytic 8x8 m GT patch, and GT points
    # the trajectory never saw would dominate completion (the reference's
    # full-GT protocol assumes Replica's full room coverage).
    frames = [scene.render(fid, n_frames=args.frames)
              for fid in range(args.frames)]
    poses = np.stack([f[3] for f in frames])
    depths = np.stack([f[1] for f in frames])

    def bg_filter(pts):
        return observed_points_mask(pts, poses, depths, fx, fx,
                                    (args.width - 1) / 2,
                                    (args.height - 1) / 2, tol=0.05)

    for oid, gt_mesh in gt.items():
        rec = m.mesh_object(oid, grid_dim=args.grid)
        if rec is None:
            print(f"{names[oid]}: meshing failed")
            continue
        met = eval_object(rec, gt_mesh, n=8000,
                          gt_filter=bg_filter if oid == 0 else None)
        if met is None:
            print(f"{names[oid]}: empty after GT crop")
            continue
        results[names[oid]] = met
        print(f"{names[oid]:>10}: acc={met['accuracy']:.4f}m "
              f"comp={met['completion']:.4f}m "
              f"r@1cm={met['completion_ratio_1cm']:.3f} "
              f"r@5cm={met['completion_ratio_5cm']:.3f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
