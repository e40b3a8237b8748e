"""One-command reproduction of the full reference protocol on generated
data: ray-trace a Replica-layout dataset (the Habitat-renderer stand-in),
train through the real CLI, then run the object- and scene-level 3D evals
against the generated GT submeshes — the end-to-end chain a reference user
runs as habitat render -> train.py -> eval_3D_obj/eval_3D_scene.

    python scripts/repro_pipeline.py [--work /tmp/vmap_repro] [--frames 24]
        [--iters 8] [--tpu]

CPU by default (forces JAX_PLATFORMS=cpu before jax is touched); pass
--tpu to keep the default backend. Prints the object/scene metric tables
and writes metrics JSON next to the run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/tmp/vmap_repro")
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--iters", type=int, default=8,
                   help="optimisation iterations per frame")
    p.add_argument("--width", type=int, default=80)
    p.add_argument("--height", type=int, default=60)
    p.add_argument("--grid_dim", type=int, default=48)
    p.add_argument("--tpu", action="store_true",
                   help="use the default (TPU) backend instead of CPU")
    args = p.parse_args(argv)

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    data_dir = os.path.join(args.work, "data")
    logdir = os.path.join(args.work, "run")
    os.makedirs(args.work, exist_ok=True)

    # 1. generate the Replica-layout dataset + GT submeshes
    print(f"[1/3] generating {args.frames}-frame Replica-layout dataset ...")
    from scripts.generate_dataset import main as gen_main
    gen_main([data_dir, "--format", "Replica",
              "--frames", str(args.frames),
              "--width", str(args.width), "--height", str(args.height),
              "--fx", "50.0", "--fy", "50.0"])

    # 2. train through the real CLI on the generated layout
    print("[2/3] training through train.py ...")
    cfg = {
        "dataset": {"live": 0, "path": data_dir, "format": "Replica"},
        "optimizer": {"args": {"lr": 0.001, "weight_decay": 0.013}},
        "trainer": {"imap_mode": 0, "do_bg": 1, "n_models": 8,
                    "training_strategy": "vmap", "scale": 1000.0},
        "render": {"depth_range": [0.0, 8.0], "n_bins": 9,
                   "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 5,
                   "iters_per_frame": args.iters,
                   "n_per_optim": 120, "n_per_optim_bg": 240},
        "model": {"n_unidir_funcs": 5, "obj_scale": 2.0, "bg_scale": 5.0,
                  "color_scaling": 5.0, "opacity_scaling": 10.0,
                  "surface_eps": 0.1, "other_eps": 0.05,
                  "keyframe_buffer_size": 10, "keyframe_step": 2,
                  "keyframe_step_bg": 2, "window_size": 3,
                  "window_size_bg": 3, "hidden_feature_size": 32,
                  "hidden_feature_size_bg": 32},
        "camera": {"w": args.width, "h": args.height, "fx": 50.0,
                   "fy": 50.0, "cx": (args.width - 1) / 2,
                   "cy": (args.height - 1) / 2, "mw": 0, "mh": 0},
        "vis": {"n_vis_iter": 10 ** 6, "grid_dim": args.grid_dim,
                "live_voxel_size": 0.02},
        "tpu": {"frame_pool_size": max(32, args.frames + 2),
                "compute_dtype": "float32", "seed": 0},
    }
    cfg_path = os.path.join(args.work, "repro_config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)
    from train import main as train_main
    train_main(["--config", cfg_path, "--logdir", logdir])

    # 3. evaluate: object protocol (GT-OBB/0.9 crop) + composed scene
    last_frame = args.frames - 1
    mesh_dir = os.path.join(logdir, "scene_mesh")
    gt_dir = os.path.join(data_dir, "habitat")
    print("[3/3] evaluating ...")
    from vmap_tpu.eval.eval_3d import main as eval_main
    obj_metrics_path = os.path.join(args.work, "metrics_obj.json")
    eval_main(["object", "--mesh_dir", mesh_dir, "--gt_dir", gt_dir,
               "--frame", str(last_frame), "--out", obj_metrics_path])

    # composed GT scene mesh from the generated submeshes
    from vmap_tpu.geometry.mesh import Mesh, load_mesh
    parts = [load_mesh(os.path.join(gt_dir, f))
             for f in sorted(os.listdir(gt_dir)) if f.endswith(".ply")]
    gt_scene_path = os.path.join(args.work, "gt_scene.obj")
    Mesh.concatenate(parts).export(gt_scene_path)
    scene_metrics_path = os.path.join(args.work, "metrics_scene.json")
    eval_main(["scene", "--mesh_dir", mesh_dir, "--gt_mesh", gt_scene_path,
               "--frame", str(last_frame), "--out", scene_metrics_path])
    print(f"metrics -> {obj_metrics_path}, {scene_metrics_path}")


if __name__ == "__main__":
    main()
