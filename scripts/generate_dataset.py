"""Generate an RGB-D + instance dataset by ray-tracing a mesh scene.

TPU-native stand-in for the reference's Habitat-Sim generation step
(data_generation/habitat_renderer.py): renders the analytic test scene's
ground-truth meshes (or any meshes you assemble into SceneObjects) along an
orbit trajectory and writes the exact Replica-vMAP or ScanNet file layout
that the loaders consume, plus GT submeshes + info_semantic.json for the
object-level eval protocol.

Usage:
  python scripts/generate_dataset.py out_dir [--format Replica|ScanNet]
      [--frames N] [--width W] [--height H] [--fx F] [--fy F]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_scene_objects(fmt: str):
    """The analytic scene (data/synthetic.py) as renderable SceneObjects.
    Class ids are chosen so the floor folds to background in each loader:
    Replica background classes include 40, ScanNet's include 1."""
    from vmap_tpu.data.synthetic import SyntheticScene
    from vmap_tpu.data_generation.settings import SceneObject
    scene = SyntheticScene()
    gt = scene.gt_meshes()
    floor_cls = 40 if fmt == "Replica" else 1
    return scene, [
        SceneObject(gt[0], instance_id=3, class_id=floor_cls,
                    albedo=(0.55, 0.55, 0.5)),
        SceneObject(gt[scene.SPHERE_ID], instance_id=scene.SPHERE_ID,
                    class_id=20, albedo=(0.85, 0.25, 0.2)),
        SceneObject(gt[scene.BOX_ID], instance_id=scene.BOX_ID,
                    class_id=7, albedo=(0.2, 0.4, 0.85)),
    ]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--format", default="Replica",
                   choices=["Replica", "ScanNet"])
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--width", type=int, default=80)
    p.add_argument("--height", type=int, default=60)
    p.add_argument("--fx", type=float, default=50.0)
    p.add_argument("--fy", type=float, default=50.0)
    p.add_argument("--invalid_pose_frames", type=int, nargs="*", default=[])
    p.add_argument("--scene", default="synthetic",
                   choices=["synthetic", "room"],
                   help="'room': Replica-scale furnished room "
                        "(data_generation/room.py)")
    p.add_argument("--objects", type=int, default=40,
                   help="furniture instance count for --scene room")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ply_furniture", action="store_true",
                   help="generate a .ply furniture library and build the "
                        "room with ~1/3 loaded-mesh instances "
                        "(data_generation/room.py write_ply_library)")
    args = p.parse_args(argv)

    from vmap_tpu.data_generation import (MeshRenderer, RenderSettings,
                                          write_gt_submeshes,
                                          write_replica_sequence,
                                          write_scannet_sequence)
    from vmap_tpu.data_generation.settings import orbit_trajectory

    if args.scene == "room":
        from vmap_tpu.data_generation.room import (make_room_scene,
                                                   room_trajectory)
        ply_dir = None
        if args.ply_furniture:
            from vmap_tpu.data_generation.room import write_ply_library
            ply_dir = os.path.join(args.out_dir, "ply_lib")
            write_ply_library(ply_dir, seed=args.seed)
        objs, shell, meta = make_room_scene(args.objects, seed=args.seed,
                                            ply_dir=ply_dir)
        objects = objs + shell
        if args.format == "ScanNet":
            # the room builder tags Replica semantics; remap to the ScanNet
            # vocabulary so the shell folds to background in that loader
            # (see room.SCANNET_CLS_MAP)
            import dataclasses
            from vmap_tpu.data_generation.room import SCANNET_CLS_MAP
            objects = [dataclasses.replace(
                o, class_id=SCANNET_CLS_MAP.get(o.class_id, o.class_id))
                for o in objects]
        traj = room_trajectory(args.frames, size=meta["size"],
                               seed=args.seed)
        st = RenderSettings(width=args.width, height=args.height,
                            fx=args.fx, fy=args.fy, tri_chunk=512,
                            ray_chunk=32768 if args.width * args.height
                            > 65536 else 0,
                            bary_eps=1e-5)   # close shared-edge speckle
                                             # holes on the big shell faces
    else:
        scene, objects = synthetic_scene_objects(args.format)
        st = RenderSettings(width=args.width, height=args.height,
                            fx=args.fx, fy=args.fy, tri_chunk=256)
        traj = orbit_trajectory(args.frames, radius=scene.orbit_radius,
                                height=scene.orbit_height)
    renderer = MeshRenderer(objects, st)
    # stream render -> write (a frame generator): room-scale sequences
    # (500 x 1200 x 680 x 4 maps) never fit in host RAM as a list
    frames = renderer.render_trajectory(traj)
    if args.format == "Replica":
        write_replica_sequence(args.out_dir, frames, traj)
        write_gt_submeshes(os.path.join(args.out_dir, "habitat"),
                           objects)
    else:
        write_scannet_sequence(args.out_dir, frames, traj,
                               invalid_pose_frames=tuple(
                                   args.invalid_pose_frames),
                               intrinsics=st.intrinsics())
        # GT submeshes + info_semantic.json next to the sequence so the
        # object/scene eval protocols run on ScanNet-layout datasets too
        write_gt_submeshes(os.path.join(args.out_dir, "habitat"), objects)
    print(f"wrote {args.frames} frames ({args.format}) -> {args.out_dir}")


if __name__ == "__main__":
    main()
