"""Driver for tests/test_multihost.py: runs the REAL product path (Config ->
Mapper -> synthetic frames) on an ("obj", "data") mesh and prints the
per-frame losses as one JSON line.

Single-process: 8 local virtual CPU devices.
Multi-process:  VMAP_COORDINATOR/VMAP_NUM_PROCESSES/VMAP_PROCESS_ID set by
the test; 4 local devices per process, 8 global. The object bank shards
across both processes; losses must match the single-process run.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count="
                           + os.environ.get("VMAP_TEST_LOCAL_DEVICES", "8"))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vmap_tpu.parallel.distributed import init_from_env, is_primary  # noqa: E402

init_from_env()

from vmap_tpu.config import Config  # noqa: E402
from vmap_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from vmap_tpu.core.mapper import FrameSample, Mapper  # noqa: E402
from vmap_tpu.data.synthetic import SyntheticScene  # noqa: E402


def main():
    scene = SyntheticScene(width=48, height=36, fx=36.0, fy=36.0)
    cfg = Config(
        max_n_models=8, do_bg=True, hidden_feature_size=16,
        hidden_feature_size_bg=16, n_iter_per_frame=2,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=16, keyframe_buffer_size=6, keyframe_step=2,
        keyframe_step_bg=2, W=48, H=36, fx=36.0, fy=36.0,
        cx=23.5, cy=17.5, frame_pool_size=8, live_voxel_size=0.05,
        grid_dim=16, seed=0)
    cfg.mesh_axes = {"obj": 4, "data": 2}
    # default: XLA SPMD step; VMAP_TEST_FUSED=1 runs the flagship fused
    # Pallas kernel under shard_map instead (interpret-mode on CPU)
    fused = os.environ.get("VMAP_TEST_FUSED", "0") == "1"
    cfg.fused_train_step = fused
    if fused:
        cfg.max_n_models = 32         # G=4 groups: >=1 group per obj shard
    m = Mapper(cfg)
    if fused:
        assert m.use_fused and m._fused_sharded, "fused sharded path not on"

    losses = []
    for fid in range(4 if fused else 6):
        s = scene.frame_sample(fid, n_frames=6)
        out = m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                          s["bbox_dict"], s["T"], fid))
        losses.append(round(float(out.get("loss", float("nan"))), 4))

    # cover the collective host-view + artifact paths
    out_dir = sys.argv[1] if len(sys.argv) > 1 else None
    n_mesh = -1
    if out_dir:
        paths = m.export_meshes(os.path.join(out_dir, "mesh"), 5)
        n_mesh = len(paths)
        ckpt_lib.save_full_checkpoint(m, os.path.join(out_dir, "ckpt"), 5)
    print(json.dumps({
        "process": jax.process_index(), "primary": is_primary(),
        "n_devices": len(jax.devices()), "losses": losses,
        "n_meshes": n_mesh,
    }), flush=True)


if __name__ == "__main__":
    main()
