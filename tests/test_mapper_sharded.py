"""tpu.mesh_axes drives multi-device SPMD through the real CLI (VERDICT #3).

Runs train.py twice on the synthetic dataset — single-device and on an
("obj": 4, "data": 2) mesh over the 8 virtual CPU devices — and checks the
sharded run completes with per-frame loss parity against single-device.
RNG draws, sampling, and updates are identical by construction; only
reduction order may differ (psum vs local sum), hence the tolerance.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _config(tmp_path, mesh_axes):
    cfg = {
        "dataset": {"live": 0, "path": "", "format": "Synthetic"},
        "optimizer": {"args": {"lr": 0.001, "weight_decay": 0.013}},
        "trainer": {"imap_mode": 0, "do_bg": 1, "n_models": 4,
                    "training_strategy": "vmap", "scale": 1000.0},
        "render": {"depth_range": [0.0, 8.0], "n_bins": 5,
                   "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 2,
                   "iters_per_frame": 2, "n_per_optim": 32,
                   "n_per_optim_bg": 64},
        "model": {"n_unidir_funcs": 5, "obj_scale": 2.0, "bg_scale": 5.0,
                  "surface_eps": 0.1, "other_eps": 0.05,
                  "keyframe_buffer_size": 5, "keyframe_step": 3,
                  "keyframe_step_bg": 3, "window_size": 2,
                  "window_size_bg": 2, "hidden_feature_size": 8,
                  "hidden_feature_size_bg": 8},
        "camera": {"w": 64, "h": 48, "fx": 50.0, "fy": 50.0,
                   "cx": 31.5, "cy": 23.5, "mw": 0, "mh": 0},
        "vis": {"n_vis_iter": 100, "grid_dim": 24, "live_voxel_size": 0.05},
        "tpu": {"frame_pool_size": 16, "compute_dtype": "float32", "seed": 0,
                "mesh_axes": mesh_axes},
    }
    name = "sharded.json" if mesh_axes else "single.json"
    p = tmp_path / name
    p.write_text(json.dumps(cfg))
    return str(p)


def _run(tmp_path, config, tag):
    logdir = str(tmp_path / f"logs_{tag}")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", config, "--logdir", logdir, "--max_frames", "8"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    log = [json.loads(line) for line in
           open(os.path.join(logdir, "train_log.jsonl"))]
    return np.array([e["loss"] for e in log])


def test_cli_sharded_matches_single_device(tmp_path):
    losses_1 = _run(tmp_path, _config(tmp_path, {}), "single")
    losses_8 = _run(tmp_path, _config(
        tmp_path, {"obj": 4, "data": 2}), "sharded")
    assert losses_8.shape == losses_1.shape and len(losses_8) == 8
    assert np.isfinite(losses_8).all()
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-3, atol=1e-4)


def test_mesh_axes_capacity_mismatch_raises(tmp_path):
    sys.path.insert(0, REPO)
    try:
        import jax  # noqa: F401  (conftest already forced 8 cpu devices)
        from vmap_tpu.config import Config
        from vmap_tpu.core.mapper import Mapper
        cfg = Config.from_json(_config(tmp_path, {"obj": 3, "data": 1}))
        try:
            Mapper(cfg)
            raise AssertionError("expected ValueError for 4 % 3 != 0")
        except ValueError as e:
            assert "mesh" in str(e) or "divide" in str(e)
    finally:
        sys.path.remove(REPO)
