"""train.py CLI surface: argument parity and a short synthetic run."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_config(tmp_path):
    cfg = {
        "dataset": {"live": 0, "path": "", "format": "Synthetic"},
        "optimizer": {"args": {"lr": 0.001, "weight_decay": 0.013}},
        "trainer": {"imap_mode": 0, "do_bg": 1, "n_models": 4,
                    "training_strategy": "vmap", "scale": 1000.0},
        "render": {"depth_range": [0.0, 8.0], "n_bins": 5,
                   "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 2,
                   "iters_per_frame": 2, "n_per_optim": 32,
                   "n_per_optim_bg": 32},
        "model": {"n_unidir_funcs": 5, "obj_scale": 2.0, "bg_scale": 5.0,
                  "surface_eps": 0.1, "other_eps": 0.05,
                  "keyframe_buffer_size": 5, "keyframe_step": 3,
                  "keyframe_step_bg": 3, "window_size": 2,
                  "window_size_bg": 2, "hidden_feature_size": 8,
                  "hidden_feature_size_bg": 8},
        "camera": {"w": 64, "h": 48, "fx": 50.0, "fy": 50.0,
                   "cx": 31.5, "cy": 23.5, "mw": 0, "mh": 0},
        "vis": {"n_vis_iter": 11, "grid_dim": 24, "live_voxel_size": 0.05},
        "tpu": {"frame_pool_size": 16, "compute_dtype": "float32", "seed": 0},
    }
    p = tmp_path / "tiny.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_cli_end_to_end(tmp_path):
    config = _tiny_config(tmp_path)
    logdir = str(tmp_path / "logs")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the TPU tunnel out of CPU tests
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", config, "--logdir", logdir,
         "--max_frames", "12", "--save_ckpt"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    # config copied to logdir (train.py parity with reference train.py:35)
    assert os.path.exists(os.path.join(logdir, "tiny.json"))
    # jsonl training log with finite losses
    log = [json.loads(line) for line in
           open(os.path.join(logdir, "train_log.jsonl"))]
    assert len(log) == 12
    assert all(np.isfinite(e["loss"]) for e in log)
    assert log[-1]["n_objects"] >= 1
    # meshes exported at the vis cadence (frame 11 >= 10 and last frame)
    mesh_dir = os.path.join(logdir, "scene_mesh")
    assert os.path.isdir(mesh_dir)
    assert any(f.endswith(".obj") for f in os.listdir(mesh_dir))
    # checkpoints written
    ckpt_dir = os.path.join(logdir, "ckpt")
    assert os.path.isdir(os.path.join(ckpt_dir, "state"))
    assert os.path.exists(os.path.join(ckpt_dir, "state", "latest.json"))


def test_cli_parse_defaults():
    sys.path.insert(0, REPO)
    try:
        from train import parse_args
        args = parse_args([])
        assert args.save_ckpt is False   # store_true (reference footgun fixed)
        args = parse_args(["--save_ckpt"])
        assert args.save_ckpt is True
    finally:
        sys.path.remove(REPO)
