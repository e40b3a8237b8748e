"""Configuration: JSON schema parity with the reference (cfg.py:6-92) plus
validated defaults so partial configs work.

The reference reads a flat attribute bag from nested JSON sections
(dataset/optimizer/trainer/render/model/camera/vis) and derives
``H = h - 2*mh``, ``W = w - 2*mw``, ``n_samples_per_frame =
n_per_optim // window_size``; ScanNet intrinsics come from
``<dataset>/intrinsic/intrinsic_depth.txt`` (cfg.py:41-46). All of that is
reproduced here, with extra TPU-specific knobs under an optional "tpu"
section (frame-pool capacity, compute dtype, sharding mesh shape).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np


def _get(cfg: dict, path: str, default=None, required: bool = False):
    node = cfg
    for part in path.split("."):
        if not isinstance(node, dict) or part not in node:
            if required:
                raise KeyError(f"config key missing: {path}")
            return default
        node = node[part]
    return node


def load_matrix_from_txt(path: str, shape=(4, 4)) -> np.ndarray:
    """Whitespace-separated matrix file (reference utils.py:210-215)."""
    with open(path) as f:
        txt = f.read().replace("\n", " ")
    return np.array([float(v) for v in txt.split()]).reshape(shape)


@dataclass
class Config:
    """Flat config attribute bag (parity: /root/reference/cfg.py)."""

    # trainer
    do_bg: bool = True
    max_n_models: int = 100
    imap_mode: bool = False
    training_strategy: str = "vmap"  # "vmap" | "forloop"
    live_mode: bool = False
    keep_live_time: float = 20.0
    obj_id: int = -1

    # dataset
    dataset_format: str = "Replica"
    dataset_dir: str = ""
    depth_scale: float = 1e-3

    # camera
    max_depth: float = 8.0
    min_depth: float = 0.0
    mh: int = 0
    mw: int = 0
    height: int = 680
    width: int = 1200
    H: int = 680
    W: int = 1200
    fx: float = 600.0
    fy: float = 600.0
    cx: float = 599.5
    cy: float = 339.5
    distortion_array: np.ndarray | None = None

    # training
    win_size: int = 5
    n_iter_per_frame: int = 20
    n_per_optim: int = 120
    n_samples_per_frame: int = 24
    win_size_bg: int = 10
    n_per_optim_bg: int = 1200
    n_samples_per_frame_bg: int = 120
    keyframe_buffer_size: int = 20
    keyframe_step: int = 25
    keyframe_step_bg: int = 50
    obj_scale: float = 2.0
    bg_scale: float = 5.0
    hidden_feature_size: int = 32
    hidden_feature_size_bg: int = 128
    n_bins_cam2surface: int = 1
    n_bins_cam2surface_bg: int = 5
    n_bins: int = 9
    n_unidir_funcs: int = 5
    surface_eps: float = 0.1
    stop_eps: float = 0.05
    color_scaling: float = 5.0
    opacity_scaling: float = 10.0

    # optimiser
    learning_rate: float = 1e-3
    weight_decay: float = 0.013

    # vis
    n_vis_iter: int = 500
    live_voxel_size: float = 0.005
    grid_dim: int = 256
    # write a self-contained WebGL snapshot viewer next to exported meshes
    # (utils/viewer.py — the headless counterpart of the reference's live
    # Open3D window, train.py:41-47)
    html_viewer: bool = True

    # TPU-specific (new)
    frame_pool_size: int = 64
    compute_dtype: str = "float32"   # or "bfloat16" (all matmuls) /
    # "bwd_bf16" (f32 forward, bf16 backward matmuls in the fused kernel) /
    # "int8" (dynamically quantised s8 MLP matmul operands in the fused
    # kernel, 2x MXU pass rate) / "int8_fwd" (quantised forward only) /
    # "int8_static" / "int8_static_fwd" (int8 with STATIC activation/
    # gradient scales — no in-loop abs-max reduce; scales via
    # VMAP_Q8_SACT/SHEAD/SGRAD env, uncalibrated by default)
    seed: int = 0
    # frames per device dispatch (fused single-host path): K > 1 queues K
    # frames' keyframe-table snapshots and trains them in ONE dispatch
    # (amortises the tunnel's flat per-dispatch latency K-fold; core/mapper
    # flushes early on object activation / pool-slot reuse / bank reads, so
    # the math is identical to K=1 — tests/test_burst.py)
    dispatch_burst: int = 1
    mesh_axes: dict = field(default_factory=dict)  # e.g. {"obj": 4, "data": 2}
    # monolithic fused Pallas train-frame kernel: "auto" enables it on TPU
    # backends (3.4x the XLA scan step on v5e), off elsewhere (the CPU
    # interpret path is for tests only)
    fused_train_step: str | bool = "auto"
    # pixel-gather granularity: 1 = reference-exact independent pixels;
    # L > 1 draws L-pixel v-contiguous runs (Lx fewer TPU gather elements,
    # see core/step.py px_block). Needs H % L == 0 and ray budgets % L == 0
    # or it silently falls back to 1. px_block applies to the OBJECT bank
    # (~91% of the gather elements); px_block_bg to the background bank,
    # whose whole-image row coverage degrades under blocking much earlier
    # (docs/quality_study.json). Default 1 (reference-exact): the room-scale
    # study measured px_block 4 at ~2.5 points of object ratio@5cm
    # (docs/room_study.md, seed-repeated) — opt in explicitly for the ~11%
    # throughput if that tradeoff is acceptable. px_block_bg 4 is
    # quality-neutral at room scale and the shipped Replica configs set it.
    px_block: int = 1
    px_block_bg: int = 1
    # iteration-reuse sampling (object bank): R > 1 draws pixels for
    # n_iter/R iteration-blocks per frame and cycles them epochs-style
    # (fresh per-iteration z), cutting the pool-gather Rx with pixels
    # still individually uniform — see core/step.py sample_reuse. Needs
    # n_iter_per_frame % R == 0 or it falls back to 1 with a warning.
    sample_reuse: int = 1

    raw: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_json(cls, config_file: str) -> "Config":
        with open(config_file) as f:
            raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        c = cls(raw=raw)
        g = lambda p, d: _get(raw, p, d)  # noqa: E731
        c.do_bg = bool(g("trainer.do_bg", c.do_bg))
        c.max_n_models = int(g("trainer.n_models", c.max_n_models))
        c.imap_mode = bool(g("trainer.imap_mode", c.imap_mode))
        c.training_strategy = g("trainer.training_strategy", c.training_strategy)
        c.live_mode = bool(g("dataset.live", c.live_mode))
        c.keep_live_time = g("dataset.keep_alive", c.keep_live_time)

        c.dataset_format = g("dataset.format", c.dataset_format)
        c.dataset_dir = g("dataset.path", c.dataset_dir)
        scale = g("trainer.scale", 1.0 / c.depth_scale)
        c.depth_scale = 1.0 / scale

        depth_range = g("render.depth_range", [c.min_depth, c.max_depth])
        c.min_depth, c.max_depth = float(depth_range[0]), float(depth_range[1])
        c.mh = int(g("camera.mh", c.mh))
        c.mw = int(g("camera.mw", c.mw))
        c.height = int(g("camera.h", c.height))
        c.width = int(g("camera.w", c.width))
        c.H = c.height - 2 * c.mh
        c.W = c.width - 2 * c.mw
        cam = raw.get("camera", {})
        if "fx" in cam:
            c.fx, c.fy = float(cam["fx"]), float(cam["fy"])
            c.cx = float(cam["cx"]) - c.mw
            c.cy = float(cam["cy"]) - c.mh
        elif c.dataset_dir:  # ScanNet-style intrinsics file (cfg.py:41-46)
            intrinsic = load_matrix_from_txt(
                os.path.join(c.dataset_dir, "intrinsic", "intrinsic_depth.txt"))
            c.fx, c.fy = intrinsic[0, 0], intrinsic[1, 1]
            c.cx = intrinsic[0, 2] - c.mw
            c.cy = intrinsic[1, 2] - c.mh
        if "distortion" in cam:
            c.distortion_array = np.array(cam["distortion"])
        elif "k1" in cam:
            c.distortion_array = np.array(
                [cam[k] for k in ("k1", "k2", "p1", "p2", "k3", "k4", "k5", "k6")])

        c.win_size = int(g("model.window_size", c.win_size))
        c.n_iter_per_frame = int(g("render.iters_per_frame", c.n_iter_per_frame))
        c.n_per_optim = int(g("render.n_per_optim", c.n_per_optim))
        c.n_samples_per_frame = c.n_per_optim // c.win_size
        c.win_size_bg = int(g("model.window_size_bg", c.win_size_bg))
        c.n_per_optim_bg = int(g("render.n_per_optim_bg", c.n_per_optim_bg))
        c.n_samples_per_frame_bg = c.n_per_optim_bg // c.win_size_bg
        c.keyframe_buffer_size = int(g("model.keyframe_buffer_size", c.keyframe_buffer_size))
        c.keyframe_step = int(g("model.keyframe_step", c.keyframe_step))
        c.keyframe_step_bg = int(g("model.keyframe_step_bg", c.keyframe_step_bg))
        c.obj_scale = float(g("model.obj_scale", c.obj_scale))
        c.bg_scale = float(g("model.bg_scale", c.bg_scale))
        c.hidden_feature_size = int(g("model.hidden_feature_size", c.hidden_feature_size))
        c.hidden_feature_size_bg = int(g("model.hidden_feature_size_bg", c.hidden_feature_size_bg))
        c.n_bins_cam2surface = int(g("render.n_bins_cam2surface", c.n_bins_cam2surface))
        c.n_bins_cam2surface_bg = int(g("render.n_bins_cam2surface_bg", c.n_bins_cam2surface_bg))
        c.n_bins = int(g("render.n_bins", c.n_bins))
        c.n_unidir_funcs = int(g("model.n_unidir_funcs", c.n_unidir_funcs))
        c.surface_eps = float(g("model.surface_eps", c.surface_eps))
        c.stop_eps = float(g("model.other_eps", c.stop_eps))
        c.color_scaling = float(g("model.color_scaling", c.color_scaling))
        c.opacity_scaling = float(g("model.opacity_scaling", c.opacity_scaling))

        c.learning_rate = float(g("optimizer.args.lr", c.learning_rate))
        c.weight_decay = float(g("optimizer.args.weight_decay", c.weight_decay))

        c.n_vis_iter = int(g("vis.n_vis_iter", c.n_vis_iter))
        c.live_voxel_size = float(g("vis.live_voxel_size", c.live_voxel_size))
        c.grid_dim = int(g("vis.grid_dim", c.grid_dim))
        c.html_viewer = bool(g("vis.html_viewer", c.html_viewer))

        c.frame_pool_size = int(g("tpu.frame_pool_size", c.frame_pool_size))
        c.compute_dtype = g("tpu.compute_dtype", c.compute_dtype)
        if c.compute_dtype == "bfloat16":
            # Quality study (docs/round_notes.md "Quality studies"): bf16
            # measures within noise of f32 (the kernel is VPU-bound, and
            # TPU f32 dots already run at bf16 single-pass rate), is WORSE
            # at small step budgets, and bf16 transcendentals crash the
            # Mosaic lowering (sigmoid: vector.broadcast f32->bf16
            # verification error) — which intermittently faults the worker
            # on long runs. Keep float32 unless you have re-validated.
            import warnings
            warnings.warn(
                "tpu.compute_dtype=bfloat16 is a known-faulting, "
                "no-benefit configuration on TPU (docs/round_notes.md, "
                "round-2 quality studies): bf16 sigmoid crashes the Mosaic "
                "lowering and end-to-end speed is unchanged because the "
                "fused kernel is VPU-bound. Use float32 (default) or "
                "bwd_bf16.", stacklevel=2)
        c.seed = int(g("tpu.seed", c.seed))
        c.dispatch_burst = int(g("tpu.dispatch_burst", c.dispatch_burst))
        c.mesh_axes = g("tpu.mesh_axes", c.mesh_axes)
        c.fused_train_step = g("tpu.fused_train_step", c.fused_train_step)
        c.px_block = int(g("tpu.px_block", c.px_block))
        c.px_block_bg = int(g("tpu.px_block_bg", c.px_block_bg))
        c.sample_reuse = int(g("tpu.sample_reuse", c.sample_reuse))
        return c

    def fused_enabled(self) -> bool:
        """Resolve the fused_train_step setting against the backend."""
        v = self.fused_train_step
        if isinstance(v, str) and v == "auto":
            import jax
            return jax.default_backend() == "tpu"
        return bool(v)
