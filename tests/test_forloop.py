"""The "forloop" training strategy (reference ablation, train.py:278-290)."""

import numpy as np

from vmap_tpu.config import Config
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene
import pytest

pytestmark = pytest.mark.slow


def _cfg(strategy):
    return Config(
        max_n_models=4, do_bg=True, hidden_feature_size=8,
        hidden_feature_size_bg=8, n_iter_per_frame=2,
        win_size=2, n_samples_per_frame=8, win_size_bg=2,
        n_samples_per_frame_bg=8, keyframe_buffer_size=5, keyframe_step=2,
        keyframe_step_bg=2, W=80, H=60, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        frame_pool_size=16, seed=0, training_strategy=strategy)


def test_forloop_strategy_trains():
    scene = SyntheticScene(width=80, height=60)
    m = Mapper(_cfg("forloop"))
    losses = []
    for fid in range(4):
        s = scene.frame_sample(fid, n_frames=8)
        fs = FrameSample(s["image"], s["depth"], s["obj"], s["bbox_dict"],
                         s["T"], fid)
        losses.append(m.process_frame(fs)["loss"])
    assert np.isfinite(losses).all()
    # all active slots and the bg stepped n_iter times per frame
    steps = np.asarray(m.bank_obj.step)
    active = np.asarray(m.bank_obj.active)
    assert (steps[active] > 0).all()
    assert int(m.bank_bg.step[0]) == 4 * 2


def test_forloop_and_vmap_agree_statistically():
    """Both strategies must converge on the same scene (not bitwise — RNG
    streams differ — but to a working map): mean occupancy over GT-surface
    points must beat mean occupancy in empty space for both."""
    import jax.numpy as jnp
    from vmap_tpu.ops.embedding import embed
    from vmap_tpu.ops.mlp import mlp_apply
    from vmap_tpu.ops.render import occupancy_activation

    scene = SyntheticScene(width=80, height=60)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    surf = scene.sphere_center + dirs * scene.sphere_radius * 0.95
    empty = np.array([[0.0, -0.8, -1.5], [1.5, -0.5, 1.5], [0.0, -1.5, 0.0]])

    for strat in ("vmap", "forloop"):
        cfg = _cfg(strat)
        cfg.hidden_feature_size = 16
        cfg.n_iter_per_frame = 4
        m = Mapper(cfg)
        for fid in list(range(8)) * 2:
            s = scene.frame_sample(fid, n_frames=8)
            fs = FrameSample(s["image"], s["depth"], s["obj"], s["bbox_dict"],
                             s["T"], fid)
            m.process_frame(fs)
        pe, mlp_p, scale = m.object_params(scene.SPHERE_ID)
        a_s, _ = mlp_apply(mlp_p, embed(pe, jnp.asarray(surf, jnp.float32), scale))
        a_e, _ = mlp_apply(mlp_p, embed(pe, jnp.asarray(empty, jnp.float32), scale))
        occ_s = np.asarray(occupancy_activation(a_s[..., 0])).mean()
        occ_e = np.asarray(occupancy_activation(a_e[..., 0])).mean()
        assert occ_s > occ_e, (strat, occ_s, occ_e)
