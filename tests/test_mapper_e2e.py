"""End-to-end: Mapper on the analytic synthetic scene.

The closest the reference comes to tests is watching meshes converge by eye
(SURVEY.md §4); here a ray-traced scene with exact depth gives quantitative
convergence checks: training loss drops, and each object's occupancy field
separates inside from outside its surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmap_tpu.config import Config
from vmap_tpu.core.mapper import FrameSample, Mapper
from vmap_tpu.data.synthetic import SyntheticScene
from vmap_tpu.ops.embedding import embed
from vmap_tpu.ops.mlp import mlp_apply
from vmap_tpu.ops.render import occupancy_activation

pytestmark = pytest.mark.slow


def _cfg(**kw):
    base = dict(
        max_n_models=4, do_bg=True, hidden_feature_size=16,
        hidden_feature_size_bg=16, n_iter_per_frame=4,
        win_size=2, n_per_optim=48, n_samples_per_frame=24,
        win_size_bg=2, n_per_optim_bg=96, n_samples_per_frame_bg=48,
        keyframe_buffer_size=6, keyframe_step=3, keyframe_step_bg=3,
        width=80, height=60, W=80, H=60, fx=60.0, fy=60.0,
        cx=39.5, cy=29.5, frame_pool_size=16, max_depth=8.0,
        obj_scale=2.0, bg_scale=5.0, seed=0,
    )
    base.update(kw)
    return Config(**base)


def _sample(scene, fid, n=16):
    s = scene.frame_sample(fid, n_frames=n)
    return FrameSample(image=s["image"], depth=s["depth"], inst=s["obj"],
                       bbox_dict=s["bbox_dict"], t_wc=s["T"], frame_id=fid)


@pytest.fixture(scope="module")
def trained():
    scene = SyntheticScene(width=80, height=60)
    cfg = _cfg()
    m = Mapper(cfg)
    losses = []
    # two passes over the same 8 orbit views: the second pass revisits known
    # viewpoints, so its losses must be much lower than the first sighting
    for fid in list(range(8)) + list(range(8)):
        metrics = m.process_frame(_sample(scene, fid, n=8))
        losses.append(float(metrics["loss"]))
    return scene, m, losses


def test_objects_registered(trained):
    scene, m, _ = trained
    assert m.n_objects == 2  # sphere + box
    assert 0 in m.registry and m.registry[0].is_bg
    assert {scene.SPHERE_ID, scene.BOX_ID} <= set(m.registry)


def test_loss_decreases(trained):
    _, _, losses = trained
    assert np.isfinite(losses).all()
    first_pass = np.median(losses[:4])
    second_pass = np.median(losses[-4:])
    assert second_pass < first_pass * 0.8, losses


def test_pool_dedup(trained):
    _, m, _ = trained
    # 8 distinct frames ingested (twice), referenced by up to 3 objects each
    # — but stored at most once per distinct frame id
    assert m.pool.n_used <= 8
    assert m.pool.n_used >= 3


def _field_occ(m, obj_id, pts):
    pe, mlp_p, scale = m.object_params(obj_id)
    emb = embed(pe, jnp.asarray(pts, jnp.float32), scale)
    alpha, _ = mlp_apply(mlp_p, emb)
    return np.asarray(occupancy_activation(alpha[..., 0]))


def test_sphere_field_learns_geometry(trained):
    scene, m, _ = trained
    c, r = scene.sphere_center, scene.sphere_radius
    inside = c + np.array([[0.0, 0.0, 0.0], [0.3 * r, 0, 0], [0, -0.3 * r, 0]])
    # points on the far side of empty space, along the camera orbit plane
    outside = c + np.array([[3 * r, 0, 0], [0, -3 * r, 0], [-3 * r, 0, 0]])
    occ_in = _field_occ(m, scene.SPHERE_ID, inside)
    occ_out = _field_occ(m, scene.BOX_ID, outside)  # different field, sanity
    occ_out_same = _field_occ(m, scene.SPHERE_ID, outside)
    assert occ_in.mean() > occ_out_same.mean(), (occ_in, occ_out_same)


def test_bg_trains(trained):
    _, m, _ = trained
    # background bank slot 0 active and stepped
    assert bool(m.bank_bg.active[0])
    assert int(m.bank_bg.step[0]) > 0


def test_step_counts_accumulate(trained):
    _, m, _ = trained
    # 16 frames x 4 iters = 64 optimisation steps on active slots
    steps = np.asarray(m.bank_obj.step)
    active = np.asarray(m.bank_obj.active)
    assert steps[active].max() == 64
    assert steps[~active].max() == 0 if (~active).any() else True


def test_imap_mode_single_field():
    """iMAP mode: one scene-wide field, no background bank
    (configs/Replica/config_replica_room0_iMAP.json: do_bg=0, n_models=1)."""
    scene = SyntheticScene(width=80, height=60)
    cfg = _cfg(do_bg=False, imap_mode=True, max_n_models=1,
               hidden_feature_size=32, obj_scale=5.0)
    m = Mapper(cfg)
    losses = []
    for fid in list(range(6)) * 2:
        s = scene.frame_sample(fid, n_frames=16)
        # imap: whole frame is one "object" with id 0
        inst = np.zeros_like(s["obj"])
        fs = FrameSample(image=s["image"], depth=s["depth"], inst=inst,
                         bbox_dict={0: np.array([0, 80, 0, 60], np.float32)},
                         t_wc=s["T"], frame_id=fid)
        losses.append(float(m.process_frame(fs)["loss"]))
    assert m.bank_bg is None
    assert m.n_objects == 1
    # the scene field must learn occupancy: surface point dense, empty space
    # in front of the camera free
    surf = scene.sphere_center + np.array([[0.0, 0.0, 0.0]])
    empty = np.array([[0.0, -0.8, -1.5], [1.5, -0.5, 1.5]])
    occ_surf = _field_occ(m, 0, surf)
    occ_empty = _field_occ(m, 0, empty)
    assert occ_surf.mean() > occ_empty.mean(), (occ_surf, occ_empty, losses)
