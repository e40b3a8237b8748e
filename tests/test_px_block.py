"""Block-contiguous pixel sampling (tpu.px_block): exactness + e2e."""

import jax
import jax.numpy as jnp
import numpy as np

from vmap_tpu.core.step import StepStatics, _sample_bank


def _pool(P=4, W=64, H=48, cap=3, seed=0):
    rng = np.random.default_rng(seed)
    depth_mm = rng.integers(500, 7500, (P, W, H)).astype(np.uint32)
    inst_b = (rng.integers(-1, cap, (P, W, H)) + 1).astype(np.uint32)
    rgbw = rng.integers(0, 2 ** 24, (P, W, H)).astype(np.uint32)
    packed = np.stack([rgbw, depth_mm | (inst_b << 16)], -1)
    twc = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    return jnp.asarray(packed), jnp.asarray(twc)


def _tables(cap=3, KF=4, P=4, W=64, H=48, seed=0):
    rng = np.random.default_rng(seed)
    kf_pool = jnp.asarray(rng.integers(0, P, (cap, KF)), jnp.int32)
    bbox = jnp.asarray(
        np.stack([np.array([3, W - 5, 7, H - 3], np.float32)] * KF * cap
                 ).reshape(cap, KF, 4))
    n_kf = jnp.full((cap,), KF, jnp.int32)
    latest2 = jnp.tile(jnp.asarray([KF - 2, KF - 1], jnp.int32), (cap, 1))
    return kf_pool, bbox, n_kf, latest2


def _stat(px_block):
    return StepStatics(n_iter=2, win=2, n_px=16, n_b2s=1, n_bins=4,
                       fx=40.0, fy=40.0, cx=31.5, cy=23.5,
                       px_block=px_block)


def test_block_gather_matches_pixel_gather():
    """The block path must return exactly pool[pid, u, v] for the (u, v) it
    reports — same data path as per-pixel, just coarser gather granularity."""
    packed, twc = _pool()
    tabs = _tables()
    st = _stat(px_block=8)
    obj_ids = jnp.arange(3, dtype=jnp.int32)
    batch = jax.jit(lambda k: _sample_bank(
        k, packed, twc, *tabs, obj_ids, 4, st.n_px, st.n_b2s, st))(
        jax.random.PRNGKey(3))
    # reconstruct rgb/depth/state from the depth+rgb via direct math checks:
    # depth values must exist in the pool's depth table (every gathered
    # value comes from a real pixel)
    pool_depths = set(np.unique(
        (np.asarray(packed)[..., 1] & 0xFFFF).astype(np.int64)))
    got = np.unique(np.round(np.asarray(batch["depth"]) * 1000).astype(
        np.int64))
    assert set(got) <= pool_depths


def test_block_and_pixel_same_distribution_shapes():
    packed, twc = _pool()
    tabs = _tables()
    obj_ids = jnp.arange(3, dtype=jnp.int32)
    for L in (1, 8):
        st = _stat(px_block=L)
        b = jax.jit(lambda k, st=st: _sample_bank(
            k, packed, twc, *tabs, obj_ids, 4, st.n_px, st.n_b2s, st))(
            jax.random.PRNGKey(0))
        assert b["rgb"].shape == (3, 64, 3)
        assert b["depth"].shape == (3, 64)
        assert np.isfinite(np.asarray(b["z"])).all()


def test_px_block_e2e_training_converges():
    """Full mapper training with px_block=8 still drives the loss down."""
    from vmap_tpu.config import Config
    from vmap_tpu.core.mapper import FrameSample, Mapper
    from vmap_tpu.data.synthetic import SyntheticScene
    scene = SyntheticScene(width=80, height=64)
    cfg = Config(
        max_n_models=4, do_bg=True, hidden_feature_size=16,
        hidden_feature_size_bg=8, n_iter_per_frame=4,
        win_size=2, n_samples_per_frame=24, win_size_bg=2,
        n_samples_per_frame_bg=16, keyframe_buffer_size=5, keyframe_step=2,
        keyframe_step_bg=2, W=80, H=64, fx=60.0, fy=60.0, cx=39.5, cy=31.5,
        frame_pool_size=16, seed=0, px_block=8)
    m = Mapper(cfg)
    assert m.statics.px_block == 8
    losses = []
    # raw per-frame losses spike at keyframe/new-object events under the
    # 1/(sqrt(var)+1e-4) information weighting regardless of sampling mode,
    # so the e2e signal is the learned FIELD: occupancy just behind the
    # sphere surface must clearly beat free space just in front of it
    # (depth-guided sampling only supervises a band around the surface).
    for fid in list(range(8)) * 3:
        s = scene.frame_sample(fid, n_frames=8)
        out = m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                          s["bbox_dict"], s["T"], fid))
        losses.append(float(out["loss"]))
    assert np.isfinite(losses).all()

    import jax.numpy as jnp
    from vmap_tpu.ops.embedding import embed
    from vmap_tpu.ops.mlp import mlp_apply
    from vmap_tpu.ops.render import occupancy_activation
    pe, mlp_p, sc = m.object_params(scene.SPHERE_ID)
    c, r = scene.sphere_center, scene.sphere_radius
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, 0, -1]],
                    np.float32)
    inside = c + dirs * (r - 0.05)
    outside = c + dirs * (r + 0.25)
    pts = jnp.asarray(np.concatenate([inside, outside]).astype(np.float32))
    alpha, _ = mlp_apply(mlp_p, embed(pe, pts, jnp.float32(sc)))
    occ = np.asarray(occupancy_activation(alpha[..., 0]))
    assert occ[:4].mean() > occ[4:].mean() + 0.2, occ


def test_px_block_fallback_on_incompatible_shapes():
    from vmap_tpu.config import Config
    from vmap_tpu.core.mapper import Mapper
    cfg = Config(
        max_n_models=2, do_bg=False, hidden_feature_size=8,
        n_iter_per_frame=1, win_size=1, n_samples_per_frame=8,
        keyframe_buffer_size=3, W=64, H=50,  # 50 % 8 != 0
        fx=40.0, fy=40.0, cx=31.5, cy=24.5,
        frame_pool_size=4, seed=0, px_block=8)
    m = Mapper(cfg)
    assert m.statics.px_block == 1
