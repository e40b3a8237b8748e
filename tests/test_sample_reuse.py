"""Iteration-reuse sampling (tpu.sample_reuse): semantics + e2e.

sample_reuse=R draws the object pixel batch for n_iter/R iteration-blocks
and cycles them across the frame (core/step.py StepStatics.sample_reuse):
the pixel-derived channels must repeat exactly with period n_rays/R while
the per-iteration z samples stay fresh, and R=1 must be bit-identical to
the pre-knob sampler (same key stream).
"""

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


def _stat(**kw):
    return StepStatics(n_iter=4, win=2, n_px=8, n_b2s=1, n_bins=4,
                       fx=40.0, fy=40.0, cx=31.5, cy=23.5, **kw)


def _sample(st, reuse, key=0):
    packed, twc = _pool()
    tabs = _tables()
    obj_ids = jnp.arange(3, dtype=jnp.int32)
    n_frames = st.n_iter * st.win
    return jax.jit(lambda k: _sample_bank(
        k, packed, twc, *tabs, obj_ids, n_frames, st.n_px, st.n_b2s, st,
        reuse=reuse))(jax.random.PRNGKey(key))


def test_reuse_cycles_pixels_fresh_z():
    st = _stat()
    for R in (2, 4):
        b = _sample(st, R)
        NR = st.n_iter * st.win * st.n_px
        blk = NR // R
        assert b["depth"].shape == (3, NR)
        # pixel-derived channels repeat exactly, block against block
        for k in ("depth", "state", "rgb_sm", "origins_sm", "dirs_sm"):
            a = np.asarray(b[k])
            for c in range(1, R):
                np.testing.assert_array_equal(
                    a[..., :blk], a[..., c * blk:(c + 1) * blk], err_msg=k)
        # z is drawn fresh per iteration: the repeated blocks differ
        z = np.asarray(b["z_sm"])
        assert not np.array_equal(z[..., :blk], z[..., blk:2 * blk])
        assert np.isfinite(z).all()


def test_reuse_one_is_bit_identical():
    st = _stat()
    a = _sample(st, 1)
    b = _sample(st, 1)  # same key
    # and against the default-argument path (reuse left at 1)
    packed, twc = _pool()
    tabs = _tables()
    obj_ids = jnp.arange(3, dtype=jnp.int32)
    c = jax.jit(lambda k: _sample_bank(
        k, packed, twc, *tabs, obj_ids, st.n_iter * st.win, st.n_px,
        st.n_b2s, st))(jax.random.PRNGKey(0))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(c[k]))


def test_reuse_composes_with_px_block():
    st = _stat(px_block=8)
    b = _sample(st, 2)
    NR = st.n_iter * st.win * st.n_px
    blk = NR // 2
    d = np.asarray(b["depth"])
    np.testing.assert_array_equal(d[..., :blk], d[..., blk:])
    # gathered values still come from real pool pixels
    packed, _ = _pool()
    pool_depths = set(np.unique(
        (np.asarray(packed)[..., 1] & 0xFFFF).astype(np.int64)))
    got = np.unique(np.round(d * 1000).astype(np.int64))
    assert set(got) <= pool_depths


def _sample_untiled(st, reuse, key=0):
    packed, twc = _pool()
    tabs = _tables()
    obj_ids = jnp.arange(3, dtype=jnp.int32)
    n_frames = st.n_iter * st.win
    return jax.jit(lambda k: _sample_bank(
        k, packed, twc, *tabs, obj_ids, n_frames, st.n_px, st.n_b2s, st,
        reuse=reuse, tile_pixels=False))(jax.random.PRNGKey(key))


def test_untiled_batch_matches_tiled():
    """tile_pixels=False returns the UNTILED pixel arrays + full fresh z —
    bit-identical to the tiled batch's first block / full z (the fused
    path's round-5 zero-tile contract; see _prepare_batch reuse)."""
    st = _stat()
    for R in (2, 4):
        t = _sample(st, R)
        u = _sample_untiled(st, R)
        NR = st.n_iter * st.win * st.n_px
        blk = NR // R
        for k in ("depth", "state", "rgb_sm", "origins_sm", "dirs_sm",
                  "valid"):
            np.testing.assert_array_equal(
                np.asarray(t[k])[..., :blk], np.asarray(u[k]), err_msg=k)
        np.testing.assert_array_equal(np.asarray(t["z_sm"]),
                                      np.asarray(u["z_sm"]))


def test_prepare_batch_reuse_operands_bit_identical():
    """_prepare_batch(reuse=R) on the untiled batch must emit bit-identical
    kernel operands to _prepare_batch(reuse=1) on the tiled batch — the
    exactness contract that lets the fused path skip the sampler tile."""
    from vmap_tpu.core.bank import init_bank
    from vmap_tpu.kernels.train_step import _prepare_batch, prepare_bank

    st = _stat()
    cap, G = 3, 1
    # pad cap to a multiple of G (already is); bank supplies scale/active
    bank = init_bank(jax.random.PRNGKey(1), 4, 16, 2.0)
    bank = bank.replace(active=jnp.arange(4) < 3)
    pb = prepare_bank(bank, 4)
    n_per = st.win * st.n_px
    for R in (2, 4):
        t = _sample(st, R)
        u = _sample_untiled(st, R)
        # _prepare_batch works on [cap] leading axes; pad cap 3 -> 4
        pad = lambda b: {k: jnp.pad(v, ((0, 1),) + ((0, 0),) * (v.ndim - 1))
                         for k, v in b.items()}   # noqa: E731
        bt = _prepare_batch(pad(t), pb.scale, pb.active, pb.step,
                            st.n_iter, n_per, pb.G)
        bu = _prepare_batch(pad(u), pb.scale, pb.active, pb.step,
                            st.n_iter, n_per, pb.G, reuse=R)
        for k in ("od", "z", "pk", "wmul"):
            np.testing.assert_array_equal(
                np.asarray(bt[k]), np.asarray(bu[k]), err_msg=f"{k} R={R}")


def test_fused_frame_reuse_losses_match_tiled():
    """End-to-end: the fused kernel (interpret mode) on the untiled batch
    with reuse=R reproduces the tiled batch's losses and parameters."""
    from vmap_tpu.core.bank import init_bank
    from vmap_tpu.kernels.train_step import fused_bank_frame

    st = _stat()
    R = 4
    t = _sample(st, R)
    u = _sample_untiled(st, R)
    pad = lambda b: {k: jnp.pad(v, ((0, 1),) + ((0, 0),) * (v.ndim - 1))
                     for k, v in b.items()}   # noqa: E731
    n_per = st.win * st.n_px
    bank = init_bank(jax.random.PRNGKey(1), 4, 16, 2.0)
    bank = bank.replace(active=jnp.arange(4) < 3)
    b1, l1 = fused_bank_frame(bank, pad(t), st.n_iter, n_per, 4,
                              lr=1e-3, wd=0.01, interpret=True)
    b2, l2 = fused_bank_frame(bank, pad(u), st.n_iter, n_per, 4,
                              lr=1e-3, wd=0.01, interpret=True, reuse=R)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(b1.flat), np.asarray(b2.flat))


def test_reuse_e2e_training_converges():
    """Full mapper training with sample_reuse=4 still learns the field."""
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
        frame_pool_size=16, seed=0, sample_reuse=4)
    m = Mapper(cfg)
    assert m.statics.sample_reuse == 4
    losses = []
    for fid in list(range(8)) * 3:
        s = scene.frame_sample(fid, n_frames=8)
        out = m.process_frame(FrameSample(s["image"], s["depth"], s["obj"],
                                          s["bbox_dict"], s["T"], fid))
        losses.append(float(out["loss"]))
    assert np.isfinite(losses).all()

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


def test_reuse_fallback_on_incompatible_iters():
    from vmap_tpu.config import Config
    from vmap_tpu.core.mapper import Mapper
    cfg = Config(
        max_n_models=2, do_bg=False, hidden_feature_size=8,
        n_iter_per_frame=3, win_size=1, n_samples_per_frame=8,
        keyframe_buffer_size=3, W=64, H=48,
        fx=40.0, fy=40.0, cx=31.5, cy=23.5,
        frame_pool_size=4, seed=0, sample_reuse=4)  # 3 % 4 != 0
    m = Mapper(cfg)
    assert m.statics.sample_reuse == 1


def test_reuse_config_plumbing():
    from vmap_tpu.config import Config
    c = Config.from_dict({"tpu": {"sample_reuse": 5}})
    assert c.sample_reuse == 5
    assert Config.from_dict({}).sample_reuse == 1
